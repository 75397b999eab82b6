from .tables import TABLE_NAMES, load_table, load_tables, register_views
from .textfiles import WholeTextDataSource, read_whole_text_source

__all__ = [
    "TABLE_NAMES",
    "WholeTextDataSource",
    "load_table",
    "load_tables",
    "read_whole_text_source",
    "register_views",
]
