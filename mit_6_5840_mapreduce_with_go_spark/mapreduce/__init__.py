from .engine import (
    fnv32a,
    run_mapreduce,
    run_mapreduce_sequential,
    run_mapreduce_to_dir,
)

__all__ = [
    "fnv32a",
    "run_mapreduce",
    "run_mapreduce_sequential",
    "run_mapreduce_to_dir",
]
