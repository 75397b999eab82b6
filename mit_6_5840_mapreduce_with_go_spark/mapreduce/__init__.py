from .engine import fnv32a, run_mapreduce, run_mapreduce_sequential

__all__ = ["fnv32a", "run_mapreduce", "run_mapreduce_sequential"]
