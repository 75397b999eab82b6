"""Central query registry: the contract between operator modules and the
driver entrypoint (``__spark_entry__.py``).

Every operator registers a ``(spark, sf_dir) -> DataFrame`` callable and,
when SQL-expressible, a DuckDB oracle SQL string over the pre-registered
views (region nation customer supplier part orders lineitem events
documents embeddings). Column names/aliases MUST match between the two —
the driver sorts columns by name and hash-compares values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks it non-SQL-expressible
    (the driver then records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module for its registration side effects."""
    from .mapreduce import apps  # noqa: F401
    from .operators import (  # noqa: F401
        clusters,
        dedup,
        kv,
        multimodal,
        pipelines,
        relational,
        relational2,
        relational3,
        relational4,
        sessions,
        similarity,
        text,
        timeseries,
    )
    from .streaming import windows  # noqa: F401
