"""Streaming KMV distinct sketch: continuous cardinality monitoring as
an ``applyInPandasWithState`` stateful operator — the streaming twin of
``sketch_kmv_distinct_users`` (operators/relational3.py).

State per event_type: the K smallest FNV-32a hashes seen so far — the
KMV sketch's entire state is K longs, which is exactly why it streams:
merging a micro-batch is "union, sort, truncate to K", the same
mergeable-sketch operation the batch plan's Partial WindowGroupLimit
performs per partition.  Equality with the batch sketch (same estimate,
same h_K) is asserted in tests/test_streaming.py.

Scale notes: state is O(K) per group however many distinct keys arrive —
the property that makes cardinality monitoring viable on an unbounded
stream (exact distinct would grow without bound)."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from ..functions.hashing import fnv32a_col
from ..operators.relational3 import _KMV_K

KMV_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_hashes_kept", T.LongType()),
        T.StructField("kmv_estimate", T.DoubleType()),
    ]
)

# State: the K smallest distinct hashes, ascending.
KMV_STATE_SCHEMA = T.StructType([T.StructField("mins", T.ArrayType(T.LongType()))])


def kmv_update(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Merge one group's micro-batch hashes into the K-min state."""
    mins: list[int] = list(state.get[0]) if state.exists else []
    seen = set(mins)
    for pdf in pdfs:
        for hv in pdf["hv"]:
            hv = int(hv)
            if hv not in seen:
                seen.add(hv)
                mins.append(hv)
    mins = sorted(mins)[:_KMV_K]
    state.update((mins,))
    if len(mins) >= _KMV_K:
        est = round((_KMV_K - 1) * 4294967296.0 / mins[_KMV_K - 1], 4)
    else:
        est = float(len(mins))
    yield pd.DataFrame(
        [{"event_type": key[0], "n_hashes_kept": len(mins), "kmv_estimate": est}]
    )


def kmv_stream(events: DataFrame) -> DataFrame:
    """Wire the events stream into the keyed KMV operator.  The hash is
    computed JVM-side (same fnv32a_col fold as the batch query); only the
    K-min merge crosses into Python."""
    hashed = events.select(
        "event_type",
        fnv32a_col(F.col("user_id").cast("string")).alias("hv"),
    )
    return hashed.groupBy("event_type").applyInPandasWithState(
        kmv_update,
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming Count-Min build: hourly sketch counters as a tumbling-window
# aggregate — the continuous twin of the batch hourly grid in
# operators/sketches2.py::sketch_cms_sliding_counts.  CMS is linear, so
# the stream needs NO custom state: the windowed count IS the sketch,
# and downstream window merges are sums over the emitted grid.
# --------------------------------------------------------------------------


def cms_counter_stream(events: DataFrame) -> DataFrame:
    """Per-hour CMS counters from the event stream: each event
    contributes one increment per sketch row r at column idx_r(user);
    a tumbling 1-hour window + (r, idx) groupBy emits the identical
    counter grid the batch op builds.  State is the in-flight hour's
    d x w counters per window — bounded however many events arrive,
    which is the linear-sketch property doing the work."""
    from ..operators.sketches2 import _CMS_D, _cms_idx

    from functools import reduce

    rows = [
        events.select(
            "ts", F.lit(r).alias("r"), F.expr(_cms_idx(r, "user_id")).alias("idx")
        )
        for r in range(_CMS_D)
    ]
    union = reduce(lambda a, b: a.unionAll(b), rows)
    return (
        union.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "r", "idx")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "r",
            "idx",
            "c",
        )
    )


def hll_register_stream(events: DataFrame) -> DataFrame:
    """Per-hour HLL register grid from the event stream: tumbling
    1-hour window + (bucket) groupBy taking MAX(rho) — the max-merge
    twin of cms_counter_stream; downstream sliding unions merge the
    emitted grids under element-wise max exactly as the batch op does.
    State per in-flight hour is the m-register grid, bounded however
    many events arrive."""
    from ..operators.sketches2 import _HLL_M, _hll_hash, _hll_rho_spark

    hexpr = _hll_hash("user_id")
    hashed = events.select(
        "ts",
        F.expr(f"{hexpr} % {_HLL_M}").alias("bucket"),
        F.expr(_hll_rho_spark(hexpr)).alias("rho"),
    )
    return (
        hashed.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "bucket")
        .agg(F.max("rho").alias("r"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "bucket",
            "r",
        )
    )
