"""Streaming heavy hitters with BOUNDED state: the space-saving sketch
(Metwally et al., "Efficient computation of frequent and top-k elements
in data streams") as an ``applyInPandasWithState`` operator — the
continuous twin of the batch key-skew profile (operators/scaleops.py)
for key spaces too large to count exactly.

State per bucket: at most ``capacity`` (key, count, err) counters.
A new key evicts the minimum counter and inherits its count (the
classic overestimate bound: count_true <= count <= count_true + err,
err <= bucket_stream_len / capacity). Keys are hash-partitioned into
buckets so the sketch parallelizes like any keyed state; a final merge
of per-bucket counters yields global candidates (every true heavy
hitter above the error floor is guaranteed present).

Scale: state is O(buckets x capacity) regardless of distinct keys —
the point of the sketch; the batch profile keeps exact counts and is
preferable whenever groupBy(key) fits.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

CAPACITY = 8  # counters per bucket
N_BUCKETS = 4

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.LongType()),
        T.StructField("key", T.LongType()),
        T.StructField("count", T.LongType()),
        T.StructField("err", T.LongType()),
    ]
)

# state: parallel arrays of the bucket's counters
STATE_SCHEMA = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("errs", T.ArrayType(T.LongType())),
    ]
)


def spacesaving_update(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        keys, counts, errs = state.get
        tbl = {k: [c, e] for k, c, e in zip(keys, counts, errs)}
    else:
        tbl = {}
    for pdf in pdfs:
        # deterministic processing order inside the micro-batch
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for k in pdf["item"]:
            k = int(k)
            if k in tbl:
                tbl[k][0] += 1
            elif len(tbl) < CAPACITY:
                tbl[k] = [1, 0]
            else:
                # evict the min counter (ties: smallest key — deterministic)
                mk = min(tbl, key=lambda x: (tbl[x][0], x))
                mc = tbl[mk][0]
                del tbl[mk]
                tbl[k] = [mc + 1, mc]
    ks = sorted(tbl)
    state.update(([int(k) for k in ks],
                  [int(tbl[k][0]) for k in ks],
                  [int(tbl[k][1]) for k in ks]))
    yield pd.DataFrame(
        [
            {"bucket": int(key[0]), "key": int(k), "count": int(c), "err": int(e)}
            for k, (c, e) in sorted(tbl.items())
        ]
    )


def heavy_hitters_stream(events: DataFrame) -> DataFrame:
    """Wire the events stream into bucketed space-saving: items are
    user_ids, buckets are a deterministic hash partition of the key
    space (pmod — engine-portable)."""
    items = events.select(
        F.pmod(F.col("user_id"), F.lit(N_BUCKETS)).alias("bucket"),
        F.col("user_id").alias("item"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
    )
    return items.groupBy("bucket").applyInPandasWithState(
        spacesaving_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def spacesaving_reference(stream: list[tuple[int, int]]) -> dict[int, tuple[int, int]]:
    """Plain-Python replica (bucket, item) -> final counters, for tests."""
    tbls: dict[int, dict[int, list[int]]] = {}
    for b, k in stream:
        tbl = tbls.setdefault(b, {})
        if k in tbl:
            tbl[k][0] += 1
        elif len(tbl) < CAPACITY:
            tbl[k] = [1, 0]
        else:
            mk = min(tbl, key=lambda x: (tbl[x][0], x))
            mc = tbl[mk][0]
            del tbl[mk]
            tbl[k] = [mc + 1, mc]
    return {
        (b * 10**9 + k): (c, e)
        for b, tbl in tbls.items()
        for k, (c, e) in tbl.items()
    }
