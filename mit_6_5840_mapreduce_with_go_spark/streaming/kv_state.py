"""Streaming versioned-KV: the CAS state machine (models1/kv.go:49-67
semantics) as an ``applyInPandasWithState`` stateful operator — the
Structured Streaming replacement for the reference's declared
Raft-replicated KV server (SURVEY.md §2.C9: consensus machinery is NOT
ported; checkpointed keyed state supplies the durability/exactly-once
contract).

State per key: (value, version). Each micro-batch folds its ops in
(ts, event_id) order through the CAS transition; ErrVersion ops leave
state unchanged. The batch twin (operators/kv.py kv_cas_replay) is the
oracle — tests/test_streaming.py asserts the final streaming state equals
the batch replay.

Fault model (labrpc.go:241-252 analog — drops, duplicates, reorders):
the fold carries a per-key (ts_us, event_id) high-water mark and skips
any op at or below it, so a REPLAYED or RE-DELIVERED op (checkpoint
restore re-feeding a batch, or a client resend of an already-folded op
id) folds exactly once — the streaming side of the at-most-once
algebra (a resent APPLIED put is also intrinsically idempotent: its
expected version is behind the advanced state, so CAS rejects it).
Reorders WITHIN a micro-batch are repaired by the sort; an op arriving
in a later batch than a higher-(ts, event_id) sibling is late data and
is dropped by the same watermark — tests/test_streaming_faults.py pins
all three behaviors against seeded fault schedules.

Scale notes: state is O(distinct keys) and partitioned by key; RocksDB
state store + changelog checkpointing is the production config for
billions of keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("version", T.LongType()),
        T.StructField("n_ok", T.LongType()),
        T.StructField("n_errversion", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("value", T.StringType()),
        T.StructField("version", T.LongType()),
        T.StructField("n_ok", T.LongType()),
        T.StructField("n_errversion", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
    ]
)


def cas_update(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one key's micro-batch ops through the CAS transition,
    skipping already-folded positions on replay/re-delivery (the EWMA
    twin's high-water-mark pattern, streaming/ewma.py)."""
    if state.exists:
        value, version, n_ok, n_err, last_us, last_id = state.get
    else:
        value, version, n_ok, n_err, last_us, last_id = None, 0, 0, 0, -1, -1
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for ts_us, eid, expected, v in zip(
            pdf["ts_us"], pdf["event_id"], pdf["expected"], pdf["value"]
        ):
            if (ts_us, eid) <= (last_us, last_id):
                continue  # replayed / re-delivered op — already folded
            if expected == version:
                value, version, n_ok = v, version + 1, n_ok + 1
            else:
                n_err += 1
            last_us, last_id = int(ts_us), int(eid)
    state.update((value, version, n_ok, n_err, last_us, last_id))
    yield pd.DataFrame(
        [
            {
                "key": key[0],
                "value": value,
                "version": version,
                "n_ok": n_ok,
                "n_errversion": n_err,
            }
        ]
    )


def kv_cas_stream(events: DataFrame) -> DataFrame:
    """Wire the events stream into the keyed CAS operator. Input: raw
    events stream (schema of the events table); ops derivation matches
    operators/kv.py _ops exactly."""
    ops = events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").cast("string").alias("value"),
        (F.col("event_id") % 4).alias("expected"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
    )
    return ops.groupBy("key").applyInPandasWithState(
        cas_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
