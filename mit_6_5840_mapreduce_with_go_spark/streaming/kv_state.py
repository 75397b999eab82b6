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
    ]
)


def cas_update(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one key's micro-batch ops through the CAS transition."""
    if state.exists:
        value, version, n_ok, n_err = state.get
    else:
        value, version, n_ok, n_err = None, 0, 0, 0
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for expected, v in zip(pdf["expected"], pdf["value"]):
            if expected == version:
                value, version, n_ok = v, version + 1, n_ok + 1
            else:
                n_err += 1
    state.update((value, version, n_ok, n_err))
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
        "ts",
        "event_id",
    )
    return ops.groupBy("key").applyInPandasWithState(
        cas_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
