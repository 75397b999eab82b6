"""Streaming EWMA: the per-key recursive smoothing fold
(operators/timeseries.py events_ewma_value) as a continuously-updating
``applyInPandasWithState`` operator — the monitoring shape where each
key's smoothed value must survive across micro-batches (no window frame
expresses "depends on the previous OUTPUT").

State per key: (ewma, n_events, last_ts_us, last_event_id) — the last-
processed position makes the fold idempotent-ordered across batches:
within a batch rows fold in (ts, event_id) order, and rows at or before
the stored position are skipped (replay-safe).

alpha = 0.5: every multiply is a power-of-two scale, so the fold's only
float rounding is the adds — the streamed result is bit-identical to the
batch higher-order-aggregate fold, which the equivalence test asserts
with zero tolerance.

Scale: state is O(distinct keys) x 4 scalars, partitioned by key;
RocksDB state store for large key spaces. Per micro-batch the work is
one shuffle of the batch (not the history) onto its key partitions.
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
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ewma", T.DoubleType()),
        T.StructField("n", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
    ]
)


def ewma_update(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one key's micro-batch through s = v*0.5 + s*0.5 in event
    order, skipping already-folded positions on replay."""
    if state.exists:
        ewma, n, last_us, last_id = state.get
    else:
        ewma, n, last_us, last_id = None, 0, -1, -1
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for ts_us, eid, v in zip(pdf["ts_us"], pdf["event_id"], pdf["value"]):
            if (ts_us, eid) <= (last_us, last_id):
                continue  # replayed row — already folded
            ewma = v if ewma is None else v * 0.5 + ewma * 0.5
            n += 1
            last_us, last_id = int(ts_us), int(eid)
    state.update((ewma, n, last_us, last_id))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "ewma_value": ewma}]
    )


def ewma_stream(events: DataFrame) -> DataFrame:
    """Wire the events stream into the keyed EWMA operator; input filter
    and ordering key match the batch twin exactly."""
    rows = events.filter(F.col("user_id") < 100).select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        "value",
    )
    return rows.groupBy("user_id").applyInPandasWithState(
        ewma_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
