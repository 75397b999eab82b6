"""Streaming versioned-KV on the transformWithState API: the SAME CAS
state machine as kv_state.py (models1/kv.go:49-67 semantics), expressed
as a ``StatefulProcessor`` for ``transformWithStateInPandas`` — Spark's
arbitrary-stateful-processing API that supersedes
``applyInPandasWithState`` (typed state handles, timers, TTL, schema
evolution; requires the RocksDB state store).

Having BOTH implementations is deliberate: the batch fold
(operators/kv.py kv_cas_replay, oracle-checked) is the semantic anchor,
and tests/test_streaming2.py asserts a three-way equality — batch fold
== applyInPandasWithState twin == transformWithState twin — so the state
machine's meaning is pinned independently of which streaming runtime API
carries it.

Scale notes: state is one (value, version, counters) tuple per key,
hash-partitioned by key; RocksDB + changelog checkpointing carries
billions of keys. The per-batch fold is O(ops in batch) with no
cross-key traffic.

Environment note: transformWithState's Python protocol requires the
``google.protobuf`` package, which this container does not ship (and
installs are disallowed).  Since round 10, tests/conftest.py bridges
to the pure-Python protobuf 6.32.0 runtime already present inside the
system Google Cloud SDK (tests/_protobuf_vendor/README.md), so the
three-way equality test EXECUTES end to end here — no skip remains.
On a machine with a real protobuf install the bridge is inert.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql import types as T

from .kv_state import OUTPUT_SCHEMA

# transformWithState value-state schema: exactly the tuple the
# processor stores.  (kv_state.py's applyInPandasWithState twin keeps
# two extra bookkeeping fields; borrowing its 6-field schema here made
# the state server reject every update with STRUCT_ARRAY_LENGTH_MISMATCH
# — a latent bug for as long as the protobuf env-skip kept this
# processor from ever executing, caught in round 10 the moment the
# bridged protobuf runtime let the protocol run for real.)
TWS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("value", T.StringType()),
        T.StructField("version", T.LongType()),
        T.StructField("n_ok", T.LongType()),
        T.StructField("n_errversion", T.LongType()),
    ]
)


class CasProcessor(StatefulProcessor):
    """Per-key CAS transition (expected-version compare-and-set):
    ops apply in (ts, event_id) order; a mismatched expected version
    increments the ErrVersion counter and leaves state unchanged."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("cas", TWS_STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            value, version, n_ok, n_err = self._state.get()
        else:
            value, version, n_ok, n_err = None, 0, 0, 0
        for pdf in rows:
            pdf = pdf.sort_values(["ts", "event_id"])
            for expected, v in zip(pdf["expected"], pdf["value"]):
                if expected == version:
                    value, version, n_ok = v, version + 1, n_ok + 1
                else:
                    n_err += 1
        self._state.update((value, int(version), int(n_ok), int(n_err)))
        yield pd.DataFrame(
            [
                {
                    "key": key[0],
                    "value": value,
                    "version": int(version),
                    "n_ok": int(n_ok),
                    "n_errversion": int(n_err),
                }
            ]
        )

    def close(self) -> None:
        pass


def kv_cas_stream_tws(events: DataFrame) -> DataFrame:
    """Wire the events stream into the transformWithState CAS operator.
    Ops derivation matches operators/kv.py _ops and kv_state.py exactly."""
    ops = events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").cast("string").alias("value"),
        (F.col("event_id") % 4).alias("expected"),
        "ts",
        "event_id",
    )
    return ops.groupBy("key").transformWithStateInPandas(
        CasProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
