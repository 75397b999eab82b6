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
``google.protobuf`` package, which this container ships broken (empty
namespace package, and installs are disallowed). The implementation is
complete and the equivalence test (tests/test_streaming2.py) skips
ONLY when ``google.protobuf.descriptor`` is unimportable — on an
environment with protobuf present the three-way equality executes
end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql import types as T

from .kv_state import OUTPUT_SCHEMA, STATE_SCHEMA


class CasProcessor(StatefulProcessor):
    """Per-key CAS transition (expected-version compare-and-set):
    ops apply in (ts, event_id) order; a mismatched expected version
    increments the ErrVersion counter and leaves state unchanged."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("cas", STATE_SCHEMA)

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
