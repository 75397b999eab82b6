"""Three-way CAS equivalence: the oracle-checked batch fold
(kv_cas_replay) == the applyInPandasWithState twin (kv_state.py) == the
transformWithStateInPandas twin (kv_state2.py). Pins the state machine's
semantics independently of the streaming runtime API."""

from __future__ import annotations

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators.kv import kv_cas_replay
from mit_6_5840_mapreduce_with_go_spark.streaming.kv_state2 import (
    kv_cas_stream_tws,
)
from mit_6_5840_mapreduce_with_go_spark.streaming.windows import (
    run_to_memory,
    stream_events,
)


def _protobuf_usable() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_usable(),
    reason="transformWithState's Python protocol needs google.protobuf, "
    "which this container ships broken (empty namespace package); the "
    "test runs for real wherever protobuf is present",
)
def test_transform_with_state_cas_equals_batch_replay(spark, sf_dir):
    # transformWithState requires the RocksDB state store provider
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = stream_events(spark, sf_dir)
        q = run_to_memory(kv_cas_stream_tws(stream), "t_cas_tws", "update")
        try:
            q.processAllAvailable()
            rows = spark.table("t_cas_tws").collect()
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    got = {}
    for r in rows:  # later emissions overwrite earlier
        got[r["key"]] = (r["value"], r["version"], r["n_ok"], r["n_errversion"])
    want = {
        r["key"]: (r["value"], r["version"], r["n_ok"], r["n_errversion"])
        for r in kv_cas_replay(spark, sf_dir).collect()
    }
    assert got == want


class _FakeValueState:
    """Dict-backed stand-in for a per-key transformWithState value
    handle — lets the processor's transition logic run without the
    protobuf wire protocol."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def getValueState(self, name, schema):
        self._state = _FakeValueState()
        return self._state


def test_cas_processor_direct_drive_equals_batch_replay(spark, sf_dir):
    """Protobuf-free complement to the env-gated end-to-end test:
    drives CasProcessor.handleInputRows directly per key with a
    dict-backed state handle, split into 3 chunks per key so state
    carry-over across microbatch calls is exercised, and asserts the
    final emissions equal the oracle-checked batch fold."""
    import pandas as pd

    from mit_6_5840_mapreduce_with_go_spark.streaming.kv_state2 import (
        CasProcessor,
    )
    from mit_6_5840_mapreduce_with_go_spark.sources.tables import load_table

    from pyspark.sql import functions as F

    ops = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("user_id").cast("string").alias("key"),
            F.col("event_id").cast("string").alias("value"),
            (F.col("event_id") % 4).alias("expected"),
            "ts",
            "event_id",
        )
        .toPandas()
    )
    got = {}
    for key, kdf in ops.groupby("key"):
        kdf = kdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        proc = CasProcessor()
        proc.init(_FakeHandle())
        n = len(kdf)
        cuts = sorted({0, max(1, n // 3), max(2, 2 * n // 3), n})
        last = None
        for lo, hi in zip(cuts, cuts[1:]):
            chunk = kdf.iloc[lo:hi]
            if len(chunk) == 0:
                continue
            for out in proc.handleInputRows((key,), iter([chunk]), None):
                last = out.iloc[-1]
        proc.close()
        got[key] = (
            last["value"],
            int(last["version"]),
            int(last["n_ok"]),
            int(last["n_errversion"]),
        )
    want = {
        r["key"]: (r["value"], r["version"], r["n_ok"], r["n_errversion"])
        for r in kv_cas_replay(spark, sf_dir).collect()
    }
    assert got == want
