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
