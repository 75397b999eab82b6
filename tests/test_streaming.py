"""Structured Streaming: windowed aggregation equivalence with the batch
twin, and the stateful CAS operator equivalence with batch replay
(streaming state machine == models1/kv.go-style transition)."""

from __future__ import annotations

import math

from mit_6_5840_mapreduce_with_go_spark.operators.kv import kv_cas_replay
from mit_6_5840_mapreduce_with_go_spark.operators.relational import (
    events_hourly_type_counts,
)
from mit_6_5840_mapreduce_with_go_spark.streaming.kv_state import kv_cas_stream
from mit_6_5840_mapreduce_with_go_spark.streaming.windows import (
    run_to_memory,
    stream_events,
    tumbling_counts,
)


def test_tumbling_counts_equal_batch(spark, sf_dir):
    q = run_to_memory(
        tumbling_counts(stream_events(spark, sf_dir)), "t_tumbling", "complete"
    )
    try:
        q.processAllAvailable()
        got = {
            (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.table("t_tumbling").collect()
        }
    finally:
        q.stop()
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in events_hourly_type_counts(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k, (n, s) in want.items():
        gn, gs = got[k]
        assert gn == n and math.isclose(gs, s, rel_tol=1e-9)


def test_kv_cas_stream_equals_batch_replay(spark, sf_dir):
    stream = stream_events(spark, sf_dir)
    q = run_to_memory(kv_cas_stream(stream), "t_cas", "update")
    try:
        q.processAllAvailable()
        # update-mode memory sink may hold multiple rows per key across
        # batches; availableNow with one file = single batch, but take the
        # last emission per key to be robust
        rows = spark.table("t_cas").collect()
    finally:
        q.stop()
    got = {}
    for r in rows:  # later emissions overwrite earlier
        got[r["key"]] = (r["value"], r["version"], r["n_ok"], r["n_errversion"])
    want = {
        r["key"]: (r["value"], r["version"], r["n_ok"], r["n_errversion"])
        for r in kv_cas_replay(spark, sf_dir).collect()
    }
    assert got == want
