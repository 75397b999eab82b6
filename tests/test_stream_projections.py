"""The stream_*_final_state batch projections must agree with their
parents (one-shot batch plans) — closing the loop: driver oracle green
+ these equalities + the stream==batch suites (test_streaming*.py)
certify the streaming state machines end to end."""

from __future__ import annotations

from mit_6_5840_mapreduce_with_go_spark.operators.kv import kv_cas_replay
from mit_6_5840_mapreduce_with_go_spark.operators.relational3 import (
    sketch_kmv_distinct_users,
)
from mit_6_5840_mapreduce_with_go_spark.operators.stream_projections import (
    stream_ewma_final_state,
    stream_kmv_final_state,
    stream_kv_cas_final_state,
)
from mit_6_5840_mapreduce_with_go_spark.operators.timeseries import (
    events_ewma_value,
)

SF = "/root/testdata/sf0.001"


def test_cas_two_segment_fold_equals_one_shot(spark):
    got = {
        r["key"]: (r["value"], r["version"], r["n_ok"], r["n_errversion"])
        for r in stream_kv_cas_final_state(spark, SF).collect()
    }
    want = {
        r["key"]: (r["value"], r["version"], r["n_ok"], r["n_errversion"])
        for r in kv_cas_replay(spark, SF).collect()
    }
    assert got == want


def test_ewma_two_segment_fold_equals_one_shot(spark):
    got = {
        r["user_id"]: (r["n_events"], r["ewma_value"])
        for r in stream_ewma_final_state(spark, SF).collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["ewma_value"])
        for r in events_ewma_value(spark, SF).collect()
    }
    assert got == want  # bit-identical: alpha=0.5 fold splits exactly


def test_kmv_merge_equals_one_shot_sketch(spark):
    got = {
        r["event_type"]: (r["n_hashes_kept"], r["kmv_estimate"])
        for r in stream_kmv_final_state(spark, SF).collect()
    }
    want = {
        r["event_type"]: (min(r["n_distinct_hashes"], 32), r["kmv_estimate"])
        for r in sketch_kmv_distinct_users(spark, SF).collect()
    }
    assert got == want


def test_cdc_two_segment_merge_equals_last_writer(spark):
    """The CDC final-state projection's winner per key must equal the
    last-writer replay (same (ts, event_id) order globally)."""
    from mit_6_5840_mapreduce_with_go_spark.operators.kv import (
        kv_last_writer_wins,
    )
    from mit_6_5840_mapreduce_with_go_spark.operators.stream_projections import (
        stream_cdc_final_state,
    )

    got = {
        r["user_id"]: r["last_event_id"]
        for r in stream_cdc_final_state(spark, SF).collect()
    }
    want = {
        int(r["key"]): int(r["value"])
        for r in kv_last_writer_wins(spark, SF).collect()
    }
    assert got == want
