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


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data handling: with watermark 0s, a row older than the
    observed max event time is dropped; windows close once the watermark
    passes their end (append mode emits them exactly once)."""
    import datetime as dt

    src = str(tmp_path / "stream_src")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    def t(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    write(
        [
            (1, t(10, 0), 1, "click", 1.0, "{}"),
            (2, t(10, 30), 1, "click", 1.0, "{}"),
            (3, t(12, 5), 1, "click", 1.0, "{}"),  # advances watermark past 11:00
        ]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    agg = tumbling_counts(stream, window="1 hour", watermark="0 seconds")
    q = agg.writeStream.format("memory").queryName("t_late").outputMode("append").start()
    try:
        q.processAllAvailable()
        write(
            [
                (4, t(10, 15), 1, "click", 5.0, "{}"),  # LATE: behind watermark
                (5, t(12, 10), 1, "click", 1.0, "{}"),  # on time, open window
            ]
        )
        q.processAllAvailable()
        rows = {
            (r["hour"], r["event_type"]): r["n_events"]
            for r in spark.table("t_late").collect()
        }
    finally:
        q.stop()
    # the 10:00 window finalized with only the two on-time rows; the late
    # 10:15 row (event 4) was evicted by the watermark
    assert rows[("2024-01-01 10:00:00", "click")] == 2


def test_sliding_window_smoke(spark, sf_dir):
    from mit_6_5840_mapreduce_with_go_spark.streaming.windows import (
        sliding_user_activity,
    )

    q = run_to_memory(
        sliding_user_activity(stream_events(spark, sf_dir)), "t_sliding", "complete"
    )
    try:
        q.processAllAvailable()
        rows = spark.table("t_sliding").collect()
    finally:
        q.stop()
    assert len(rows) > 0
    for r in rows:
        assert r["approx_users"] >= 1 and r["n_events"] >= 1


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """Stream-stream time-bounded join produces exactly the batch join's
    pairs (single availableNow pass: no row can be dropped by watermarks,
    so equality is exact)."""
    from mit_6_5840_mapreduce_with_go_spark.sources import load_table
    from mit_6_5840_mapreduce_with_go_spark.streaming.windows import (
        stream_stream_error_purchase_join,
    )

    q = run_to_memory(
        stream_stream_error_purchase_join(spark, sf_dir), "t_ssj", "append"
    )
    try:
        q.processAllAvailable()
        got = {(r["error_id"], r["purchase_id"]) for r in spark.table("t_ssj").collect()}
    finally:
        q.stop()
    ev = load_table(spark, sf_dir, "events")
    import pyspark.sql.functions as F

    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("user_id").alias("eu"),
        F.col("ts").alias("ets"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    want = {
        (r["error_id"], r["purchase_id"])
        for r in e.join(
            p,
            (F.col("eu") == F.col("pu"))
            & (F.col("pts") >= F.col("ets") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("pts") <= F.col("ets") + F.expr("INTERVAL 30 MINUTES")),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_parquet_sink_exactly_once_on_restart(spark, sf_dir, tmp_path):
    """Checkpointed file sink: restart with the same checkpoint must not
    re-emit already-committed batches (reference crash-test analog: final
    output equals the no-fault run, test-mr.sh:283-330)."""
    from mit_6_5840_mapreduce_with_go_spark.streaming.windows import stream_to_parquet

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    src_count = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    q = stream_to_parquet(stream_events(spark, sf_dir), out, ckpt)
    q.awaitTermination()
    first = spark.read.parquet(out).count()
    assert first == src_count
    # restart with same checkpoint, no new source data -> no duplicates
    q2 = stream_to_parquet(stream_events(spark, sf_dir), out, ckpt)
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == src_count


def test_foreach_batch_receives_batches(spark, sf_dir, tmp_path):
    from mit_6_5840_mapreduce_with_go_spark.streaming.windows import (
        stream_foreach_batch,
    )

    out = str(tmp_path / "fb_out")

    def sink(batch_df, batch_id):
        # idempotent: partition dir keyed by batch_id, overwritten on replay
        batch_df.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")

    q = stream_foreach_batch(
        stream_events(spark, sf_dir), sink, str(tmp_path / "fb_ckpt")
    )
    q.awaitTermination()
    src_count = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert spark.read.parquet(out + "/batch=*").count() == src_count


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


def test_stream_dedup_matches_batch_keys(spark, sf_dir):
    """Streaming dedup (dropDuplicatesWithinWatermark) emits exactly one
    row per (user_id, event_type) key when all data fits one watermark
    window — same key set as batch dropDuplicates."""
    from mit_6_5840_mapreduce_with_go_spark.sources import load_table
    from mit_6_5840_mapreduce_with_go_spark.streaming.windows import (
        stream_dedup_events,
    )

    q = run_to_memory(
        stream_dedup_events(spark, sf_dir, watermark="10 days"),
        "t_dedup",
        "append",
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["event_type"])
            for r in spark.table("t_dedup").collect()
        }
        n_got = spark.table("t_dedup").count()
    finally:
        q.stop()
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r["user_id"], r["event_type"])
        for r in ev.select("user_id", "event_type").distinct().collect()
    }
    assert got == want
    assert n_got == len(want)  # exactly one survivor per key


def test_streaming_sessions_equal_batch(spark, sf_dir):
    """session_window over a stream must produce the exact sessions the
    batch twin computes — same expression, state-store merge instead of
    a sort. Complete mode so every closed-or-open session is visible."""
    from mit_6_5840_mapreduce_with_go_spark.operators.sessions import (
        events_sessionization,
    )
    from mit_6_5840_mapreduce_with_go_spark.streaming.windows import (
        streaming_session_counts,
    )

    q = run_to_memory(
        streaming_session_counts(stream_events(spark, sf_dir)),
        "t_sessions",
        "complete",
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start"]): (
                r["n_events"],
                r["duration_sec"],
                r["session_value"],
            )
            for r in spark.table("t_sessions").collect()
        }
    finally:
        q.stop()
    want = {
        (r["user_id"], r["session_start"]): (
            r["n_events"],
            r["duration_sec"],
            r["session_value"],
        )
        for r in events_sessionization(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_static_contamination_equals_batch(spark, sf_dir):
    """Stream-static join twin of pipeline_contamination_check: the set
    of (doc, shared-ngram) matches from the streaming ingest gate must
    equal the batch scan's per-doc distinct counts exactly."""
    from mit_6_5840_mapreduce_with_go_spark.operators.curation import (
        _CONTAM_N,
        _word_ngrams,
        pipeline_contamination_check,
    )
    from mit_6_5840_mapreduce_with_go_spark.sources import load_table
    from mit_6_5840_mapreduce_with_go_spark.streaming.windows import (
        run_to_memory,
        stream_documents,
        stream_static_contamination,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bench = (
        docs.filter(F.col("doc_id") % 101 == 0)
        .select(F.explode(_word_ngrams(toks, _CONTAM_N)).alias("ng"))
        .distinct()
    )
    stream = stream_static_contamination(
        stream_documents(spark, sf_dir).filter(F.col("doc_id") % 101 != 0), bench
    )
    q = run_to_memory(stream, "t_contam", "append")
    try:
        q.processAllAvailable()
        pairs = {(r["doc_id"], r["ng"]) for r in spark.table("t_contam").collect()}
    finally:
        q.stop()
    got = {}
    for did, _ng in pairs:
        got[did] = got.get(did, 0) + 1
    want = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in pipeline_contamination_check(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_kmv_equals_batch_sketch(spark, sf_dir):
    """The streaming KMV state (K smallest hashes) must land on exactly
    the batch sketch's estimate once the stream drains — the mergeable-
    sketch property (union, sort, truncate) is order-insensitive."""
    from mit_6_5840_mapreduce_with_go_spark.operators.relational3 import (
        sketch_kmv_distinct_users,
    )
    from mit_6_5840_mapreduce_with_go_spark.streaming.sketch_state import kmv_stream
    from mit_6_5840_mapreduce_with_go_spark.streaming.windows import (
        run_to_memory,
        stream_events,
    )

    q = run_to_memory(kmv_stream(stream_events(spark, sf_dir)), "t_kmv", "update")
    try:
        q.processAllAvailable()
        # update mode re-emits per micro-batch; the LAST row per group is
        # the final state (single-source stream drains in order)
        import pandas as pd

        pdf = spark.table("t_kmv").toPandas()
        got = {
            r["event_type"]: (r["n_hashes_kept"], r["kmv_estimate"])
            for _, r in pdf.iterrows()
        }
    finally:
        q.stop()
    want = {
        r["event_type"]: (min(r["n_distinct_hashes"], 32), r["kmv_estimate"])
        for r in sketch_kmv_distinct_users(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for et, (n, est) in want.items():
        gn, gest = got[et]
        assert gn == n and abs(gest - est) < 1e-6, (et, got[et], (n, est))
