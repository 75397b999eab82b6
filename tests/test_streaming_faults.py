"""Streaming CAS twin under the labrpc fault model: dropped, duplicated,
and reordered micro-batch events (reference drops ~10% of requests and
reorders replies — /root/reference/src/labrpc/labrpc.go:241-252,298-300).
The final streaming state must match the batch CAS fold over the ops
that were actually delivered on time — the ErrMaybe/at-most-once algebra
at the stream layer.  Template: the EWMA replayed-rows equivalence test
(tests/test_streaming3.py)."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from mit_6_5840_mapreduce_with_go_spark.operators.kv import kv_cas_replay
from mit_6_5840_mapreduce_with_go_spark.streaming.kv_state import kv_cas_stream
from mit_6_5840_mapreduce_with_go_spark.streaming.windows import EVENTS_SCHEMA


def _latest_per_key(spark, table):
    pdf = spark.table(table).toPandas()
    pdf["_i"] = range(len(pdf))
    last = pdf.sort_values("_i").groupby("key").tail(1)
    return {
        r.key: (r.value, int(r.version), int(r.n_ok), int(r.n_errversion))
        for r in last.itertuples()
    }


def _python_cas_fold(rows):
    """Golden replica of the CAS transition over (ts, event_id)-ordered
    ops — mirrors operators/kv.py CAS_ORACLE exactly."""
    state = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["event_id"])):
        key = str(r["user_id"])
        value, version, n_ok, n_err = state.get(key, (None, 0, 0, 0))
        if r["event_id"] % 4 == version:
            state[key] = (str(r["event_id"]), version + 1, n_ok + 1, n_err)
        else:
            state[key] = (value, version, n_ok, n_err + 1)
    return state


def _run_batches(spark, tmp_path, ev_schema, batches, name):
    src = str(tmp_path / f"{name}_src")
    # first batch must exist on disk before the file source is planned
    spark.createDataFrame(batches[0], ev_schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        kv_cas_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        for batch in batches[1:]:
            spark.createDataFrame(batch, ev_schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            q.processAllAvailable()
        return _latest_per_key(spark, name)
    finally:
        q.stop()


def test_cas_stream_replayed_batch_folds_once(spark, sf_dir, tmp_path):
    """Checkpoint-restore replay: batch 2 re-delivers the tail of batch
    1. The high-water mark must skip the replayed prefix, leaving the
    result equal to the clean batch replay (the driver-window oracle)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").orderBy("ts", "event_id")
    rows = ev.collect()
    half, rest = rows[: len(rows) // 2], rows[len(rows) // 2 :]
    got = _run_batches(
        spark, tmp_path, ev.schema, [half, half[-75:] + rest], "t_cas_replay"
    )
    want = {
        r["key"]: (r["value"], r["version"], r["n_ok"], r["n_errversion"])
        for r in kv_cas_replay(spark, sf_dir).collect()
    }
    assert got == want


def test_cas_stream_under_seeded_drop_dup_reorder(spark, sf_dir, tmp_path):
    """labrpc schedule (seed-determined): ~10% of ops dropped, ~10%
    re-delivered in a later micro-batch (client resend of an op id),
    row order shuffled within every micro-batch. Re-delivered ops must
    fold exactly once (watermark + CAS version algebra); within-batch
    reorders are repaired by the sort. Final state == python golden fold
    over the delivered-on-time op sequence."""
    rng = random.Random(6_5840)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").orderBy("ts", "event_id")
    rows = ev.collect()
    delivered = [r for r in rows if rng.random() >= 0.10]  # 10% dropped
    # split the survivors into 3 ordered micro-batches
    b1 = delivered[: len(delivered) // 3]
    b2 = delivered[len(delivered) // 3 : 2 * len(delivered) // 3]
    b3 = delivered[2 * len(delivered) // 3 :]
    # ~10% of batch-1/2 ops get re-delivered in a LATER batch (resend)
    dup_1 = [r for r in b1 if rng.random() < 0.10]
    dup_2 = [r for r in b2 if rng.random() < 0.10]
    batches = [b1, b2 + dup_1, b3 + dup_2]
    # reorder within each micro-batch (repaired by the per-batch sort)
    for b in batches:
        rng.shuffle(b)
    got = _run_batches(spark, tmp_path, ev.schema, batches, "t_cas_faults")
    want = _python_cas_fold([r.asDict() for r in delivered])
    assert got == want


def test_cas_stream_late_cross_batch_op_is_dropped(spark, sf_dir, tmp_path):
    """An op held back to a later micro-batch than a higher-(ts,
    event_id) sibling of the same key is LATE: the watermark drops it
    (never double-folds, never folds out of order). Result == golden
    fold over the on-time ops only."""
    rng = random.Random(1)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").orderBy("ts", "event_id")
    rows = ev.collect()
    half = len(rows) // 2
    held = {id(r) for r in rows[:half] if rng.random() < 0.05}
    b1 = [r for r in rows[:half] if id(r) not in held]
    b2 = rows[half:] + [r for r in rows[:half] if id(r) in held]
    got = _run_batches(spark, tmp_path, ev.schema, [b1, b2], "t_cas_late")
    # a held-back op is late only if its key saw a HIGHER op in batch 1;
    # otherwise the watermark lets it fold (in sorted position of batch 2)
    last_b1 = {}
    for r in b1:
        k = str(r["user_id"])
        cur = (r["ts"], r["event_id"])
        if k not in last_b1 or cur > last_b1[k]:
            last_b1[k] = cur
    on_time = list(b1) + [
        r
        for r in b2
        if str(r["user_id"]) not in last_b1
        or (r["ts"], r["event_id"]) > last_b1[str(r["user_id"])]
    ]
    want = _python_cas_fold([r.asDict() for r in on_time])
    assert got == want
