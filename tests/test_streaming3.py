"""Streaming EWMA == batch fold equivalence, across multiple ordered
micro-batches and under replayed (duplicate) input rows."""

from __future__ import annotations

import pyspark.sql.functions as F

from mit_6_5840_mapreduce_with_go_spark.operators.timeseries import (
    events_ewma_value,
)
from mit_6_5840_mapreduce_with_go_spark.streaming.ewma import ewma_stream
from mit_6_5840_mapreduce_with_go_spark.streaming.windows import EVENTS_SCHEMA


def _latest_per_key(spark, table):
    # update-mode memory sink appends one row per key per batch; the
    # last emission per key is the current state.
    pdf = spark.table(table).toPandas()
    pdf["_i"] = range(len(pdf))
    last = pdf.sort_values("_i").groupby("user_id").tail(1)
    return {int(r.user_id): (int(r.n_events), r.ewma_value) for r in last.itertuples()}


def test_streaming_ewma_equals_batch_fold(spark, sf_dir, tmp_path):
    src = str(tmp_path / "ewma_src")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").orderBy("ts", "event_id")
    rows = ev.collect()
    half = rows[: len(rows) // 2]
    rest = rows[len(rows) // 2 :]
    # batch 2 replays the tail of batch 1 — the state fold must skip them
    overlap = half[-50:] + rest

    spark.createDataFrame(half, ev.schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    # NOT run_to_memory: its availableNow trigger would terminate after
    # the first batch; this test needs the query alive across appends.
    q = (
        ewma_stream(stream)
        .writeStream.format("memory")
        .queryName("t_ewma")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(overlap, ev.schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        got = _latest_per_key(spark, "t_ewma")
    finally:
        q.stop()

    want_rows = events_ewma_value(spark, sf_dir).collect()
    want = {r["user_id"]: (r["n_events"], r["ewma_value"]) for r in want_rows}
    assert set(got) == set(want)
    # round the streamed raw doubles through Spark (same HALF_UP as the
    # batch query) — pre-round values are bit-identical by construction
    rounded = {
        r["user_id"]: r["v"]
        for r in spark.createDataFrame(
            [(int(k), float(v[1])) for k, v in got.items()], "user_id long, raw double"
        )
        .select("user_id", F.round("raw", 4).alias("v"))
        .collect()
    }
    for uid, (n, _) in got.items():
        assert n == want[uid][0], uid
        assert rounded[uid] == want[uid][1], uid


def test_streaming_ewma_checkpoint_restart(spark, sf_dir, tmp_path):
    """Kill-and-restart with the same checkpoint: the keyed EWMA state
    must survive the restart and the final result must still equal the
    batch fold — the C9 durability story for CUSTOM stateful operators
    (state store checkpoint replaces consensus)."""
    src = str(tmp_path / "ewma_ck_src")
    ckpt = str(tmp_path / "ewma_ckpt")
    out = str(tmp_path / "ewma_ck_out")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").orderBy("ts", "event_id")
    rows = ev.collect()
    half, rest = rows[: len(rows) // 2], rows[len(rows) // 2 :]

    def sink(batch_df, batch_id):
        # idempotent on replay: one dir per batch id, overwritten whole
        batch_df.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")

    def start():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        return (
            ewma_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )

    spark.createDataFrame(half, ev.schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = start()
    q.processAllAvailable()
    q.stop()  # hard stop — state lives only in the checkpoint now

    spark.createDataFrame(rest, ev.schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # final state per key = its emission in the highest batch that saw it
    pdf = (
        spark.read.option("basePath", out)
        .parquet(out + "/batch=*")
        .toPandas()
    )
    last = (
        pdf.sort_values("batch")
        .groupby("user_id")
        .tail(1)
        .set_index("user_id")
    )
    got = {
        int(uid): (int(r["n_events"]), r["ewma_value"])
        for uid, r in last.iterrows()
    }

    want = {
        r["user_id"]: (r["n_events"], r["ewma_value"])
        for r in events_ewma_value(spark, sf_dir).collect()
    }
    # keys emitted in the post-restart batch carry state folded across
    # the restart boundary
    rounded = {
        r["user_id"]: r["v"]
        for r in spark.createDataFrame(
            [(int(k), float(v[1])) for k, v in got.items()], "user_id long, raw double"
        )
        .select("user_id", F.round("raw", 4).alias("v"))
        .collect()
    }
    assert set(got) == set(want)
    for uid, (n, _) in got.items():
        assert n == want[uid][0], uid
        assert rounded[uid] == want[uid][1], uid


def test_cms_counter_stream_equals_batch(spark, sf_dir):
    """The streaming CMS counter grid must equal the batch hourly grid
    (linear sketches build identically in either mode)."""
    from pyspark.sql import functions as F

    from mit_6_5840_mapreduce_with_go_spark.operators.sketches2 import (
        _CMS_D,
        _cms_idx,
    )
    from mit_6_5840_mapreduce_with_go_spark.sources import load_table
    from mit_6_5840_mapreduce_with_go_spark.streaming.sketch_state import (
        cms_counter_stream,
    )
    from mit_6_5840_mapreduce_with_go_spark.streaming.windows import (
        run_to_memory,
        stream_events,
    )

    q = run_to_memory(
        cms_counter_stream(stream_events(spark, sf_dir)), "t_cms_grid", "complete"
    )
    try:
        q.processAllAvailable()
        got = {
            (r["hour"], r["r"], r["idx"]): r["c"]
            for r in spark.table("t_cms_grid").collect()
        }
    finally:
        q.stop()
    ev = load_table(spark, sf_dir, "events")
    rows = [
        ev.select(
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
            F.lit(r).alias("r"),
            F.expr(_cms_idx(r, "user_id")).alias("idx"),
        )
        for r in range(_CMS_D)
    ]
    want = {
        (r["hour"], r["r"], r["idx"]): r["c"]
        for r in __import__("functools").reduce(lambda a, b: a.unionAll(b), rows)
        .groupBy("hour", "r", "idx")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert got == want


def test_hll_register_stream_equals_batch(spark, sf_dir):
    """The streaming HLL register grid must equal the batch hourly grid
    (max-merge sketches build identically in either mode)."""
    from pyspark.sql import functions as F

    from mit_6_5840_mapreduce_with_go_spark.operators.sketches2 import (
        _HLL_M,
        _hll_hash,
        _hll_rho_spark,
    )
    from mit_6_5840_mapreduce_with_go_spark.sources import load_table
    from mit_6_5840_mapreduce_with_go_spark.streaming.sketch_state import (
        hll_register_stream,
    )
    from mit_6_5840_mapreduce_with_go_spark.streaming.windows import (
        run_to_memory,
        stream_events,
    )

    q = run_to_memory(
        hll_register_stream(stream_events(spark, sf_dir)), "t_hll_grid", "complete"
    )
    try:
        q.processAllAvailable()
        got = {
            (r["hour"], r["bucket"]): r["r"]
            for r in spark.table("t_hll_grid").collect()
        }
    finally:
        q.stop()
    hexpr = _hll_hash("user_id")
    want = {
        (r["hour"], r["bucket"]): r["r"]
        for r in load_table(spark, sf_dir, "events")
        .select(
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
            F.expr(f"{hexpr} % {_HLL_M}").alias("bucket"),
            F.expr(_hll_rho_spark(hexpr)).alias("rho"),
        )
        .groupBy("hour", "bucket")
        .agg(F.max("rho").alias("r"))
        .collect()
    }
    assert got == want
