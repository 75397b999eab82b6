"""Streaming CDC upsert (streaming/cdc.py): a multi-micro-batch stream
merged into a partitioned state table must land on exactly the batch
last-writer-wins answer, rewrite only touched partitions per batch, and
absorb a checkpointed restart without change."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mit_6_5840_mapreduce_with_go_spark.sources import load_table
from mit_6_5840_mapreduce_with_go_spark.streaming.cdc import (
    N_BUCKETS,
    latest_per_key,
    stream_upsert_state,
)


def test_stream_upsert_equals_batch_last_writer(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    target = str(tmp_path / "state")
    # seed: state from the first half of the stream (batch bootstrap)
    cutoff = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    seed = latest_per_key(ev.filter(F.col("event_id") <= cutoff))
    seed.write.partitionBy("bucket").parquet(target)

    # stream the second half in multiple micro-batches
    src = str(tmp_path / "src")
    tail = ev.filter(F.col("event_id") > cutoff)
    tail.withColumn("chunk", F.pmod(F.col("event_id"), F.lit(3))).repartition(
        "chunk"
    ).write.partitionBy("chunk").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/chunk=*")
    )
    q = stream_upsert_state(stream, target, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = {
        r["user_id"]: (r["last_event_id"], r["last_value"])
        for r in spark.read.parquet(target).collect()
    }
    want = {
        r["user_id"]: (r["last_event_id"], r["last_value"])
        for r in latest_per_key(ev).collect()
    }
    assert got == want
    # partition layout intact: every bucket dir present, no stragglers
    buckets = {
        d for d in os.listdir(target) if d.startswith("bucket=")
    }
    assert buckets == {f"bucket={b}" for b in range(N_BUCKETS)}

    # restart with the same checkpoint and no new data: state unchanged
    stream2 = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/chunk=*")
    )
    q2 = stream_upsert_state(stream2, target, str(tmp_path / "ckpt"))
    q2.awaitTermination()
    got2 = {
        r["user_id"]: (r["last_event_id"], r["last_value"])
        for r in spark.read.parquet(target).collect()
    }
    assert got2 == want
