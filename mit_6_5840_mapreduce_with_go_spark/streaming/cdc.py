"""Streaming CDC upsert: foreachBatch + partition-scoped MERGE — the
production ingestion pattern that turns an event stream into a
continuously-maintained state table.

Each micro-batch is reduced to one latest row per key (map-side, inside
the batch) and merged into the hive-partitioned target via
``sources/merge.py::merge_upsert_partitioned`` — only partitions the
batch touched are read or rewritten. With checkpointing, replays are
absorbed by the MERGE's last-writer-wins semantics (an upsert applied
twice is a no-op), which is the exactly-once story file sinks get from
the commit log and MERGE sinks get from idempotence.

Reference parity: the KV surface's Put-overwrites contract
(src/kvsrv1/server.go semantics) at warehouse scale; the batch twin is
kv_last_writer_wins (operators/kv.py), and the equivalence test drives
the stream in multiple micro-batches before comparing final states.

Scale: per batch, one shuffle (the per-key latest reduction) sized by
the BATCH, not the table; the target-side read is partition-pruned to
touched partitions. State lives in the table, not the stream — restarts
need only the source offset checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..sources.merge import merge_upsert_partitioned

N_BUCKETS = 8  # partition key: pmod(user_id, 8) — co-locates a key forever


def latest_per_key(batch: DataFrame) -> DataFrame:
    """Reduce an events micro-batch to one latest row per user_id."""
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            "ts",
            F.col("value").alias("last_value"),
            # int, matching what hive-partition-directory inference yields
            # on read-back (long vs int would break the merge's unionByName)
            F.pmod("user_id", F.lit(N_BUCKETS)).cast("int").alias("bucket"),
        )
    )


def stream_upsert_state(
    events: DataFrame, target_dir: str, checkpoint_dir: str
):
    """Wire an events stream into the MERGE-maintained state table."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        updates = latest_per_key(batch_df)
        # order by event_id (strictly increasing with event time in this
        # stream): makes last-writer deterministic even when two events
        # share a timestamp
        merge_upsert_partitioned(
            spark,
            target_dir,
            updates,
            key_cols=["user_id"],
            partition_col="bucket",
            order_col="last_event_id",
        )

    return (
        events.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
