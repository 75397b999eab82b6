"""Structured Streaming twins of the batch event analytics.

The reference has no streaming surface; its KV ops stream (Get/Put
arriving over RPC — src/kvsrv1/client.go) is the natural streaming
workload (SURVEY.md §2.D). Here: file-source stream over the events
parquet, tumbling-window aggregation with watermarked late-data handling.
Correctness is established in tests/test_streaming.py by equivalence with
the batch query ``events_hourly_type_counts``.

Scale notes: a watermark bounds state (windows older than watermark are
evicted); the shuffle key is (window, event_type) so state partitions
evenly; at 100 TB/day the same plan runs against a Kafka source with no
code change (swap ``readStream.parquet`` for ``readStream.format("kafka")``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) → NTZ on read;
        # normalized to LTZ below (session tz pinned UTC, value-preserving)
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (schema pinned — file
    streams cannot infer; the source needs a directory, so glob-filter
    the single table file). Matches sources/tables.py ts conversion."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window per-type counts + value sums with late-data
    eviction after ``watermark``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_user_activity(
    events: DataFrame, window: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding-window distinct-ish user activity (approx_count_distinct —
    the streaming-safe sketch; exact distinct is unbounded state)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", window, slide).alias("win"))
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "approx_users",
            "n_events",
        )
    )


def stream_stream_error_purchase_join(
    spark: SparkSession, sf_dir: str, tolerance: str = "30 minutes"
) -> DataFrame:
    """Stream-stream inner join: each error event pairs with the same
    user's purchases within +/-tolerance. Both sides carry watermarks so
    the join state is bounded (rows age out once the other side's
    watermark passes their ts + tolerance) — the canonical enrichment
    join that an unbounded-state batch join cannot provide in streaming.
    Correctness: tests compare against the identical batch join."""
    errors = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "1 hour")
    )
    purchases = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    return errors.join(
        purchases,
        (F.col("e_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("e_ts") - F.expr(f"INTERVAL {tolerance}"))
        & (F.col("p_ts") <= F.col("e_ts") + F.expr(f"INTERVAL {tolerance}")),
    ).select("error_id", "purchase_id")


def stream_to_parquet(df: DataFrame, out_dir: str, checkpoint_dir: str):
    """Exactly-once file sink: the parquet sink's commit log plus the
    checkpointed source offsets give end-to-end exactly-once for file
    sources — the Structured-Streaming replacement for the reference's
    atomic temp-file+rename output commit (worker.go:136-144) and its
    crash-recovery re-execution (this is the C9 durability story).
    Restarting with the same checkpoint resumes, never duplicates."""
    return (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_foreach_batch(df: DataFrame, sink_fn, checkpoint_dir: str):
    """foreachBatch escape hatch: sink_fn(batch_df, batch_id) runs once
    per micro-batch (replays on failure carry the same batch_id, so an
    idempotent sink_fn — e.g. overwrite-by-batch-id partition — yields
    exactly-once into arbitrary targets)."""
    return (
        df.writeStream.foreachBatch(sink_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_to_memory(df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming DF into an in-memory sink (tests); returns the
    StreamingQuery — caller does processAllAvailable() + stop()."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_events(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of the batch
    ``dedup_exact`` family: keep the FIRST event per (user_id,
    event_type) key; ``dropDuplicatesWithinWatermark`` evicts a key's
    dedup state once the watermark passes its event time, so state stays
    bounded no matter how long the stream runs (a plain
    ``dropDuplicates`` would grow state forever — the 100 TB/day
    difference)."""
    ev = stream_events(spark, sf_dir)
    return ev.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def streaming_session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming gap-based sessionization — the streaming twin of the
    batch ``events_sessionization`` query (same ``session_window``
    expression, so the session boundaries are IDENTICAL by construction).
    State = currently-open sessions per user; a session closes — and is
    emitted exactly once in append mode — when the watermark passes its
    end + gap, which is what keeps state bounded on an unbounded stream.
    Scale: one shuffle on the session key (user_id); merging adjacent
    windows is done by the state store, not a sort."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            (F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts")).alias(
                "duration_sec"
            ),
            "session_value",
        )
    )


DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table (new corpus shards
    arriving — the ingestion shape of a crawling pipeline)."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def stream_static_contamination(
    docs_stream: DataFrame, bench_ngrams: DataFrame
) -> DataFrame:
    """Stream-static join: incoming documents against the STATIC
    benchmark n-gram set — the streaming twin of
    ``pipeline_contamination_check`` (operators/curation.py), i.e. the
    "reject contaminated shards at ingest" gate.

    Stream-static inner joins are stateless (the static side is simply
    looked up per micro-batch; no watermark, no join state), so this
    scales to an unbounded corpus stream with constant memory — the
    static benchmark side is broadcast exactly like the batch plan.
    Emits one row per (document occurrence, distinct shared n-gram);
    batch equivalence is asserted in tests/test_streaming.py."""
    from ..operators.curation import _CONTAM_N, _word_ngrams

    toks = F.split("text", " ")
    grams = docs_stream.select(
        "doc_id",
        F.explode(F.array_distinct(_word_ngrams(toks, _CONTAM_N))).alias("ng"),
    )
    return grams.join(F.broadcast(bench_ngrams), "ng").select("doc_id", "ng")


def stream_frontier_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the frontier dedup: planted raw URLs arrive
    with document shards, are normalized JVM-side, and pass through a
    streaming ``dropDuplicates`` on (host, norm_url) — the state the
    crawler's frontier holds.  Emits each never-seen-before URL once
    (append mode).  On an unbounded crawl the state would be bounded
    with ``withWatermark`` + an event-time column or a TTL'd
    transformWithState store; the planted corpus is finite, so the
    test twin keeps exact state."""
    from ..operators.crawl import _planted_raw_urls, normalize_urls

    docs = stream_documents(spark, sf_dir).select("doc_id")
    norm = normalize_urls(_planted_raw_urls(docs), "url")
    return norm.select("host", "norm_url").dropDuplicates(
        ["host", "norm_url"]
    )
