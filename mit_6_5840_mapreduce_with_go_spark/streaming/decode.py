"""Streaming multimodal ingest: the decode pipelines as Structured
Streaming twins.

A crawling/ingest pipeline sees media arrive continuously; the decode
-> stats stages must run identically on the stream and in backfill
batch jobs.  Because both stages are STATELESS ``mapInPandas`` maps
(no aggregation, no watermark, no state store), the exact pipeline
functions from ``operators/multimodal4.py`` run unchanged on a
file-source stream — asserted by the batch==stream equivalence tests
(tests/test_streaming_decode.py), the same twin discipline as the
CAS/EWMA/heavy-hitter families.

Scale: stateless per-batch maps keep no state between micro-batches,
so throughput is the only resource dimension — the streaming plan is
the batch plan applied per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal4 import frame_sample_pipeline, wav_stats_pipeline
from ..operators.multimodal8 import progressive_stats_pipeline
from .windows import stream_documents


def stream_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``mm_decode_wav_stats``: audio payloads decoded
    per micro-batch as document shards arrive."""
    return wav_stats_pipeline(stream_documents(spark, sf_dir).select("doc_id"))


def stream_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``mm_video_frame_sample``: video shards frame-
    sampled at ingest, emitting one row per kept frame."""
    return frame_sample_pipeline(stream_documents(spark, sf_dir).select("doc_id"))


def stream_progressive_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``mm_decode_jpeg_progressive_stats``: SOF2
    multi-scan decode per micro-batch as document shards arrive."""
    return progressive_stats_pipeline(
        stream_documents(spark, sf_dir).select("doc_id")
    )


def stream_warc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``mm_decode_warc_stats``: .warc.gz mini-crawls
    walked per micro-batch as document shards arrive — the actual shape
    of a continuous Common-Crawl ingest."""
    from ..operators.multimodal10 import warc_stats_pipeline

    return warc_stats_pipeline(stream_documents(spark, sf_dir).select("doc_id"))


def stream_warc_http_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``mm_warc_http_stats``: gzip + WARC + HTTP
    (chunked) payload extraction per micro-batch."""
    from ..operators.multimodal10 import warc_http_pipeline

    return warc_http_pipeline(stream_documents(spark, sf_dir).select("doc_id"))


def stream_zstd_entropy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``mm_decode_zstd_entropy_stats``: full
    FSE/Huffman zstd decode per micro-batch as document shards arrive —
    the shape of a continuous .zst crawl ingest."""
    from ..operators.multimodal14 import zstd_entropy_pipeline

    return zstd_entropy_pipeline(stream_documents(spark, sf_dir).select("doc_id"))
