"""Streaming decode twins: the stateless mapInPandas decode pipelines
produce IDENTICAL rows under Structured Streaming and batch."""

from __future__ import annotations

from mit_6_5840_mapreduce_with_go_spark.operators import multimodal4 as M
from mit_6_5840_mapreduce_with_go_spark.streaming import decode as D
from mit_6_5840_mapreduce_with_go_spark.streaming.windows import run_to_memory

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_wav_stats_equals_batch(spark):
    q = run_to_memory(D.stream_wav_stats(spark, SF), "t_wav_stream", "append")
    try:
        q.processAllAvailable()
        got = _rows(spark.table("t_wav_stream"))
    finally:
        q.stop()
    want = _rows(M.mm_decode_wav_stats(spark, SF))
    assert got == want and len(got) > 0


def test_stream_frame_sample_equals_batch(spark):
    q = run_to_memory(D.stream_frame_sample(spark, SF), "t_y4m_stream", "append")
    try:
        q.processAllAvailable()
        got = _rows(spark.table("t_y4m_stream"))
    finally:
        q.stop()
    want = _rows(M.mm_video_frame_sample(spark, SF))
    assert got == want and len(got) > 0


def test_stream_progressive_stats_equals_batch(spark):
    from mit_6_5840_mapreduce_with_go_spark.operators import multimodal8 as M8

    q = run_to_memory(
        D.stream_progressive_stats(spark, SF), "t_prog_stream", "append"
    )
    try:
        q.processAllAvailable()
        got = _rows(spark.table("t_prog_stream"))
    finally:
        q.stop()
    want = _rows(M8.mm_decode_jpeg_progressive_stats(spark, SF))
    assert got == want and len(got) > 0


def test_stream_warc_stats_equals_batch(spark):
    from mit_6_5840_mapreduce_with_go_spark.operators import multimodal10 as M10

    q = run_to_memory(D.stream_warc_stats(spark, SF), "t_warc_stream", "append")
    try:
        q.processAllAvailable()
        got = _rows(spark.table("t_warc_stream"))
    finally:
        q.stop()
    want = _rows(M10.mm_decode_warc_stats(spark, SF))
    assert got == want and len(got) > 0


def test_stream_warc_http_stats_equals_batch(spark):
    from mit_6_5840_mapreduce_with_go_spark.operators import multimodal10 as M10

    q = run_to_memory(
        D.stream_warc_http_stats(spark, SF), "t_http_stream", "append"
    )
    try:
        q.processAllAvailable()
        got = _rows(spark.table("t_http_stream"))
    finally:
        q.stop()
    want = _rows(M10.mm_warc_http_stats(spark, SF))
    assert got == want and len(got) > 0


def test_stream_zstd_entropy_stats_equals_batch(spark):
    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal14 import (
        mm_decode_zstd_entropy_stats,
    )

    q = run_to_memory(
        D.stream_zstd_entropy_stats(spark, SF), "t_zstd_stream", "append"
    )
    try:
        q.processAllAvailable()
        got = _rows(spark.table("t_zstd_stream"))
    finally:
        q.stop()
    want = _rows(mm_decode_zstd_entropy_stats(spark, SF))
    assert got == want and len(got) > 0
