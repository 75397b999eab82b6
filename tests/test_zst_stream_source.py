"""Streaming zstfile SOURCE: shards arriving over time are decoded
exactly once per micro-batch (offset = position in the sorted shard
listing, carried by the checkpoint).

Proofs: (1) two availableNow passes over a growing directory with one
checkpoint process each shard exactly once, and their union equals the
batch read of everything; (2) batch == stream on a static directory;
(3) a restart with no new shards emits nothing."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from mit_6_5840_mapreduce_with_go_spark.operators import multimodal14 as M14
from mit_6_5840_mapreduce_with_go_spark.sources.zstfiles import (
    read_zst_source,
    read_zst_stream,
    write_seekable_shard,
)


def _shard(docs):
    frames, contents = zip(*(M14._zstd_entropy_frame_and_content(d) for d in docs))
    return write_seekable_shard(list(frames), list(contents))


def _run_available_now(spark, src_glob, checkpoint):
    """One availableNow pass; rows collected via foreachBatch (the
    memory sink does not support checkpoint recovery)."""
    rows: list = []

    def sink(df, _epoch):
        rows.extend(df.collect())

    q = (
        read_zst_stream(spark, src_glob)
        .select("file", "frame_index", "content_len", "content_sum")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return rows


def test_growing_directory_exactly_once(spark, tmp_path):
    src = tmp_path / "shards"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    # epoch 1: two shards
    (src / "e1-000.zst").write_bytes(_shard((3, 8)))
    (src / "e1-001.zst").write_bytes(_shard((123,)))
    got1 = _run_available_now(spark, str(src / "*.zst"), ckpt)
    assert {r["file"] for r in got1} == {"e1-000.zst", "e1-001.zst"}
    assert len(got1) == 3
    # epoch 2: two MORE shards, names sorting after epoch 1's
    (src / "e2-000.zst").write_bytes(_shard((7, 44)))
    (src / "e2-001.zst").write_bytes(_shard((55,)))
    got2 = _run_available_now(spark, str(src / "*.zst"), ckpt)
    # the second run must contain ONLY the new shards (exactly-once:
    # epoch-1 shards not reprocessed under the shared checkpoint)
    assert {r["file"] for r in got2} == {"e2-000.zst", "e2-001.zst"}
    assert len(got2) == 3
    # union of both runs == batch read of the whole directory
    batch = (
        read_zst_source(spark, str(src / "*.zst"))
        .select("file", "frame_index", "content_len", "content_sum")
        .collect()
    )
    key = lambda r: (r["file"], r["frame_index"], r["content_len"], r["content_sum"])  # noqa: E731
    assert sorted(map(key, got1 + got2)) == sorted(map(key, batch))
    # epoch 3: nothing new — a restart emits zero rows
    got3 = _run_available_now(spark, str(src / "*.zst"), ckpt)
    assert got3 == []


def test_stream_meta_mode_composes(spark, tmp_path):
    """mode=meta composes with the stream reader: a streaming frame
    census over corrupt-payload shards succeeds (tables only, no
    decode) — the streaming twin of the metadata-scan proof."""
    from mit_6_5840_mapreduce_with_go_spark.sources.zstfiles import (
        parse_seek_table,
    )

    src = tmp_path / "shards"
    src.mkdir()
    payload = bytearray(_shard((3, 123, 7)))
    for en in parse_seek_table(bytes(payload)):
        payload[en["c_off"] : en["c_off"] + 4] = b"\x00\x00\x00\x00"
    (src / "s0.zst").write_bytes(bytes(payload))
    import uuid

    table = f"zst_meta_stream_{uuid.uuid4().hex[:8]}"
    from mit_6_5840_mapreduce_with_go_spark.sources.zstfiles import (
        ZstDataSource,
        _enable_pushdown,
    )

    spark.dataSource.register(ZstDataSource)
    _enable_pushdown(spark)
    q = (
        spark.readStream.format("zstfile")
        .option("mode", "meta")
        .load(str(src / "*.zst"))
        .writeStream.format("memory")
        .queryName(table)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(table).collect()
    want = parse_seek_table(bytes(payload))
    assert sorted((r["frame_index"], r["content_len"], r["compressed_len"]) for r in rows) == [
        (i, en["d_size"], en["c_size"]) for i, en in enumerate(want)
    ]


def test_static_directory_stream_equals_batch(spark, sf_dir):
    """Full-decode census via the STREAM path == the batch source over
    the shared seekable fixtures."""
    shards = os.path.join(M14._seekable_shard_dir(sf_dir), "*.zst")
    assert glob.glob(shards)
    import uuid

    table = f"zst_static_{uuid.uuid4().hex[:8]}"
    ckpt = f"/tmp/zst_stream_ckpt_{uuid.uuid4().hex[:8]}"
    q = (
        read_zst_stream(spark, shards)
        .groupBy("file")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("content_sum").alias("total_sum"),
        )
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["file"]: (r["n_frames"], r["total_sum"])
        for r in spark.table(table).collect()
    }
    want = {
        r["file"]: (r["n_frames"], r["total_sum"])
        for r in read_zst_source(spark, shards)
        .groupBy("file")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("content_sum").alias("total_sum"),
        )
        .collect()
    }
    assert got == want and got
