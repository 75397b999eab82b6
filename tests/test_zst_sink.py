"""zstfile WRITE path: seekable .zst shards out of a DataFrame.

Proofs: byte-exact decompression of written shards by SYSTEM libzstd
(the golden decoder — our frames must be spec-valid zstd, not merely
self-consistent), seek-table validity + immediate prunability by the
read path's pushdown, frame order = row order within a partition,
overwrite semantics, two-phase commit (no partial shards from aborted
jobs), and the NULL-content loud failure."""

from __future__ import annotations

import ctypes
import glob
import os

import pytest
from pyspark.sql import functions as F

from mit_6_5840_mapreduce_with_go_spark.sources.zstfiles import (
    parse_seek_table,
    read_zst_source,
    write_zst_sink,
)


def _libzstd_decompress(payload: bytes, expect_len: int) -> bytes:
    lib = ctypes.CDLL("libzstd.so.1")
    lib.ZSTD_decompress.restype = ctypes.c_size_t
    lib.ZSTD_isError.restype = ctypes.c_uint
    dst = ctypes.create_string_buffer(expect_len + 16)
    n = lib.ZSTD_decompress(dst, expect_len + 16, payload, len(payload))
    assert not lib.ZSTD_isError(n), "libzstd rejected our frame"
    return dst.raw[:n]


def test_written_shards_are_valid_zstd_per_libzstd(spark, tmp_path):
    rows = [("alpha " * 40,), ("beta " * 1000,), ("x" * 300000,)]
    df = spark.createDataFrame(rows, "content string").coalesce(1)
    out = str(tmp_path / "shards")
    write_zst_sink(df, out)
    files = sorted(glob.glob(out + "/shard-*.zst"))
    assert len(files) == 1
    payload = open(files[0], "rb").read()
    entries = parse_seek_table(payload)
    assert entries is not None and len(entries) == 3
    want = [r[0].encode() for r in rows]
    total = b"".join(want)
    # frame area decompresses byte-exact through SYSTEM libzstd
    # (simple-API decompress handles concatenated frames; the seek
    # table is a skippable frame it ignores)
    got = _libzstd_decompress(payload, len(total) + 64)
    assert got == total
    # the 300 KB row spans multiple 128 KiB raw blocks
    for en, w in zip(entries, want):
        assert en["d_size"] == len(w)


def test_roundtrip_order_and_pushdown_on_written_shards(spark, tmp_path):
    df = (
        spark.range(0, 40)
        .select(
            F.col("id"),
            F.concat(F.lit("doc-"), F.col("id").cast("string"))
            .cast("binary")
            .alias("content"),
        )
        .repartition(3, "id")
        .sortWithinPartitions("id")
    )
    out = str(tmp_path / "shards")
    write_zst_sink(df, out)
    back = read_zst_source(spark, out + "/*.zst")
    rows = back.select("file", "frame_index", "content").collect()
    assert len(rows) == 40
    # frame order within each shard == row order (sorted by id)
    by_file: dict[str, list[tuple[int, bytes]]] = {}
    for r in rows:
        by_file.setdefault(r["file"], []).append(
            (r["frame_index"], bytes(r["content"]))
        )
    for frames in by_file.values():
        frames.sort()
        ids = [int(c.decode().split("-")[1]) for _, c in frames]
        assert ids == sorted(ids)
    # written shards are immediately prunable via pushdown (seek table)
    long_ones = (
        read_zst_source(spark, out + "/*.zst")
        .where(F.col("content_len") >= 7)  # 'doc-10'.. are 6 bytes; >=7 none
        .count()
    )
    assert long_ones == 0


def test_huffman_codec_shards_valid_zstd_and_smaller(spark, tmp_path):
    """codec=huffman: frames are entropy-coded literal blocks that
    system libzstd decodes byte-exact, and text content genuinely
    compresses (frame smaller than content).  Incompressible and
    single-byte-run chunks take the raw/RLE fallback and stay valid."""
    import os as _os

    text = ("the quick brown fox jumps over the lazy dog " * 60).encode()
    rows = [
        (text,),
        (b"z" * 2500,),            # RLE fallback
        (_os.urandom(3000),),      # raw fallback (incompressible)
        (b"",),                    # empty content
    ]
    df = spark.createDataFrame(rows, "content binary").coalesce(1)
    out = str(tmp_path / "shards")
    write_zst_sink(df, out, codec="huffman")
    files = sorted(glob.glob(out + "/shard-*.zst"))
    assert len(files) == 1
    payload = open(files[0], "rb").read()
    entries = parse_seek_table(payload)
    assert entries is not None and len(entries) == 4
    want = b"".join(r[0] for r in rows)
    got = _libzstd_decompress(payload, len(want) + 64)
    assert got == want
    # the text frame compresses; sizes are pinned in the seek table
    by_dsize = {en["d_size"]: en["c_size"] for en in entries}
    assert by_dsize[len(text)] < len(text)
    # the RLE run collapses to almost nothing
    assert by_dsize[2500] < 100
    # round trip through the source (full decode + checksum verify)
    back = read_zst_source(spark, out + "/*.zst").select("content").collect()
    assert sorted(bytes(r["content"]) for r in back) == sorted(
        r[0] for r in rows
    )


def test_sink_rejects_unknown_codec(spark, tmp_path):
    df = spark.createDataFrame([("x",)], "content string")
    with pytest.raises(Exception, match="codec"):
        write_zst_sink(df, str(tmp_path / "s"), codec="lz4")


def test_overwrite_clears_stale_shards(spark, tmp_path):
    out = str(tmp_path / "shards")
    big = spark.createDataFrame([("one",), ("two",)], "content string").repartition(2)
    write_zst_sink(big, out)
    assert len(glob.glob(out + "/shard-*.zst")) == 2
    small = spark.createDataFrame([("solo",)], "content string").coalesce(1)
    write_zst_sink(small, out, mode="overwrite")
    files = glob.glob(out + "/shard-*.zst")
    assert len(files) == 1
    got = read_zst_source(spark, out + "/*.zst").select("content").collect()
    assert [bytes(r["content"]) for r in got] == [b"solo"]


def test_failed_job_leaves_no_visible_shards(spark, tmp_path):
    out = str(tmp_path / "shards")

    def boom(content):
        raise RuntimeError("planted task failure")

    from pyspark.sql.types import StringType

    ub = F.udf(boom, StringType())
    df = spark.createDataFrame([("a",), ("b",)], "content string").select(
        ub("content").alias("content")
    )
    with pytest.raises(Exception):
        write_zst_sink(df, out)
    assert glob.glob(out + "/shard-*.zst") == []
    assert glob.glob(out + "/.inflight-*") == []


def test_null_content_fails_loudly(spark, tmp_path):
    df = spark.createDataFrame([("ok",), (None,)], "content string")
    with pytest.raises(Exception, match="NULL content"):
        write_zst_sink(df, str(tmp_path / "shards"))


def test_schema_without_content_rejected(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(Exception, match="content"):
        write_zst_sink(df, str(tmp_path / "shards"))


def test_streaming_foreachbatch_export_equals_batch(spark, tmp_path):
    """Streaming corpus EXPORT twin: a file-source stream exported
    shard-by-shard via foreachBatch(write_zst_sink) must produce the
    same frame multiset as the one-shot batch export of the same data
    (append mode — each micro-batch lands its own shards)."""
    src = tmp_path / "in"
    src.mkdir()
    rows = [f"streamdoc-{i} " * (i + 1) for i in range(12)]
    for i, r in enumerate(rows):
        (src / f"{i:02d}.txt").write_text(r)

    out_stream = str(tmp_path / "stream_shards")
    out_batch = str(tmp_path / "batch_shards")

    batch_df = (
        spark.read.format("text")
        .load(str(src))
        .select(F.col("value").cast("binary").alias("content"))
    )
    write_zst_sink(batch_df.repartition(2), out_batch)

    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 5)
        .load(str(src))
        .select(F.col("value").cast("binary").alias("content"))
    )

    def sink_batch(df, epoch_id):
        write_zst_sink(
            df.repartition(2), os.path.join(out_stream, f"epoch-{epoch_id}")
        )

    q = stream.writeStream.foreachBatch(sink_batch).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)

    got = (
        read_zst_source(spark, out_stream + "/epoch-*/shard-*.zst")
        .select("content")
        .collect()
    )
    want = read_zst_source(spark, out_batch + "/*.zst").select("content").collect()
    as_set = lambda rs: sorted(bytes(r["content"]) for r in rs)  # noqa: E731
    assert as_set(got) == as_set(want)
    assert as_set(got) == sorted(r.encode() for r in rows)
