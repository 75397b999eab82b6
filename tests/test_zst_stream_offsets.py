"""Streaming zstfile source round 13: NAME-ANCHORED offsets and the
option-driven pushdown band.

Offset hardening (ADVICE r12): the offset carries (count, last-name)
and planning re-validates the anchor against the listing, so the two
silent-corruption scenarios of positional offsets — a shard arriving
that sorts BEFORE the committed frontier, and a committed shard
DISAPPEARING — now fail loudly instead of shifting indices into a
skip or double-read.

Pushdown band: Catalyst pushes filters into BATCH Python data sources
only (pyspark plans streaming readers without the pushFilters
exchange), so the stream path takes min/max_frame_bytes as OPTIONS
honored by the same shared reader — proven equal to the batch path's
Catalyst-pushed BETWEEN, and proven I/O-proportional by corrupt
frames planted OUTSIDE the band.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.errors.exceptions.captured import StreamingQueryException

from mit_6_5840_mapreduce_with_go_spark.operators import multimodal14 as M14
from mit_6_5840_mapreduce_with_go_spark.sources.zstfiles import (
    parse_seek_table,
    read_zst_source,
    read_zst_stream,
    write_seekable_shard,
)


def _shard(docs):
    frames, contents = zip(*(M14._zstd_entropy_frame_and_content(d) for d in docs))
    return write_seekable_shard(list(frames), list(contents))


def _shard_lens(lens):
    """Store-mode shard whose frame content lengths are exactly
    ``lens`` (the band tests address frames by size)."""
    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal13 import (
        encode_zstd_raw,
    )

    frames, contents = [], []
    for i, n in enumerate(lens):
        content = bytes((i + j) % 251 for j in range(n))
        frames.append(encode_zstd_raw([("raw", content)]))
        contents.append(content)
    return write_seekable_shard(frames, contents)


def _run_available_now(spark, src_glob, checkpoint, **reader_kwargs):
    rows: list = []

    def sink(df, _epoch):
        rows.extend(df.collect())

    q = (
        read_zst_stream(spark, src_glob, **reader_kwargs)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return rows


def test_out_of_order_arrival_fails_loudly(spark, tmp_path):
    """A shard whose name sorts BEFORE the committed frontier must
    raise at planning time, never silently shift the window."""
    src = tmp_path / "shards"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (src / "b-000.zst").write_bytes(_shard((3, 8)))
    (src / "b-001.zst").write_bytes(_shard((123,)))
    got = _run_available_now(spark, str(src / "*.zst"), ckpt)
    assert len(got) == 3
    # out-of-order arrival: sorts before the committed frontier
    (src / "a-000.zst").write_bytes(_shard((7,)))
    with pytest.raises(StreamingQueryException, match="out of sort order"):
        _run_available_now(spark, str(src / "*.zst"), ckpt)


def test_committed_shard_deletion_fails_loudly(spark, tmp_path):
    """A committed shard disappearing must raise (the count anchor),
    never let later shards slide into its index (a double-read)."""
    src = tmp_path / "shards"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (src / "e1-000.zst").write_bytes(_shard((3,)))
    (src / "e1-001.zst").write_bytes(_shard((8,)))
    got = _run_available_now(spark, str(src / "*.zst"), ckpt)
    assert len(got) == 2
    (src / "e1-001.zst").unlink()
    (src / "e2-000.zst").write_bytes(_shard((44,)))
    # listing length still matches the committed count, but the anchor
    # name at the frontier is now e2-000.zst, not e1-001.zst
    with pytest.raises(StreamingQueryException, match="out of sort order|disappeared"):
        _run_available_now(spark, str(src / "*.zst"), ckpt)


def test_deletion_shrinking_listing_fails_loudly(spark, tmp_path):
    src = tmp_path / "shards"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (src / "e1-000.zst").write_bytes(_shard((3,)))
    (src / "e1-001.zst").write_bytes(_shard((8,)))
    got = _run_available_now(spark, str(src / "*.zst"), ckpt)
    assert len(got) == 2
    (src / "e1-001.zst").unlink()
    with pytest.raises(StreamingQueryException, match="disappeared"):
        _run_available_now(spark, str(src / "*.zst"), ckpt)


def test_stream_band_options_equal_batch_pushdown(spark, tmp_path):
    """min/max_frame_bytes stream options == the batch path's
    Catalyst-pushed BETWEEN over the same shards."""
    src = tmp_path / "shards"
    src.mkdir()
    (src / "s0.zst").write_bytes(_shard_lens((3, 150, 80, 500)))
    (src / "s1.zst").write_bytes(_shard_lens((40, 260, 7)))
    lo, hi = 50, 300
    cols = ["file", "frame_index", "content_len", "content_sum"]
    got = _run_available_now(
        spark,
        str(src / "*.zst"),
        str(tmp_path / "ckpt"),
        min_frame_bytes=lo,
        max_frame_bytes=hi,
    )
    key = lambda r: tuple(r[c] for c in cols)  # noqa: E731
    want = (
        read_zst_source(spark, str(src / "*.zst"))
        .where(f"content_len BETWEEN {lo} AND {hi}")
        .collect()
    )
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(want) == 3  # 150, 80, 260


def test_stream_band_never_reads_out_of_band_frames(spark, tmp_path):
    """Adversarial I/O proof for the STREAM band: every frame OUTSIDE
    [lo, hi] has its payload corrupted (magic zeroed) under an intact
    seek table.  The banded stream succeeds with exactly the in-band
    census — so out-of-band bytes were never decoded — while an
    unbanded stream over the same shard raises."""
    src = tmp_path / "shards"
    src.mkdir()
    payload = bytearray(_shard_lens((3, 150, 80, 500, 9)))
    lo, hi = 50, 300
    entries = parse_seek_table(bytes(payload))
    for en in entries:
        if not (lo <= en["d_size"] <= hi):
            payload[en["c_off"] : en["c_off"] + 4] = b"\x00\x00\x00\x00"
    (src / "s0.zst").write_bytes(bytes(payload))
    got = _run_available_now(
        spark,
        str(src / "*.zst"),
        str(tmp_path / "ckpt1"),
        min_frame_bytes=lo,
        max_frame_bytes=hi,
    )
    assert sorted((r["frame_index"], r["content_len"]) for r in got) == [
        (i, en["d_size"])
        for i, en in enumerate(entries)
        if lo <= en["d_size"] <= hi
    ]
    with pytest.raises(StreamingQueryException):
        _run_available_now(spark, str(src / "*.zst"), str(tmp_path / "ckpt2"))


def test_stream_meta_band_composes(spark, tmp_path):
    """mode=meta × band options on the STREAM: every payload corrupt,
    census still table-true and band-filtered."""
    src = tmp_path / "shards"
    src.mkdir()
    payload = bytearray(_shard_lens((3, 150, 80, 500)))
    entries = parse_seek_table(bytes(payload))
    for en in entries:
        payload[en["c_off"] : en["c_off"] + 4] = b"\x00\x00\x00\x00"
    (src / "s0.zst").write_bytes(bytes(payload))
    table = f"zst_meta_band_{uuid.uuid4().hex[:8]}"
    q = (
        read_zst_stream(
            spark,
            str(src / "*.zst"),
            mode="meta",
            min_frame_bytes=50,
            max_frame_bytes=300,
        )
        .writeStream.format("memory")
        .queryName(table)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = spark.table(table).collect()
    assert sorted((r["frame_index"], r["content_len"]) for r in rows) == [
        (1, 150),
        (2, 80),
    ]


def test_legacy_positional_offset_accepted(spark, tmp_path):
    """Pre-round-13 checkpoints carry {"index": N} with no name: the
    validator accepts them (count honored, anchor unvalidatable) so a
    restart across the upgrade keeps exactly-once."""
    from mit_6_5840_mapreduce_with_go_spark.sources.zstfiles import (
        ZstStreamReader,
    )

    src = tmp_path / "shards"
    src.mkdir()
    (src / "e1-000.zst").write_bytes(_shard((3,)))
    (src / "e1-001.zst").write_bytes(_shard((8,)))
    r = ZstStreamReader({"path": str(src / "*.zst")})
    parts = r.partitions({"index": 1}, {"index": 2})
    assert [p.value for p in parts] == [str(src / "e1-001.zst")]
