"""Catalyst filter pushdown into the zstfile source (VERDICT r10 #4):
a plain ``where(content_len >= X)`` — no option — must reach the
source's seek-table frame pruning.  Proofs: (1) the predicate leaves
the physical plan entirely; (2) a planted corrupt below-threshold frame
is never decoded under the pushed filter but fails a full read; (3) a
shard WITHOUT a seek table falls back to walk-then-filter with exact
results; (4) with the pushdown conf off, Spark refuses loudly rather
than silently dropping the pushdown."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mit_6_5840_mapreduce_with_go_spark.operators import multimodal14 as M14
from mit_6_5840_mapreduce_with_go_spark.sources.zstfiles import (
    read_zst_source,
    write_seekable_shard,
)


def _planted_shard(tmp_path, corrupt_small: bool = True):
    """Three entropy frames; optionally corrupt the SMALL one (doc 7,
    variant 2) mid-frame while keeping its seek-table entry intact."""
    frames, contents = [], []
    for d in (3, 123, 7):
        fr, ct = M14._zstd_entropy_frame_and_content(d)
        frames.append(fr)
        contents.append(ct)
    if corrupt_small:
        small = bytearray(frames[2])
        small[len(small) // 2] ^= 0xFF
        small[len(small) // 2 + 1] ^= 0xFF
        frames[2] = bytes(small)
    p = tmp_path / "shard.zst"
    p.write_bytes(write_seekable_shard(frames, contents))
    return p, contents


def test_pushed_filter_leaves_the_plan(spark, sf_dir):
    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal14 import (
        mm_zst_pushdown_stats,
    )

    df = mm_zst_pushdown_stats(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the comparison predicate is absorbed by pushFilters — no residual
    # Filter OPERATOR over the scan at all (IsNotNull is absorbed too:
    # every emitted field is populated).  Match operator nodes only, not
    # the scan line's "RuntimeFilters: []" annotation.
    import re

    filter_nodes = [
        ln
        for ln in plan.splitlines()
        if re.match(r"^[\s+:*()\-\d]*Filter\b", ln)
    ]
    assert not filter_nodes, plan
    assert "BatchScan zstfile" in plan
    # and the filter is actually APPLIED (rows below threshold absent)
    assert df.count() > 0
    assert df.where(F.col("content_len") < M14._PUSH_MIN_BYTES).count() == 0


def test_pushdown_prunes_at_source_corrupt_frame_proof(spark, tmp_path):
    """The planted corrupt below-threshold frame would raise if decoded;
    the pushed filter must make the read succeed (frames are skipped by
    seek-table offset, not decoded-then-filtered), while the unfiltered
    read of the same shard raises."""
    p, contents = _planted_shard(tmp_path)
    threshold = max(len(contents[2]) + 1, 200)
    got = (
        read_zst_source(spark, str(p))
        .where(F.col("content_len") >= threshold)
        .select("frame_index", "content_len")
        .collect()
    )
    kept = {r["frame_index"] for r in got}
    assert kept and 2 not in kept, kept
    with pytest.raises(Exception):
        read_zst_source(spark, str(p)).collect()


def test_pushdown_strict_greater_than(spark, tmp_path):
    """content_len > X is absorbed as >= X+1 on the integral column."""
    p, contents = _planted_shard(tmp_path, corrupt_small=False)
    sizes = sorted(len(c) for c in contents)
    cut = sizes[1]  # keep only frames strictly larger than the median
    got = (
        read_zst_source(spark, str(p))
        .where(F.col("content_len") > cut)
        .collect()
    )
    assert {r["content_len"] for r in got} == {s for s in sizes if s > cut}


def test_pushdown_upper_bound_corrupt_large_frame_proof(spark, tmp_path):
    """content_len <= X prunes ABOVE-band frames at the source: the
    planted corrupt LARGEST frame would raise if decoded, so the
    filtered read succeeding proves the upper bound reached the seek
    table (before round 12 it fell back to a Spark-side filter over
    fully-decoded frames)."""
    frames, contents = zip(
        *(M14._zstd_entropy_frame_and_content(d) for d in (3, 123, 7))
    )
    frames, contents = list(frames), list(contents)
    big = max(range(3), key=lambda i: len(contents[i]))
    bad = bytearray(frames[big])
    bad[len(bad) // 2] ^= 0xFF
    bad[len(bad) // 2 + 1] ^= 0xFF
    frames[big] = bytes(bad)
    p = tmp_path / "shard.zst"
    p.write_bytes(write_seekable_shard(frames, contents))
    cut = len(contents[big]) - 1
    got = (
        read_zst_source(spark, str(p))
        .where(F.col("content_len") <= cut)
        .select("frame_index", "content_len")
        .collect()
    )
    assert {r["frame_index"] for r in got} == {
        i for i in range(3) if len(contents[i]) <= cut
    } and big not in {r["frame_index"] for r in got}
    with pytest.raises(Exception):
        read_zst_source(spark, str(p)).collect()
    # strict < takes the same path (absorbed as <= X-1)
    strict = (
        read_zst_source(spark, str(p))
        .where(F.col("content_len") < len(contents[big]))
        .count()
    )
    assert strict == len(got)


def test_pushdown_between_keeps_only_the_band(spark, tmp_path):
    """BETWEEN (a >=/<= pair after Catalyst) absorbs BOTH bounds: with
    the smallest AND largest frames corrupted, only the middle frame's
    band read succeeds."""
    frames, contents = zip(
        *(M14._zstd_entropy_frame_and_content(d) for d in (3, 123, 7))
    )
    frames, contents = list(frames), list(contents)
    order = sorted(range(3), key=lambda i: len(contents[i]))
    for i in (order[0], order[2]):  # corrupt smallest and largest
        bad = bytearray(frames[i])
        bad[len(bad) // 2] ^= 0xFF
        frames[i] = bytes(bad)
    p = tmp_path / "shard.zst"
    p.write_bytes(write_seekable_shard(frames, contents))
    mid = len(contents[order[1]])
    got = (
        read_zst_source(spark, str(p))
        .where(F.col("content_len").between(mid, mid))
        .collect()
    )
    assert [r["frame_index"] for r in got] == [order[1]]
    # equality is absorbed as the degenerate band
    eq = (
        read_zst_source(spark, str(p))
        .where(F.col("content_len") == mid)
        .collect()
    )
    assert [r["frame_index"] for r in eq] == [order[1]]


def test_is_not_null_on_nullable_window_log_not_absorbed(spark, tmp_path):
    """window_log is None for single-segment frames, which libzstd
    emits BY DEFAULT for small inputs — the externally-produced-shard
    case — so its IsNotNull must be yielded back to Spark: absorbing it
    as trivially true would return NULL rows through
    `WHERE window_log IS NOT NULL`."""
    import ctypes

    lib = ctypes.CDLL("libzstd.so.1")
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_compress.restype = ctypes.c_size_t
    lib.ZSTD_isError.restype = ctypes.c_uint
    content = b"tiny external payload"
    bound = lib.ZSTD_compressBound(len(content))
    dst = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress(dst, bound, content, len(content), 3)
    assert not lib.ZSTD_isError(n)
    (tmp_path / "ext.zst").write_bytes(
        write_seekable_shard([dst.raw[:n]], [content])
    )
    src = read_zst_source(spark, str(tmp_path / "ext.zst"))
    rows = src.collect()
    assert len(rows) == 1 and rows[0]["window_log"] is None, rows
    assert src.where(F.col("window_log").isNotNull()).count() == 0
    assert src.where(F.col("window_log").isNull()).count() == 1


def test_pushdown_fallback_without_seek_table(spark, tmp_path):
    """A shard with NO seek table cannot prune, but an absorbed filter
    must still be honored exactly (walk-then-filter inside read())."""
    frames, contents = zip(
        *(M14._zstd_entropy_frame_and_content(d) for d in (3, 123, 7))
    )
    p = tmp_path / "plain.zst"
    p.write_bytes(b"".join(frames))  # concatenated frames, no table
    threshold = sorted(len(c) for c in contents)[1]
    got = (
        read_zst_source(spark, str(p))
        .where(F.col("content_len") >= threshold)
        .select("frame_index", "content_len")
        .collect()
    )
    want = {
        (i, len(c)) for i, c in enumerate(contents) if len(c) >= threshold
    }
    assert {(r["frame_index"], r["content_len"]) for r in got} == want


def test_pushdown_disabled_fails_loudly(spark, tmp_path):
    """Spark's design: a pushFilters-implementing source with the conf
    off is an ERROR naming the conf, never a silent non-pushdown read.
    Our helpers set the conf, so only direct format() callers on a bare
    session can hit this."""
    p, _ = _planted_shard(tmp_path, corrupt_small=False)
    conf = "spark.sql.python.filterPushdown.enabled"
    old = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try:
        from mit_6_5840_mapreduce_with_go_spark.sources.zstfiles import (
            ZstDataSource,
        )

        spark.dataSource.register(ZstDataSource)
        with pytest.raises(Exception, match="filterPushdown"):
            spark.read.format("zstfile").load(str(p)).collect()
    finally:
        spark.conf.set(conf, old)


def test_file_equality_prunes_whole_shards(spark, tmp_path):
    """file = 'S' pushes down to PARTITION pruning: a corrupt sibling
    shard in the same glob is never opened, so the filtered read
    succeeds while the unfiltered read raises."""
    good_frames, good_contents = zip(
        *(M14._zstd_entropy_frame_and_content(d) for d in (3, 123))
    )
    (tmp_path / "a-good.zst").write_bytes(
        write_seekable_shard(list(good_frames), list(good_contents))
    )
    # the sibling is not even a valid zstd stream — ANY read of it raises
    (tmp_path / "b-corrupt.zst").write_bytes(b"\x00" * 64)
    glob = str(tmp_path / "*.zst")
    got = (
        read_zst_source(spark, glob)
        .where(F.col("file") == "a-good.zst")
        .select("frame_index", "content_len")
        .collect()
    )
    assert {r["frame_index"] for r in got} == {0, 1}
    with pytest.raises(Exception):
        read_zst_source(spark, glob).collect()
    # IN-list pruning takes the same path
    got_in = (
        read_zst_source(spark, glob)
        .where(F.col("file").isin("a-good.zst"))
        .count()
    )
    assert got_in == 2


def test_file_pruning_to_empty_is_a_result_not_an_error(spark, tmp_path):
    p, _ = _planted_shard(tmp_path, corrupt_small=False)
    got = (
        read_zst_source(spark, str(p))
        .where(F.col("file") == "no-such-shard.zst")
        .count()
    )
    assert got == 0


def test_composed_point_read_plan_and_rows(spark, sf_dir):
    """The registered point-read query: both conjuncts absorbed (no
    Filter operator), rows match the doubly-filtered census."""
    import re

    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal14 import (
        _POINT_SHARD,
        mm_zst_pushdown_stats,
        mm_zst_shard_pointread_stats,
    )

    df = mm_zst_shard_pointread_stats(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not [
        ln
        for ln in plan.splitlines()
        if re.match(r"^[\s+:*()\-\d]*Filter\b", ln)
    ], plan
    got = {(r["file"], r["frame_index"]) for r in df.collect()}
    want = {
        (r["file"], r["frame_index"])
        for r in mm_zst_pushdown_stats(spark, sf_dir).collect()
        if r["file"] == _POINT_SHARD
    }
    assert got == want and got


def test_frame_index_pushdown_corrupt_siblings_proof(spark, tmp_path):
    """frame_index =/IN/range constraints prune by the seek table's
    enumeration order BEFORE any frame byte is read: with every frame
    except index 1 corrupted, the index point read succeeds while any
    wider read raises."""
    frames, contents = zip(
        *(M14._zstd_entropy_frame_and_content(d) for d in (3, 123, 7))
    )
    frames = list(frames)
    for i in (0, 2):
        bad = bytearray(frames[i])
        bad[len(bad) // 2] ^= 0xFF
        frames[i] = bytes(bad)
    p = tmp_path / "shard.zst"
    p.write_bytes(write_seekable_shard(frames, list(contents)))
    got = (
        read_zst_source(spark, str(p))
        .where(F.col("frame_index") == 1)
        .select("frame_index", "content_len")
        .collect()
    )
    assert [(r["frame_index"], r["content_len"]) for r in got] == [
        (1, len(contents[1]))
    ]
    # IN-list takes the same path
    got_in = (
        read_zst_source(spark, str(p))
        .where(F.col("frame_index").isin(1))
        .count()
    )
    assert got_in == 1
    # a range that includes a corrupt frame must decode it and raise
    with pytest.raises(Exception):
        read_zst_source(spark, str(p)).where(
            F.col("frame_index") <= 1
        ).collect()
    # ...but the range that excludes them succeeds and no Filter node
    # remains over the scan
    import re

    df = read_zst_source(spark, str(p)).where(
        F.col("frame_index").between(1, 1)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not [
        ln
        for ln in plan.splitlines()
        if re.match(r"^[\s+:*()\-\d]*Filter\b", ln)
    ], plan
    assert df.count() == 1


def test_frame_index_fallback_without_seek_table(spark, tmp_path):
    """On a table-less shard the index constraint is honored exactly by
    walk-then-filter."""
    frames, contents = zip(
        *(M14._zstd_entropy_frame_and_content(d) for d in (3, 123, 7))
    )
    p = tmp_path / "plain.zst"
    p.write_bytes(b"".join(frames))
    got = (
        read_zst_source(spark, str(p))
        .where(F.col("frame_index") >= 1)
        .select("frame_index", "content_len")
        .collect()
    )
    assert {(r["frame_index"], r["content_len"]) for r in got} == {
        (i, len(c)) for i, c in enumerate(contents) if i >= 1
    }


def test_frame_pointread_query_plan_and_rows(spark, sf_dir):
    """The registered (file, frame_index) point read: both conjuncts
    absorbed, rows match the index band applied to the full census."""
    import re

    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal14 import (
        _FRAME_HI,
        _FRAME_LO,
        _FRAME_SHARD,
        mm_zst_frame_pointread_stats,
        mm_zst_source_stats,
    )

    df = mm_zst_frame_pointread_stats(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not [
        ln
        for ln in plan.splitlines()
        if re.match(r"^[\s+:*()\-\d]*Filter\b", ln)
    ], plan
    got = {(r["file"], r["frame_index"]) for r in df.collect()}
    want = {
        (r["file"], r["frame_index"])
        for r in mm_zst_source_stats(spark, sf_dir).collect()
        if r["file"] == _FRAME_SHARD
        and _FRAME_LO <= r["frame_index"] <= _FRAME_HI
    }
    assert got == want and got


def test_between_pointread_query_plan_and_rows(spark, sf_dir):
    """The registered BETWEEN point read: file equality AND both band
    bounds absorbed (no Filter operator), rows match the band applied
    to the full census."""
    import re

    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal14 import (
        _BETWEEN_HI,
        _BETWEEN_LO,
        _BETWEEN_SHARD,
        mm_zst_between_pointread_stats,
        mm_zst_source_stats,
    )

    df = mm_zst_between_pointread_stats(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not [
        ln
        for ln in plan.splitlines()
        if re.match(r"^[\s+:*()\-\d]*Filter\b", ln)
    ], plan
    got = {(r["file"], r["frame_index"], r["content_len"]) for r in df.collect()}
    want = {
        (r["file"], r["frame_index"], r["content_len"])
        for r in mm_zst_source_stats(spark, sf_dir).collect()
        if r["file"] == _BETWEEN_SHARD
        and _BETWEEN_LO <= r["content_len"] <= _BETWEEN_HI
    }
    assert got == want and got
