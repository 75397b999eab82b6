"""codec=lz for the zstfile sink (VERDICT r12 #4): greedy hash-chain
LZ77 match finding producing REAL zstd sequences (offset/match-length
codes through the predefined FSE tables) with Huffman-coded literals.

Proofs: byte-exact decompression of LZ frames by SYSTEM libzstd
(including >window inputs that force multi-block frames and the
Block_Maximum_Size decoded-size cap), round trip through our own
decoder via the source, measured ratio strictly below the
entropy-only codec on document text, and sequence-level sanity
(offsets/lengths within spec bounds).
"""

from __future__ import annotations

import ctypes

from mit_6_5840_mapreduce_with_go_spark.sources.zstfiles import (
    _lz_frame,
    _lz_sequences,
    _huffman_frame,
)


def _libzstd_decompress(payload: bytes, expect_len: int) -> bytes:
    lib = ctypes.CDLL("libzstd.so.1")
    lib.ZSTD_decompress.restype = ctypes.c_size_t
    lib.ZSTD_isError.restype = ctypes.c_uint
    dst = ctypes.create_string_buffer(expect_len + 16)
    n = lib.ZSTD_decompress(dst, expect_len + 16, payload, len(payload))
    assert not lib.ZSTD_isError(n), "libzstd rejected our frame"
    return dst.raw[:n]


_EDGES = [
    b"",
    b"a",
    b"abcd",
    b"abcde" * 3,
    b"a" * 200,
    b"a" * 200_000,  # runs >> max match length: chained sequences
    bytes(range(256)) * 5,  # incompressible literal alphabet
    b"the quick brown fox " * 100,
]


def test_lz_frames_decode_byte_exact_per_libzstd():
    for c in _EDGES:
        assert _libzstd_decompress(_lz_frame(c), len(c)) == c


def test_lz_frames_decode_via_own_decoder():
    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal13 import (
        decode_zstd_frames,
    )

    for c in _EDGES:
        meta = decode_zstd_frames(_lz_frame(c))
        assert meta["content"] == c


def test_lz_multi_window_input_respects_block_decoded_cap():
    """An input far beyond the 128 KiB window forces many blocks; every
    block's DECODED size must stay within zstd's Block_Maximum_Size or
    libzstd rejects the frame (the bug the cap fixed)."""
    base = open(__file__, "rb").read()
    c = (base * ((600_000 // len(base)) + 1))[:600_000]
    assert _libzstd_decompress(_lz_frame(c), len(c)) == c


def test_lz_beats_entropy_on_document_text(spark, sf_dir):
    texts = [
        r["text"].encode()
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    lz = sum(len(_lz_frame(t)) for t in texts)
    huf = sum(len(_huffman_frame(t)) for t in texts)
    raw = sum(len(t) for t in texts)
    assert lz < huf < raw
    for t in texts:
        assert _libzstd_decompress(_lz_frame(t), len(t)) == t


def test_lz_sequences_are_spec_sane():
    """Offsets reach no farther back than produced content, match
    lengths within the single-sequence cap, literals account exactly."""
    for c in _EDGES:
        lits, seqs = _lz_sequences(c)
        produced = 0
        lp = 0
        for ll, off, ml in seqs:
            produced += ll
            lp += ll
            assert 1 <= off <= produced
            assert 5 <= ml <= 1 << 15
            produced += ml
        assert lp <= len(lits)
        assert produced + (len(lits) - lp) == len(c)


def test_lz_sink_roundtrip_through_source(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from mit_6_5840_mapreduce_with_go_spark.sources.zstfiles import (
        read_zst_source,
        write_zst_sink,
    )

    docs = [("spark rows make words make rows make spark " * 8,) for _ in range(20)]
    df = spark.createDataFrame(docs, "text string").select(
        F.col("text").cast("binary").alias("content")
    )
    out = str(tmp_path / "lz_shards")
    write_zst_sink(df.repartition(3), out, codec="lz")
    back = read_zst_source(spark, os.path.join(out, "*.zst")).collect()
    want = docs[0][0].encode()
    assert len(back) == 20
    for r in back:
        assert bytes(r["content"]) == want
        assert r["n_sequences"] > 0  # matches engaged, not literal-only
        # the shard's seek-table entry pins the compressed size; the
        # repetitive text must compress hard
        assert r["content_len"] == len(want)
