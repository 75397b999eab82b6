"""Zstd frame walk (multimodal13): RFC 8878 framing subset — raw/RLE
blocks, skippable frames, FHD field parsing — plus totality."""

from __future__ import annotations

import struct

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import multimodal13 as M


def test_roundtrip_raw_rle_skippable():
    blocks = [("raw", b"hello"), ("rle", b"zzzz"), ("raw", b"!")]
    pay = M.encode_zstd_raw(
        blocks, window_log=20, dict_id=300, skippable_prefix=b"IDX0"
    )
    m = M.decode_zstd_frames(pay)
    assert m["content"] == b"hellozzzz!"
    f = m["frames"][0]
    assert f["n_blocks"] == 3
    assert f["window_log"] == 20
    assert f["dict_id"] == 300
    assert f["fcs"] == 10 and f["content_len"] == 10
    assert m["n_skippable"] == 1 and m["skippable_bytes"] == 4
    # two standard frames concatenate
    m2 = M.decode_zstd_frames(pay + M.encode_zstd_raw([("raw", b"AB")]))
    assert m2["content"].endswith(b"AB") and m2["n_frames"] == 2


def test_rejections():
    good = M.encode_zstd_raw([("raw", b"x")])
    with pytest.raises(ValueError, match="bad zstd magic"):
        M.decode_zstd_frames(b"\x00\x00\x00\x00" + good[4:])
    # FCS mismatch
    bad = bytearray(good)
    # FCS is the 4 bytes before the block header (magic4+fhd1+wd1 -> 6..10)
    struct.pack_into("<I", bad, 6, 999)
    with pytest.raises(ValueError, match="FCS declared"):
        M.decode_zstd_frames(bytes(bad))
    # compressed block type now DECODES (round 10 entropy layer);
    # a garbage body must still be rejected, not crash
    bh = (1 | (2 << 1) | (5 << 3)).to_bytes(3, "little")
    frame = good[:10] + bh + b"12345"
    with pytest.raises(ValueError):
        M.decode_zstd_frames(frame)
    # reserved FHD bit
    bad = bytearray(good)
    bad[4] |= 0x08
    with pytest.raises(ValueError, match="reserved FHD"):
        M.decode_zstd_frames(bytes(bad))
    with pytest.raises(ValueError, match="rle block payload"):
        M.encode_zstd_raw([("rle", b"ab")])


def test_payload_formulas():
    for doc_id in (0, 1, 2, 3, 7, 499):
        m = M.decode_zstd_frames(M._zstd_payload(doc_id))
        nb = 2 + doc_id % 3
        f = m["frames"][0]
        assert f["n_blocks"] == nb
        assert f["window_log"] == 10 + doc_id % 22
        want = bytearray()
        for b in range(nb):
            if b % 2 == 0:
                ln = 5 + (doc_id + b) % 9
                want += bytes((doc_id + b + j) % 256 for j in range(ln))
            else:
                ln = 3 + (doc_id + b) % 6
                want += bytes([(doc_id * 3 + b) % 256]) * ln
        assert m["content"] == bytes(want)
        assert m["n_skippable"] == (1 if doc_id % 2 else 0)


def test_totality_truncations_and_flips():
    pay = M._zstd_payload(9)
    M.decode_zstd_frames(pay)
    for ln in range(len(pay)):
        try:
            M.decode_zstd_frames(pay[:ln])
        except ValueError:
            pass
    for pos in range(len(pay)):
        for flip in (0x01, 0x80, 0xFF):
            mut = bytearray(pay)
            mut[pos] ^= flip
            try:
                M.decode_zstd_frames(bytes(mut))
            except ValueError:
                pass


def test_no_fcs_rle_bomb_bounded():
    """ADVICE r10: a frame that declares NO content size must still be
    output-bounded — a handful of max-size RLE blocks (each under the
    per-block cap) would otherwise accumulate gigabytes from a ~140-byte
    input.  The cumulative no-FCS cap raises fast instead."""
    import time

    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal14 import (
        _BLOCK_OUT_CAP,
    )

    frame = bytearray(struct.pack("<I", 0xFD2FB528))
    frame += bytes([0x00])  # FHD: no FCS, no dict, not single-segment
    frame += bytes([(27 - 10) << 3])  # window descriptor: 128 MiB window
    bsize = (1 << 21) - 1  # max 21-bit block size
    nblocks = _BLOCK_OUT_CAP // bsize + 2
    for k in range(nblocks):
        bh = (1 if k == nblocks - 1 else 0) | (1 << 1) | (bsize << 3)
        frame += bh.to_bytes(3, "little") + b"A"
    t0 = time.time()
    with pytest.raises(ValueError, match="exceeds no-FCS cap"):
        M.decode_zstd_frames(bytes(frame))
    assert time.time() - t0 < 10.0  # bounded allocation, not a 2 GB window


def test_no_fcs_frame_under_cap_decodes():
    """The no-FCS cap must not reject legitimate FCS-less frames."""
    pay = M.encode_zstd_raw(
        [("raw", b"abc" * 100), ("rle", b"q" * 4096)], with_fcs=False
    )
    m = M.decode_zstd_frames(pay)
    assert m["frames"][0]["fcs"] is None
    assert m["content"] == b"abc" * 100 + b"q" * 4096


def test_fcs_cap_rejects_mid_frame_overrun():
    """A frame whose blocks exceed the DECLARED FCS fails at the first
    offending block boundary (not only at the end-of-frame check)."""
    good = M.encode_zstd_raw([("raw", b"xy"), ("raw", b"z")])
    bad = bytearray(good)
    struct.pack_into("<I", bad, 6, 1)  # declare FCS=1, frame emits 3
    with pytest.raises(ValueError, match="exceeds declared FCS"):
        M.decode_zstd_frames(bytes(bad))
