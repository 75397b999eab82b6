"""GIF codec: real LZW (growth, CLEAR, KwKwK), sub-block walking,
4-pass deinterlacing, palette mapping, malformed-stream rejection."""

from __future__ import annotations

import struct

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import multimodal6 as M


def _pay(d, interlace=None):
    w, h = 8 * (2 + d % 3), 8 * (1 + d % 4)
    return M.encode_gif(
        w,
        h,
        [M._gif_palette(d, i) for i in range(16)],
        lambda x, y: M._gif_index(d, x, y),
        interlace=(d % 2 == 1) if interlace is None else interlace,
    )


def _ref(d):
    w, h = 8 * (2 + d % 3), 8 * (1 + d % 4)
    sr = sg = sb = wr = wi = 0
    for p in range(w * h):
        x, y = p % w, p // w
        idx = M._gif_index(d, x, y)
        r, g, b = M._gif_palette(d, idx)
        sr += r
        sg += g
        sb += b
        wr += r * p
        wi += idx * p
    return (sr, sg, sb, wr, wi)


@pytest.mark.parametrize("d", [0, 1, 2, 3, 10, 77])
def test_gif_roundtrip(d):
    o = M.decode_gif(_pay(d))
    assert (o["sum_r"], o["sum_g"], o["sum_b"], o["wsum_r"], o["wsum_idx"]) == _ref(d)


def test_gif_interlace_changes_storage_not_pixels():
    # plain and interlaced encodings of the same image decode to the
    # SAME raster (incl. position-weighted checksums) despite different
    # on-disk row order — the deinterlace correctness statement
    a = M.decode_gif(_pay(3, interlace=False))
    b = M.decode_gif(_pay(3, interlace=True))
    a.pop("interlaced")
    b.pop("interlaced")
    assert a == b


def test_gif_interlaced_row_order_spec():
    # spec appendix E example: height 10
    assert M._interlaced_row_order(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]


def test_gif_lzw_growth_and_clear():
    # rich 64x64 content forces code-width escalation; a tiny repeated
    # pattern exercises long prefix chains (KwKwK arises naturally)
    o = M.decode_gif(
        M.encode_gif(
            64,
            64,
            [(i * 16, i * 8, i * 4) for i in range(16)],
            lambda x, y: (x * x + y * 3 + x * y) % 16,
        )
    )
    assert o["n_px"] == 4096
    o2 = M.decode_gif(
        M.encode_gif(32, 32, [(0, 0, 0), (255, 255, 255)], lambda x, y: 0)
    )
    assert o2["sum_r"] == 0 and o2["n_px"] == 1024


def _descriptor_offset(pay: bytes) -> int:
    # header (13) + global color table (3 * 2^(n+1)); a byte-value
    # search would false-match 0x2C inside the palette
    return 13 + 3 * (2 << (pay[10] & 0x07))


def test_gif_extension_blocks_are_skipped():
    pay = _pay(4)
    # splice a GCE extension (0x21 0xF9, 4-byte block, terminator)
    # between the color table and the image descriptor
    at = _descriptor_offset(pay)
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = pay[:at] + ext + pay[at:]
    assert M.decode_gif(patched) == M.decode_gif(pay)


def test_gif_rejects_malformed():
    pay = _pay(6)
    with pytest.raises(ValueError, match="signature"):
        M.decode_gif(b"BMP" + pay[3:])
    with pytest.raises(ValueError, match="truncated|terminator|exhausted"):
        M.decode_gif(pay[:-20])
    # local color table flag → rejected
    at = _descriptor_offset(pay)
    bad = bytearray(pay)
    bad[at + 9] |= 0x80
    with pytest.raises(ValueError, match="local color"):
        M.decode_gif(bytes(bad))
    # sub-rectangle frame → rejected
    bad = bytearray(pay)
    struct.pack_into("<H", bad, at + 1, 2)  # left = 2
    with pytest.raises(ValueError, match="sub-rectangle"):
        M.decode_gif(bytes(bad))


def test_decode_gif_stats_consistency(spark):
    rows = M.mm_decode_gif_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:15]:
        d = r["doc_id"]
        assert (r["sum_r"], r["sum_g"], r["sum_b"], r["wsum_r"], r["wsum_idx"]) == _ref(d)
        assert r["interlaced"] == (d % 2 == 1)


# --------------------------------------------------------------------------
# round 7: animated GIF (GCE delays + multiple image descriptors)
# --------------------------------------------------------------------------


def test_gif_animation_roundtrip():
    pal = [((p * 37) % 256, (p * 11) % 256, (p * 5) % 256) for p in range(8)]
    frames = [lambda x, y, f=f: (x + y + f) % 8 for f in range(4)]
    pay = M.encode_gif_animation(6, 5, pal, frames, [10, 20, 30, 40], loop=2)
    out = M.decode_gif_frames(pay)
    assert out["n_frames"] == 4
    assert out["delays_cs"] == [10, 20, 30, 40]
    assert out["duration_cs"] == 100
    assert out["sum_r_frames"] == [
        sum(pal[(x + y + f) % 8][0] for y in range(5) for x in range(6))
        for f in range(4)
    ]


def test_gif_animation_walks_single_frame_files_too():
    pal = [((p * 3) % 256, 0, 0) for p in range(4)]
    single = M.encode_gif(5, 4, pal, lambda x, y: (x + y) % 4)
    out = M.decode_gif_frames(single)
    assert out["n_frames"] == 1
    assert out["delays_cs"] == [-1]  # no GCE in the single-frame writer


def test_gif_animation_rejects_malformed():
    pal = [(1, 2, 3), (4, 5, 6)]
    good = M.encode_gif_animation(4, 3, pal, [lambda x, y: (x + y) % 2], [7])
    with pytest.raises(ValueError, match="missing trailer|truncated"):
        M.decode_gif_frames(good[:-1])
    with pytest.raises(ValueError, match="malformed GCE"):
        bad = bytearray(good)
        i = bad.find(b"\x21\xf9\x04")
        bad[i + 2] = 5  # wrong GCE block size
        M.decode_gif_frames(bytes(bad))
    with pytest.raises(ValueError, match="frames and delays"):
        M.encode_gif_animation(4, 3, pal, [lambda x, y: 0], [1, 2])
