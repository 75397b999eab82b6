"""PNG codec: real decode (CRC walk + inflate + unfilter) round-trips
the spec-valid encoder, rejects malformed payloads, and the end-to-end
query's stats match the pixel definition."""

from __future__ import annotations

import struct
import zlib

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import multimodal2 as M


def _checker(x: int, y: int, c: int) -> int:
    return (x * 37 + y * 101 + c * 13) % 256


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("dims", [(1, 1), (3, 2), (7, 11), (16, 5)])
def test_png_roundtrip(channels, dims):
    w, h = dims
    payload = M.encode_png(w, h, _checker, channels=channels)
    out = M.decode_png(payload)
    want = [
        _checker(x, y, c) for y in range(h) for x in range(w) for c in range(channels)
    ]
    assert out["width"] == w and out["height"] == h
    assert out["channels"] == channels
    assert out["n_px"] == len(want)
    assert out["sum_px"] == sum(want)
    assert out["min_px"] == min(want)
    assert out["max_px"] == max(want)


def test_png_every_filter_type_inverts():
    # 5 rows → encoder uses filter types 0,1,2,3,4 exactly once each;
    # a broken inverse for ANY filter corrupts the stats.
    payload = M.encode_png(8, 5, _checker, channels=3)
    out = M.decode_png(payload)
    want = [_checker(x, y, c) for y in range(5) for x in range(8) for c in range(3)]
    assert out["sum_px"] == sum(want)


def test_png_paeth_matches_spec():
    assert M._paeth(1, 1, 1) == 1
    assert M._paeth(0, 255, 255) == 0  # p=0, pa=0 → left
    assert M._paeth(10, 20, 0) == 20  # p=30, pa=20, pb=10 → up
    assert M._paeth(5, 9, 7) == 7  # p=7, pc=0 smallest → up-left
    # left wins the pa==pb tie (only reachable with a == b)
    assert M._paeth(6, 6, 200) == 6


def test_png_rejects_garbage():
    good = M.encode_png(4, 4, _checker)
    with pytest.raises(ValueError, match="signature"):
        M.decode_png(b"GIF89a" + good)
    with pytest.raises(ValueError, match="CRC"):
        bad = bytearray(good)
        bad[20] ^= 0xFF  # flip a byte inside IHDR data
        M.decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        M.decode_png(good[:-8])
    with pytest.raises(ValueError, match="bit depth"):
        # 12 is not a legal depth for any color type (16 IS supported
        # since round 8 — see test_png16_trns.py)
        ihdr = struct.pack(">IIBBBBB", 2, 2, 12, 2, 0, 0, 0)
        M.decode_png(
            M._PNG_SIG + M._chunk(b"IHDR", ihdr) + M._chunk(b"IEND", b"")
        )
    # Adam7 (interlace=1) is SUPPORTED since round 6; method 2 is not
    with pytest.raises(ValueError, match="interlace method"):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 2)
        M.decode_png(
            M._PNG_SIG + M._chunk(b"IHDR", ihdr) + M._chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="color type"):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)  # palette
        M.decode_png(
            M._PNG_SIG + M._chunk(b"IHDR", ihdr) + M._chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="expected"):
        # valid chunks but raster short one row
        raw = b"\x00" + b"\x01" * 6  # 1 row of 2x? mismatch vs h=2
        png = (
            M._PNG_SIG
            + M._chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
            + M._chunk(b"IDAT", zlib.compress(raw))
            + M._chunk(b"IEND", b"")
        )
        M.decode_png(png)


def test_png_crc_valid_corrupt_idat_is_valueerror():
    """A PNG whose chunk CRCs are all correct but whose IDAT bytes are
    not a DEFLATE stream must raise ValueError, not leak zlib.error
    (the byte-flip fuzzer can't reach this path — a flip always breaks
    the chunk CRC first)."""
    png = (
        M._PNG_SIG
        + M._chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + M._chunk(b"IDAT", b"\xde\xad\xbe\xef not deflate")
        + M._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="DEFLATE"):
        M.decode_png(png)
    # truncated-but-CRC-valid stream: compress then cut, re-chunk
    raw = b"\x00" + b"\x01" * 6 + b"\x00" + b"\x02" * 6
    cut = zlib.compress(raw)[:-4]
    png = (
        M._PNG_SIG
        + M._chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + M._chunk(b"IDAT", cut)
        + M._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        M.decode_png(png)


def test_png_multiple_idat_chunks():
    # IDAT data may be split arbitrarily across chunks (spec §11.2.4)
    good = M.encode_png(6, 6, _checker)
    # rebuild with the IDAT split in two
    i = len(M._PNG_SIG)
    chunks = []
    while i < len(good):
        (length,) = struct.unpack(">I", good[i : i + 4])
        tag = good[i + 4 : i + 8]
        data = good[i + 8 : i + 8 + length]
        chunks.append((tag, data))
        i += 12 + length
    rebuilt = M._PNG_SIG
    for tag, data in chunks:
        if tag == b"IDAT" and len(data) > 1:
            rebuilt += M._chunk(b"IDAT", data[: len(data) // 2])
            rebuilt += M._chunk(b"IDAT", data[len(data) // 2 :])
        else:
            rebuilt += M._chunk(tag, data)
    assert M.decode_png(rebuilt) == M.decode_png(good)


def test_decode_png_stats_consistency(spark):
    rows = M.mm_decode_png_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:20]:
        d = r["doc_id"]
        w, h = 5 + d % 6, 4 + d % 5
        want = [
            M._pix(d, x, y, c) for y in range(h) for x in range(w) for c in range(3)
        ]
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_px"] == len(want)
        assert r["sum_px"] == sum(want)


def test_png_adam7_interlace_roundtrip():
    """Adam7 (round 6): the 7-pass interlaced framing decodes to the
    SAME raster as sequential for every geometry class — including
    images small enough that some passes are empty (an empty pass
    contributes no rows, not even filter bytes) — and the per-pass
    independent filtering is inverted correctly."""

    def px(x, y, c):
        return (x * 5 + y * 31 + c * 11) % 256

    for (w, h) in [(1, 1), (3, 2), (7, 5), (8, 8), (13, 11), (40, 24)]:
        for ch in (1, 3, 4):
            plain = M.decode_png_pixels(M.encode_png(w, h, px, channels=ch))
            inter = M.decode_png_pixels(
                M.encode_png(w, h, px, channels=ch, interlace=True)
            )
            assert plain == inter, (w, h, ch)
    # ground truth, not just self-consistency
    w, h, ch = 13, 11, 3
    _, _, _, recon = M.decode_png_pixels(
        M.encode_png(w, h, px, channels=ch, interlace=True)
    )
    want = bytes(
        px(x, y, c) & 0xFF for y in range(h) for x in range(w) for c in range(ch)
    )
    assert recon == want
    # truncated interlaced raster rejected with the pass-aware size
    pay = bytearray(M.encode_png(16, 16, px, interlace=True))
    import struct as _st
    import zlib as _zl

    i = pay.find(b"IDAT") - 4
    (ln,) = _st.unpack(">I", pay[i : i + 4])
    raw = _zl.decompress(bytes(pay[i + 8 : i + 8 + ln]))
    bad = _zl.compress(raw[:-3])
    rebuilt = (
        bytes(pay[:i])
        + _st.pack(">I", len(bad))
        + b"IDAT"
        + bad
        + _st.pack(">I", _zl.crc32(b"IDAT" + bad) & 0xFFFFFFFF)
        + bytes(pay[i + 12 + ln :])
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="interlaced raster"):
        M.decode_png_pixels(rebuilt)


# --------------------------------------------------------------------------
# round 7: palette (color type 3) at packed bit depths
# --------------------------------------------------------------------------


def test_png_palette_roundtrip_all_depths_and_interlace():
    for depth in (1, 2, 4, 8):
        npal = 1 << depth
        pal = [((p * 37) % 256, (p * 59 + 3) % 256, (p * 29 + 7) % 256)
               for p in range(npal)]
        for interlace in (False, True):
            for w, h in ((5, 4), (16, 11), (1, 1), (8, 8)):
                idx = lambda x, y: (x + y * 3) % npal  # noqa: E731
                pay = M.encode_png_palette(
                    w, h, pal, idx, depth=depth, interlace=interlace
                )
                gw, gh, ch, recon = M.decode_png_pixels(pay)
                assert (gw, gh, ch) == (w, h, 3)
                want = bytes(
                    b for y in range(h) for x in range(w) for b in pal[idx(x, y)]
                )
                assert recon == want, (depth, interlace, w, h)


def test_png_palette_rejects_malformed():
    pal = [(1, 2, 3), (4, 5, 6)]
    good = M.encode_png_palette(4, 3, pal, lambda x, y: (x + y) % 2, depth=1)
    with pytest.raises(ValueError, match="without a PLTE"):
        # strip the PLTE chunk (starts after IHDR: sig 8 + ihdr 25)
        plte_at = good.find(b"PLTE") - 4
        plte_len = 12 + 6
        M.decode_png_pixels(good[:plte_at] + good[plte_at + plte_len:])
    with pytest.raises(ValueError, match="multiple of 3"):
        import struct as st
        import zlib as zl
        bad_plte = st.pack(">I", 4) + b"PLTE" + b"\x01\x02\x03\x04"
        bad_plte += st.pack(">I", zl.crc32(b"PLTE" + b"\x01\x02\x03\x04") & 0xFFFFFFFF)
        plte_at = good.find(b"PLTE") - 4
        M.decode_png_pixels(good[:plte_at] + bad_plte + good[plte_at + 18:])
    with pytest.raises(ValueError, match="palette size"):
        # 3 entries at depth 1 (max 2)
        M.encode_png_palette(4, 3, pal + [(7, 8, 9)], lambda x, y: 0, depth=1)
    with pytest.raises(ValueError, match="palette bit depth"):
        import struct as st
        import zlib as zl
        # rewrite IHDR with depth 16 for color type 3
        ihdr = st.pack(">IIBBBBB", 4, 3, 16, 3, 0, 0, 0)
        chunk = st.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        chunk += st.pack(">I", zl.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        M.decode_png_pixels(good[:8] + chunk + good[8 + 25:])


def test_png_palette_query_consistency(spark):
    rows = M.mm_decode_png_palette_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:50]:
        d = r["doc_id"]
        depth = (1, 2, 4, 8)[d % 4]
        npal = 1 << depth
        w, h = 5 + d % 6, 4 + d % 5
        assert (r["depth"], r["width"], r["height"]) == (depth, w, h)
        want_r = sum(
            M._pal_entry(d, (d + x + y * 3) % npal)[0]
            for y in range(h) for x in range(w)
        )
        assert r["sum_r"] == want_r
