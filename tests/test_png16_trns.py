"""Round-8 PNG additions: 16-bit truecolor/gray/alpha decode (2-byte
sample filter geometry + high-byte rescale) and palette tRNS (RGBA
expansion with the short-chunk opaque default)."""

from __future__ import annotations

import struct
import zlib

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import multimodal2 as M


def _pix(x: int, y: int, c: int) -> int:
    return (x * 7 + y * 19 + c * 11) % 256


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_png16_roundtrip(channels, interlace):
    for w, h in ((1, 1), (7, 11), (16, 5)):
        pay = M.encode_png16(w, h, _pix, channels=channels, interlace=interlace)
        W, H, C, r = M.decode_png_pixels(pay)
        want = bytes(
            _pix(x, y, c)
            for y in range(h)
            for x in range(w)
            for c in range(channels)
        )
        assert (W, H, C) == (w, h, channels)
        assert r == want  # high byte of v*257 is exactly v


def test_png16_wrong_bpp_would_scramble():
    """The 16-bit filter geometry is real: interpreting the stream with
    an 8-bit stride must NOT reproduce the raster (guards against a
    decoder that ignores depth).  We verify by checking the encoded
    IDAT genuinely uses non-None filters over 2-byte samples."""
    pay = M.encode_png16(6, 8, _pix, channels=3)
    # stride = 6*3*2 = 36; row 1 uses filter 1 (Sub with bpp=6)
    # find IDAT
    i = len(M._PNG_SIG)
    raw = None
    while i < len(pay):
        (length,) = struct.unpack(">I", pay[i : i + 4])
        tag = pay[i + 4 : i + 8]
        if tag == b"IDAT":
            raw = zlib.decompress(pay[i + 8 : i + 8 + length])
            break
        i += 12 + length
    assert raw is not None
    stride = 36
    filters = [raw[y * (stride + 1)] for y in range(8)]
    assert filters == [0, 1, 2, 3, 4, 0, 1, 2]  # every filter exercised


def test_palette_trns_roundtrip_all_depths():
    pal = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]
    alph = [0, 128, 255]  # shorter than the palette: idx 3 -> 255
    for depth in (1, 2, 4, 8):
        k = min(len(pal), 1 << depth)
        p2, a2 = pal[:k], alph[: min(len(alph), k)]
        idx = lambda x, y: (x + y) % k  # noqa: E731
        for il in (False, True):
            pay = M.encode_png_palette(
                9, 6, p2, idx, depth=depth, interlace=il, trns=a2
            )
            W, H, C, r = M.decode_png_pixels(pay)
            assert C == 4
            want = bytearray()
            for y in range(6):
                for x in range(9):
                    i = idx(x, y)
                    want += bytes(p2[i]) + bytes(
                        [a2[i] if i < len(a2) else 255]
                    )
            assert r == bytes(want), (depth, il)


def test_trns_rules():
    pal = [(1, 2, 3), (4, 5, 6)]
    # tRNS longer than palette (encoder)
    with pytest.raises(ValueError, match="tRNS longer"):
        M.encode_png_palette(2, 2, pal, lambda x, y: 0, trns=[0, 1, 2])
    # tRNS forbidden for alpha color types (decoder)
    pay = bytearray(M.encode_png(4, 4, _pix, channels=4))
    # splice a tRNS chunk right before IDAT
    i = len(M._PNG_SIG)
    while True:
        (length,) = struct.unpack(">I", bytes(pay[i : i + 4]))
        tag = bytes(pay[i + 4 : i + 8])
        if tag == b"IDAT":
            break
        i += 12 + length
    spliced = bytes(pay[:i]) + M._chunk(b"tRNS", b"\x00") + bytes(pay[i:])
    with pytest.raises(ValueError, match="tRNS forbidden"):
        M.decode_png_pixels(spliced)
    # tRNS with more entries than the palette (decoder)
    good = M.encode_png_palette(3, 3, pal, lambda x, y: 0, trns=[9])
    # hand-grow the tRNS chunk beyond palette size
    i = len(M._PNG_SIG)
    out = bytearray(M._PNG_SIG)
    while i < len(good):
        (length,) = struct.unpack(">I", good[i : i + 4])
        tag = good[i + 4 : i + 8]
        data = good[i + 8 : i + 8 + length]
        if tag == b"tRNS":
            data = b"\x09\x08\x07"
        out += M._chunk(bytes(tag), bytes(data)) if tag != b"IHDR" else good[
            i : i + 12 + length
        ]
        i += 12 + length
    with pytest.raises(ValueError, match="more than"):
        M.decode_png_pixels(bytes(out))


def test_png16_query_payload_variants():
    """Both document parities of the query payload decode to the
    planted statistics."""
    for doc_id in (0, 1, 6, 7, 499):
        w_, h_, ch, recon = M.decode_png_pixels(M._png16_payload(doc_id))
        if doc_id % 2 == 0:
            assert ch == 3
            assert (w_, h_) == (5 + doc_id % 6, 4 + doc_id % 5)
            want = sum(
                M._pix(doc_id, x, y, c)
                for y in range(h_)
                for x in range(w_)
                for c in range(3)
            )
            assert sum(recon) == want
        else:
            assert ch == 4
            alphas = recon[3::4]
            want_a = sum(
                (40 * i if (i := (x + 2 * y + doc_id) % 8) < 5 else 255)
                for y in range(h_)
                for x in range(w_)
            )
            assert sum(alphas) == want_a
