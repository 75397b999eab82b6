"""Baseline JPEG codec: real entropy decode (Huffman + DC prediction +
dequantize + IDCT) round-trips DC-exact payloads, bounds AC error at
quant=1, and rejects malformed / out-of-surface streams."""

from __future__ import annotations

import struct

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import multimodal3 as M


def test_canonical_huffman_tables_invert():
    enc = M._canonical_codes(M._DC_BITS, M._DC_VALS)
    dec = M._decode_map(M._DC_BITS, M._DC_VALS)
    for sym, (code, length) in enc.items():
        assert dec[(length, code)] == sym
    # AC table is the full Annex-K one: 162 symbols, all invertible
    enc = M._canonical_codes(M._AC_BITS, M._AC_VALS)
    dec = M._decode_map(M._AC_BITS, M._AC_VALS)
    assert len(enc) == 162
    for sym, (code, length) in enc.items():
        assert dec[(length, code)] == sym


def test_extend_sign_recovery():
    # T.81 table F.1: category 3 holds -7..-4 and 4..7
    assert M._extend(0b100, 3) == 4
    assert M._extend(0b111, 3) == 7
    assert M._extend(0b000, 3) == -7
    assert M._extend(0b011, 3) == -4


@pytest.mark.parametrize("dims", [(8, 8), (16, 8), (24, 16), (32, 24)])
def test_jpeg_dc_exact_roundtrip(dims):
    w, h = dims

    def blockval(x, y):
        return (x // 8 * 61 + y // 8 * 149 + 3) % 256

    out = M.decode_jpeg_gray(M.encode_jpeg_gray(w, h, blockval))
    want = [blockval(x, y) for y in range(h) for x in range(w)]
    assert (out["width"], out["height"]) == (w, h)
    assert out["n_px"] == len(want)
    assert out["sum_px"] == sum(want)
    assert out["min_px"] == min(want)
    assert out["max_px"] == max(want)


def test_jpeg_ac_content_bounded_error():
    # non-constant blocks exercise the AC run/size path + ZRL/EOB; with
    # an all-ones quant table the FDCT->IDCT round trip is within one
    # gray level per pixel on average
    def tex(x, y):
        return (x * x * 3 + y * 7 + x * y) % 256

    out = M.decode_jpeg_gray(M.encode_jpeg_gray(16, 16, tex))
    want = [tex(x, y) for y in range(16) for x in range(16)]
    assert abs(out["sum_px"] - sum(want)) <= len(want)
    assert abs(out["min_px"] - min(want)) <= 2
    assert abs(out["max_px"] - max(want)) <= 2


def test_jpeg_dc_prediction_spans_blocks():
    # strongly varying DC across many blocks: every diff category code
    # path in the DC table gets used (values swing the full range)
    def blockval(x, y):
        return (x // 8 * 255) % 256 if (y // 8) % 2 == 0 else 0

    w, h = 64, 16
    out = M.decode_jpeg_gray(M.encode_jpeg_gray(w, h, blockval))
    want = [blockval(x, y) for y in range(h) for x in range(w)]
    assert out["sum_px"] == sum(want)


def test_jpeg_rejects_malformed():
    good = M.encode_jpeg_gray(16, 16, lambda x, y: 128)
    with pytest.raises(ValueError, match="SOI"):
        M.decode_jpeg_gray(b"\x00\x00" + good)
    with pytest.raises(ValueError, match="EOI"):
        M.decode_jpeg_gray(good[:-2])
    with pytest.raises(ValueError, match="dimensions divisible"):
        M.encode_jpeg_gray(12, 8, lambda x, y: 0)
    # progressive SOF2 is rejected, not mis-decoded
    sof2 = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="non-baseline"):
        M.decode_jpeg_gray(sof2)
    # DRI declaring an interval the scan does not honor: the decoder
    # expects an RST marker mid-entropy-data and fails loudly
    dri = (
        good[:2]
        + struct.pack(">HHH", 0xFFDD, 4, 1)
        + good[2:]
    )
    with pytest.raises(ValueError, match="restart marker"):
        M.decode_jpeg_gray(dri)


def test_jpeg_restart_interval_roundtrip():
    """DRI/RST0-7 (T.81 E.2.4): restart markers are lossless framing —
    decoding a restarted stream must reproduce the unrestarted pixels
    exactly, through byte-aligned marker consumption, per-interval DC
    predictor reset, and the cyclic 3-bit marker index (interval 1 over
    15 MCUs wraps past RST7)."""

    def px(x, y):
        return (x * 7 + y * 13 + (x // 8) * 31 + (y // 8) * 57) % 256

    base = M.decode_jpeg_gray(M.encode_jpeg_gray(40, 24, px))  # 15 MCUs
    for ri in (1, 2, 3, 7, 100):
        pay = M.encode_jpeg_gray(40, 24, px, restart_interval=ri)
        assert M.decode_jpeg_gray(pay) == base, f"interval {ri}"
        # markers only appear when the interval actually splits the scan
        assert (b"\xff\xd0" in pay) == (ri < 15)

    # color 4:2:0: one restart resets ALL THREE component predictors
    def yf(x, y):
        return (x // 16 * 37 + y // 16 * 11) % 256

    def cbf(x, y):
        return (x // 8 * 5 + y // 8 * 3 + 17) % 256

    def crf(x, y):
        return (x // 8 * 9 + y // 8 * 7 + 40) % 256

    cbase = M.decode_jpeg_color(M.encode_jpeg_ycbcr(32, 48, yf, cbf, crf))
    for ri in (1, 2, 5):
        pay = M.encode_jpeg_ycbcr(
            32, 48, yf, cbf, crf, restart_interval=ri
        )
        assert M.decode_jpeg_color(pay) == cbase, f"interval {ri}"


def test_jpeg_restart_rejects_out_of_sequence():
    """A skipped/repeated restart index means a lost interval (the whole
    point of the cyclic counter) — must raise, not resync silently."""

    def px(x, y):
        return (x * 7 + y * 13) % 256

    pay = bytearray(M.encode_jpeg_gray(40, 24, px, restart_interval=2))
    j = pay.find(b"\xff\xd0", 20)
    assert j > 0
    pay[j + 1] = 0xD5
    with pytest.raises(ValueError, match="expected restart marker"):
        M.decode_jpeg_gray(bytes(pay))
    # truncated right at a restart boundary
    with pytest.raises(ValueError, match="truncated|restart|EOI|exhausted"):
        M.decode_jpeg_gray(bytes(pay[:j]))


def test_jpeg_byte_stuffing_roundtrip():
    # values chosen so the entropy stream contains 0xFF bytes (stuffing
    # must be applied by the encoder and stripped by the decoder)
    found = False
    for base in range(0, 256, 7):
        def blockval(x, y, base=base):
            return (base + (x // 8) * 19) % 256

        pay = M.encode_jpeg_gray(64, 8, blockval)
        scan = pay[pay.find(b"\xff\xda") + 14 : -2]
        if b"\xff\x00" in scan:
            found = True
            out = M.decode_jpeg_gray(pay)
            want = [blockval(x, y) for y in range(8) for x in range(64)]
            assert out["sum_px"] == sum(want)
    assert found, "no test payload produced a stuffed byte; widen the sweep"


def test_decode_jpeg_stats_consistency(spark):
    rows = M.mm_decode_jpeg_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:20]:
        d = r["doc_id"]
        w, h = 8 * (2 + d % 3), 8 * (2 + d % 2)
        want = [M._block_val(d, x // 8, y // 8) for y in range(h) for x in range(w)]
        assert (r["width"], r["height"]) == (w, h)
        assert r["sum_px"] == sum(want)


# -- color surface ---------------------------------------------------------


def _ref_rgb(yy, cb, cr):
    cb -= 128
    cr -= 128
    r = max(0, min(255, yy + ((M._FIX_RV * cr + 32768) >> 16)))
    g = max(0, min(255, yy - ((M._FIX_GU * cb + M._FIX_GV * cr + 32768) >> 16)))
    b = max(0, min(255, yy + ((M._FIX_BU * cb + 32768) >> 16)))
    return r, g, b


def test_jpeg_color_420_dc_exact_roundtrip():
    d = 5
    w, h = 32, 48
    pay = M.encode_jpeg_ycbcr(
        w, h,
        lambda x, y: M._mcu_ycbcr(d, x // 16, y // 16)[0],
        lambda x, y: M._mcu_ycbcr(d, x // 8, y // 8)[1],
        lambda x, y: M._mcu_ycbcr(d, x // 8, y // 8)[2],
        subsample=True,
    )
    out = M.decode_jpeg_color(pay)
    sr = sg = sb = 0
    mn, mx = 255, 0
    for my in range(h // 16):
        for mxx in range(w // 16):
            r, g, b = _ref_rgb(*M._mcu_ycbcr(d, mxx, my))
            sr += 256 * r
            sg += 256 * g
            sb += 256 * b
            mn = min(mn, r, g, b)
            mx = max(mx, r, g, b)
    assert (out["width"], out["height"], out["n_px"]) == (w, h, w * h)
    assert (out["sum_r"], out["sum_g"], out["sum_b"]) == (sr, sg, sb)
    assert (out["min_rgb"], out["max_rgb"]) == (mn, mx)


def test_jpeg_color_444_dc_exact_roundtrip():
    w, h = 16, 24

    def yf(x, y):
        return (x // 8 * 50 + y // 8 * 30) % 256

    def cbf(x, y):
        return (x // 8 * 70 + y // 8 * 90) % 256

    def crf(x, y):
        return (x // 8 * 15 + y // 8 * 75) % 256

    out = M.decode_jpeg_color(
        M.encode_jpeg_ycbcr(w, h, yf, cbf, crf, subsample=False)
    )
    sr = sg = sb = 0
    for y in range(h):
        for x in range(w):
            r, g, b = _ref_rgb(yf(x, y), cbf(x, y), crf(x, y))
            sr += r
            sg += g
            sb += b
    assert (out["sum_r"], out["sum_g"], out["sum_b"]) == (sr, sg, sb)


def test_jpeg_color_chroma_planes_not_swapped():
    # pure-red-ish MCU: Cr high, Cb neutral → R must exceed B; a decoder
    # that swaps the chroma planes inverts that
    out = M.decode_jpeg_color(
        M.encode_jpeg_ycbcr(
            16, 16, lambda x, y: 128, lambda x, y: 128, lambda x, y: 255
        )
    )
    assert out["sum_r"] > out["sum_b"]
    r, _, b = _ref_rgb(128, 128, 255)
    assert out["sum_r"] == 256 * r and out["sum_b"] == 256 * b


def test_jpeg_color_upsample_alignment():
    # chroma varies per chroma-PIXEL (not per block): box upsampling maps
    # each chroma sample onto a 2x2 luma patch; any misalignment shifts
    # sums. AC coefficients in chroma blocks make this a lossy check →
    # bound, not equality.
    w = h = 16

    def cbf(x, y):
        return 128 + (17 * x - 13 * y) % 32 - 16

    out = M.decode_jpeg_color(
        M.encode_jpeg_ycbcr(w, h, lambda x, y: 200, cbf, lambda x, y: 128)
    )
    sr = sg = sb = 0
    for y in range(h):
        for x in range(w):
            r, g, b = _ref_rgb(200, cbf(x // 2, y // 2), 128)
            sr += r
            sg += g
            sb += b
    assert abs(out["sum_r"] - sr) <= w * h
    assert abs(out["sum_b"] - sb) <= 2 * w * h


def test_jpeg_color_rejects_out_of_surface():
    pay = M.encode_jpeg_ycbcr(
        16, 16, lambda x, y: 0, lambda x, y: 128, lambda x, y: 128
    )
    # 4:2:2/4:4:0/4:1:1 are SUPPORTED since round 6; a 3x1 Y factor is
    # not a real-world layout and stays out of surface
    idx = pay.find(b"\xff\xc0")
    patched = bytearray(pay)
    patched[idx + 11] = 0x31  # component 1 sampling h=3,v=1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="subsampling"):
        M.decode_jpeg_color(bytes(patched))


def test_decode_jpeg_color_stats_consistency(spark):
    rows = M.mm_decode_jpeg_color_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:12]:
        d = r["doc_id"]
        w, h = 16 * (1 + d % 2), 16 * (1 + d % 3)
        sr = 0
        for my in range(h // 16):
            for mxx in range(w // 16):
                sr += 256 * _ref_rgb(*M._mcu_ycbcr(d, mxx, my))[0]
        assert (r["width"], r["height"]) == (w, h)
        assert r["sum_r"] == sr


def test_jpeg_chroma_layouts_422_440_411():
    """The MCU walk and replication upsample are generic in (h, v): the
    real-world chroma layouts beyond 4:2:0 — 4:2:2 (Y 2x1), 4:4:0
    (Y 1x2), 4:1:1 (Y 4x1) — decode exactly on per-8x8-constant planes,
    and compose with restart intervals and the progressive framing."""
    import numpy as np

    from mit_6_5840_mapreduce_with_go_spark.operators import multimodal8 as M8

    def yfn(x, y):
        return (x // 8 * 37 + y // 8 * 11) % 256

    def cbfn(x, y):
        return (x // 8 * 5 + y // 8 * 3 + 17) % 256

    def crfn(x, y):
        return (x // 8 * 9 + y // 8 * 7 + 40) % 256

    for (yh, yv), name in [((2, 1), "4:2:2"), ((1, 2), "4:4:0"), ((4, 1), "4:1:1")]:
        W, H = 8 * yh * 3, 8 * yv * 2
        comps = [(yh, yv, yfn), (1, 1, cbfn), (1, 1, crfn)]
        p = M._parse_jpeg(M._encode_jpeg(W, H, comps))
        for ci, fn in ((0, yfn), (1, cbfn), (2, crfn)):
            pw, ph = p["plane_dims"][ci]
            got = np.frombuffer(bytes(p["planes"][ci]), np.uint8).reshape(ph, pw)
            want = np.array([[fn(x, y) for x in range(pw)] for y in range(ph)])
            assert (got == want).all(), f"{name} plane {ci}"
        assert M._color_stats(p)["n_px"] == W * H
        rst = M._parse_jpeg(M._encode_jpeg(W, H, comps, restart_interval=2))
        assert rst["planes"] == p["planes"], f"{name} restart"
        prog = M8.decode_jpeg_progressive(
            M8.encode_jpeg_progressive(W, H, comps, ac_al=1)
        )
        assert prog["planes"] == p["planes"], f"{name} progressive"


def test_fdct_matmul_matches_scalar_reference_on_random_blocks():
    """ADVICE r13: the matmul FDCT differs from the scalar quadruple
    loop only in float summation order.  Pin that the difference on
    arbitrary (non-constant) blocks stays orders of magnitude below the
    0.5 quantization margin, so a future fixture with a coefficient
    near a .5 boundary cannot silently flip vs the scalar reference."""
    import math
    import random

    import numpy as np

    C = [1.0 / math.sqrt(2.0)] + [1.0] * 7
    COS = [
        [math.cos((2 * x + 1) * u * math.pi / 16.0) for u in range(8)]
        for x in range(8)
    ]

    def fdct_scalar(block):
        out = [[0.0] * 8 for _ in range(8)]
        for v in range(8):
            for u in range(8):
                s = 0.0
                for y in range(8):
                    for x in range(8):
                        s += block[y][x] * COS[x][u] * COS[y][v]
                out[v][u] = 0.25 * C[u] * C[v] * s
        return out

    rng = random.Random(20260818)
    worst = 0.0
    for _ in range(20):
        block = [[rng.uniform(-128.0, 127.0) for _ in range(8)] for _ in range(8)]
        got = np.array(M._fdct2d(block))
        want = np.array(fdct_scalar(block))
        worst = max(worst, float(np.abs(got - want).max()))
    # quantization rounds to the nearest integer (0.5 margin); demand
    # at least 6 orders of magnitude of slack
    assert worst < 5e-7, worst
