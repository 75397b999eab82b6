"""Progressive-JPEG (SOF2) codec tests: differential equality against
the baseline decoder (same FDCT/quant pipeline => identical coefficient
blocks => identical reconstruction regardless of framing), scan-script
depth sweeps, EOBRUN/refinement paths, and malformed-input rejection."""

from __future__ import annotations

import struct

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import multimodal3 as M3
from mit_6_5840_mapreduce_with_go_spark.operators import multimodal8 as M8


def _tex(x, y):
    # rich texture: nonzero AC in every block, mixed signs
    return (x * 7 + y * 13 + (x * y) % 5 * 31) % 256


@pytest.mark.parametrize("dims", [(16, 16), (40, 24), (64, 8)])
@pytest.mark.parametrize("al", [0, 1, 2, 3])
def test_progressive_gray_equals_baseline(dims, al):
    """Progressive framing is lossless relative to baseline: both paths
    share the coefficient pipeline, so planes must be byte-identical at
    every successive-approximation depth (al=0 has no AC refinement
    scans; al=3 runs three per component)."""
    w, h = dims
    base = M3._parse_jpeg(M3.encode_jpeg_gray(w, h, _tex))
    pay = M8.encode_jpeg_progressive(w, h, [(1, 1, _tex)], ac_al=al)
    got = M8.decode_jpeg_progressive(pay)
    assert got["planes"] == base["planes"]
    assert (got["width"], got["height"]) == (w, h)


@pytest.mark.parametrize("al", [0, 1, 2])
def test_progressive_420_color_equals_baseline(al):
    """4:2:0 layout: interleaved DC scan over 2x2+1+1 MCUs, per-
    component AC scans over DIFFERENT block grids; one DC refinement
    bit stream covers all three components' predictors."""

    def yf(x, y):
        return (x * 3 + y * 5) % 256

    def cbf(x, y):
        return (x * 11 + y * 2 + 7) % 256

    def crf(x, y):
        return (x + y * 9 + 100) % 256

    comps = [(2, 2, yf), (1, 1, cbf), (1, 1, crf)]
    base = M3._parse_jpeg(M3.encode_jpeg_ycbcr(32, 48, yf, cbf, crf))
    got = M8.decode_jpeg_progressive(
        M8.encode_jpeg_progressive(32, 48, comps, ac_al=al)
    )
    assert got["planes"] == base["planes"]
    assert got["samplings"] == base["samplings"]


def test_progressive_planted_corpus_matches_baseline_stats():
    """The query contract: the DC-exact planted corpus decodes to the
    same stats dict through either framing."""
    for d in range(8):
        w, h = 8 * (2 + d % 3), 8 * (2 + d % 2)

        def px(x, y, d=d):
            return M3._block_val(d, x // 8, y // 8)

        b = M3.decode_jpeg_gray(M3.encode_jpeg_gray(w, h, px))
        p = M8.decode_jpeg_progressive_gray(
            M8.encode_jpeg_progressive(w, h, [(1, 1, px)], ac_al=1)
        )
        assert b == p


def test_progressive_eobrun_spans_blocks():
    """A constant image has zero AC everywhere: the AC scans collapse to
    ONE EOBn symbol covering every block (the multi-block end-of-band
    run path), and the refinement scan to one EOBn with no correction
    bits.  Verified by stream size: the whole payload stays under the
    table overhead + a few dozen entropy bytes."""
    pay = M8.encode_jpeg_progressive(64, 64, [(1, 1, lambda x, y: 77)], ac_al=1)
    got = M8.decode_jpeg_progressive(pay)
    assert set(got["planes"][0]) == {77}
    # 64 blocks of AC data in a handful of bytes proves EOBRUN batching
    sos3 = pay.find(b"\xff\xda", pay.find(b"\xff\xda", pay.find(b"\xff\xda") + 2) + 2)
    assert len(pay) - sos3 < 64


def test_progressive_rejects_malformed():
    pay = M8.encode_jpeg_progressive(16, 16, [(1, 1, _tex)], ac_al=1)
    with pytest.raises(ValueError, match="SOI"):
        M8.decode_jpeg_progressive(b"\x00\x00" + pay)
    with pytest.raises(
        ValueError, match="EOI|truncated|exhausted|entropy segment"
    ):
        M8.decode_jpeg_progressive(pay[:-2])
    # baseline stream routed to the progressive decoder is refused
    with pytest.raises(ValueError, match="not progressive"):
        M8.decode_jpeg_progressive(M3.encode_jpeg_gray(16, 16, _tex))
    # and vice versa: SOF2 is out of the baseline decoder's surface
    with pytest.raises(ValueError, match="non-baseline"):
        M3.decode_jpeg_gray(pay)
    # DRI declaring an interval the scans do not honor: the decoder
    # expects an RST marker at the first boundary and fails loudly
    dri = pay[:2] + struct.pack(">HHH", 0xFFDD, 4, 2) + pay[2:]
    with pytest.raises(ValueError, match="restart marker"):
        M8.decode_jpeg_progressive(dri)
    # unaligned dims rejected at encode
    with pytest.raises(ValueError, match="divisible"):
        M8.encode_jpeg_progressive(12, 8, [(1, 1, _tex)])


def test_progressive_query_consistency(spark):
    """End-to-end mapInPandas pipeline at sf0.001: widths/heights follow
    the planted formula and every mean is sum/n."""
    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal8 import (
        mm_decode_jpeg_progressive_stats,
    )

    rows = mm_decode_jpeg_progressive_stats(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows[:50]:
        assert r["width"] == 8 * (2 + r["doc_id"] % 3)
        assert r["height"] == 8 * (2 + r["doc_id"] % 2)
        assert r["n_px"] == r["width"] * r["height"]
        assert 0 <= r["min_px"] <= r["max_px"] <= 255


@pytest.mark.parametrize("ri", [1, 2, 3, 7, 100])
def test_progressive_restart_interval_roundtrip(ri):
    """DRI/RSTn in progressive mode: per-scan restart units (MCUs for
    DC scans, blocks for AC scans), marker index restarting at RST0 in
    every scan, DC predictor resets, and EOB runs flushed at every
    boundary — all lossless framing, so planes match the unrestarted
    stream exactly."""
    base = M3._parse_jpeg(M3.encode_jpeg_gray(40, 24, _tex))
    for al in (0, 1, 2):
        pay = M8.encode_jpeg_progressive(
            40, 24, [(1, 1, _tex)], ac_al=al, restart_interval=ri
        )
        assert M8.decode_jpeg_progressive(pay)["planes"] == base["planes"]


def test_progressive_restart_color_and_eob_split():
    def yf(x, y):
        return (x * 3 + y * 5) % 256

    def cbf(x, y):
        return (x * 11 + y * 2 + 7) % 256

    def crf(x, y):
        return (x + y * 9 + 100) % 256

    cbase = M3._parse_jpeg(M3.encode_jpeg_ycbcr(32, 48, yf, cbf, crf))
    for ri in (1, 2, 5):
        pay = M8.encode_jpeg_progressive(
            32, 48, [(2, 2, yf), (1, 1, cbf), (1, 1, crf)],
            ac_al=1, restart_interval=ri,
        )
        assert M8.decode_jpeg_progressive(pay)["planes"] == cbase["planes"]
    # constant image: the whole-component EOB run must SPLIT at each
    # boundary (a run crossing one is a stream error the decoder checks)
    pay = M8.encode_jpeg_progressive(
        64, 64, [(1, 1, lambda x, y: 77)], ac_al=1, restart_interval=3
    )
    assert set(M8.decode_jpeg_progressive(pay)["planes"][0]) == {77}


def test_progressive_restart_rejects_out_of_sequence():
    pay = bytearray(
        M8.encode_jpeg_progressive(
            40, 24, [(1, 1, _tex)], ac_al=1, restart_interval=2
        )
    )
    j = pay.find(b"\xff\xd0", pay.find(b"\xff\xda"))
    assert j > 0
    pay[j + 1] = 0xD4
    with pytest.raises(ValueError, match="expected restart marker"):
        M8.decode_jpeg_progressive(bytes(pay))


def test_jpeg422_query_consistency(spark):
    """4:2:2 end-to-end: dims follow the planted formula; every MCU is
    128 identical pixels so sums are 128-divisible."""
    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal8 import (
        mm_decode_jpeg422_stats,
    )

    rows = mm_decode_jpeg422_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:50]:
        assert r["width"] == 16 * (1 + r["doc_id"] % 2)
        assert r["height"] == 8 * (1 + r["doc_id"] % 3)
        assert r["n_px"] == r["width"] * r["height"]
        assert r["sum_r"] % 128 == 0
        assert 0 <= r["min_rgb"] <= r["max_rgb"] <= 255


@pytest.mark.parametrize(
    "bands", [[(1, 5), (6, 63)], [(1, 1), (2, 9), (10, 63)], [(1, 63)]]
)
def test_progressive_spectral_bands_roundtrip(bands):
    """Spectral selection: AC split into per-band scans (the libjpeg
    low-frequencies-first script).  Lossless framing at every depth,
    composing with restart intervals; a band list with gaps or overlap
    is rejected at encode."""
    base = M3._parse_jpeg(M3.encode_jpeg_gray(40, 24, _tex))
    for al in (0, 1, 2):
        for ri in (0, 2):
            pay = M8.encode_jpeg_progressive(
                40, 24, [(1, 1, _tex)], ac_al=al,
                restart_interval=ri, ac_bands=bands,
            )
            assert M8.decode_jpeg_progressive(pay)["planes"] == base["planes"]


def test_progressive_bands_validation_and_color():
    with pytest.raises(ValueError, match="ac_bands"):
        M8.encode_jpeg_progressive(16, 16, [(1, 1, _tex)], ac_bands=[(1, 5), (7, 63)])
    with pytest.raises(ValueError, match="ac_bands"):
        M8.encode_jpeg_progressive(16, 16, [(1, 1, _tex)], ac_bands=[(1, 5), (5, 63)])

    def yf(x, y):
        return (x * 3 + y * 5) % 256

    def cbf(x, y):
        return (x * 11 + y * 2 + 7) % 256

    def crf(x, y):
        return (x + y * 9 + 100) % 256

    cbase = M3._parse_jpeg(M3.encode_jpeg_ycbcr(32, 48, yf, cbf, crf))
    pay = M8.encode_jpeg_progressive(
        32, 48, [(2, 2, yf), (1, 1, cbf), (1, 1, crf)],
        ac_al=1, ac_bands=[(1, 5), (6, 63)], restart_interval=2,
    )
    assert M8.decode_jpeg_progressive(pay)["planes"] == cbase["planes"]


def test_progressive_color_query_consistency(spark):
    """11-scan progressive color end-to-end at sf0.001: dims follow the
    planted formula; sums are 256-divisible (256 identical px per MCU)."""
    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal8 import (
        mm_decode_jpeg_progressive_color_stats,
    )

    rows = mm_decode_jpeg_progressive_color_stats(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows[:50]:
        assert r["width"] == 16 * (1 + r["doc_id"] % 2)
        assert r["height"] == 16 * (1 + r["doc_id"] % 3)
        assert r["sum_r"] % 256 == 0
        assert 0 <= r["min_rgb"] <= r["max_rgb"] <= 255
