"""Perceptual-hash image dedup: dHash properties (shift invariance,
locality), real-decode hashing, and the banded-LSH pair query."""

from __future__ import annotations

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import multimodal5 as M
from mit_6_5840_mapreduce_with_go_spark.operators.multimodal2 import encode_png


def _raster(width, height, fn):
    return bytes(fn(x, y) & 0xFF for y in range(height) for x in range(width))


def test_dhash_brightness_shift_invariant():
    # dHash compares adjacent means, so a constant offset cancels —
    # the property that makes it a PERCEPTUAL hash
    fn = lambda x, y: (x * x * 7 + y * 13) % 200  # noqa: E731
    h1 = M.dhash56(_raster(16, 16, fn), 16, 16)
    h2 = M.dhash56(_raster(16, 16, lambda x, y: fn(x, y) + 40), 16, 16)
    assert h1 == h2


def test_dhash_locality():
    # flipping a handful of pixels flips only the bits whose cells they
    # touch; a structurally different image is far away
    base = lambda x, y: M._pix(8, x, y)  # noqa: E731
    h0 = M.dhash56(_raster(16, 16, base), 16, 16)
    h1 = M.dhash56(_raster(16, 16, lambda x, y: M._pix(9, x, y)), 16, 16)
    far = M.dhash56(_raster(16, 16, lambda x, y: M._pix(408, x, y)), 16, 16)
    near_d = bin(h0 ^ h1).count("1")
    far_d = bin(h0 ^ far).count("1")
    assert near_d <= 10 < far_d


def test_dhash_range_and_bigger_images():
    h = M.dhash56(_raster(32, 24, lambda x, y: (x * y) % 256), 32, 24)
    assert 0 <= h < (1 << 56)
    with pytest.raises(ValueError, match="divisible"):
        M.dhash56(_raster(12, 16, lambda x, y: 0), 12, 16)


def test_dhash_through_real_png_decode():
    # hash of decoded-PNG pixels == hash of the source raster (the
    # decode leg is lossless, so any difference is a decoder bug)
    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal2 import (
        decode_png_pixels,
    )

    fn = lambda x, y: M._pix(123, x, y)  # noqa: E731
    pay = encode_png(16, 16, lambda x, y, c: fn(x, y), channels=1)
    w, h, nch, raster = decode_png_pixels(pay)
    assert (w, h, nch) == (16, 16, 1)
    assert M.dhash56(raster, w, h) == M.dhash56(_raster(16, 16, fn), 16, 16)


def test_image_dedup_pairs_are_intra_group(spark):
    rows = M.mm_dedup_image_dhash(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 100  # the corpus has planted near-dup structure
    for r in rows:
        assert r["doc_a"] // 4 == r["doc_b"] // 4, (
            "cross-group false positive",
            r,
        )
        assert 0 <= r["hamming"] <= M._PH_MAX_HAMMING


# -- audio fingerprint -----------------------------------------------------


def test_audio_fingerprint_from_real_wav_decode():
    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal4 import (
        decode_wav_samples,
        encode_wav,
    )

    d = 42
    pay = encode_wav(
        M._AF_WINDOWS * M._AF_WIN, lambda i: M._af_sample(d, i)
    )
    nch, _rate, samples = decode_wav_samples(pay)
    assert nch == 1
    got = M.audio_fingerprint56(samples)
    # bits reduce to amplitude-envelope comparisons (carrier cancels)
    want, bit = 0, 0
    for w in range(M._AF_WINDOWS - 1):
        for l in range(M._AF_LANES):
            if M._af_amp(d // 4, w, l) ** 2 < M._af_amp(d // 4, w + 1, l) ** 2:
                want |= 1 << bit
            bit += 1
    assert got == want
    assert 0 <= got < (1 << 56)


def test_audio_fingerprint_variant_locality():
    def fp(doc):
        E = [
            [
                M._af_amp(doc // 4, w, l)
                + (
                    1
                    if doc % 4 > 0 and w == (doc % 4 * 4) % M._AF_WINDOWS
                    else 0
                )
                for l in range(M._AF_LANES)
            ]
            for w in range(M._AF_WINDOWS)
        ]
        h, bit = 0, 0
        for w in range(M._AF_WINDOWS - 1):
            for l in range(M._AF_LANES):
                if E[w][l] ** 2 < E[w + 1][l] ** 2:
                    h |= 1 << bit
                bit += 1
        return h

    for g in range(0, 100, 9):
        base = fp(g * 4)
        for k in (1, 2, 3):
            d = bin(base ^ fp(g * 4 + k)).count("1")
            assert d <= M._AF_MAX_HAMMING, (g, k, d)
        far = fp((g + 7) * 4)
        assert bin(base ^ far).count("1") > M._AF_MAX_HAMMING, (g,)


def test_audio_fingerprint_rejects_bad_clip():
    with pytest.raises(ValueError, match="multiple"):
        M.audio_fingerprint56(tuple(range(961)))


def test_audio_dedup_pairs_are_intra_group(spark):
    rows = M.mm_dedup_audio_fingerprint(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 750  # all planted pairs found, zero cross-group
    for r in rows:
        assert r["doc_a"] // 4 == r["doc_b"] // 4
        assert 0 <= r["hamming"] <= M._AF_MAX_HAMMING


def test_image_dedup_pr_eval(spark):
    row = M.mm_dedup_image_pr_eval(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_planted"] == 750
    assert row["precision"] == 1.0  # zero cross-group pairs at this SF
    assert 0.5 < row["recall"] < 1.0  # the banded-LSH recall trade
    assert row["n_pairs"] == row["n_true"] + row["n_false"]
