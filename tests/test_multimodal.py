"""Multimodal plumbing: binary payload schema, Arrow batch shape through
mapInPandas, stubbed decode determinism."""

from __future__ import annotations

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import multimodal as M
from mit_6_5840_mapreduce_with_go_spark.sources import load_table


def test_payload_schema(spark, sf_dir):
    mm = M.with_binary_payload(load_table(spark, sf_dir, "documents"))
    dtypes = dict(mm.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["meta"].startswith("struct<mime:string,n_bytes:int")


def test_decode_stub_deterministic():
    out1 = M.decode_image_stub(b"abcdef" * 10)
    out2 = M.decode_image_stub(b"abcdef" * 10)
    assert out1 == out2
    assert set(out1) == {"width", "height", "n_frames"}


def test_decode_real_stub_retired():
    """Round 7 retired the decode_image_real NotImplementedError stub in
    favor of decode_image_auto (magic-byte dispatch over the ten real
    decoders)."""
    assert not hasattr(M, "decode_image_real")


def test_decode_frames_matches_stub_locally(spark, sf_dir):
    rows = M.mm_decode_frames(spark, sf_dir).collect()
    docs = {r["doc_id"]: r["text"] for r in
            load_table(spark, sf_dir, "documents").collect()}
    assert len(rows) == len(docs)
    for r in rows[:20]:
        want = M.decode_image_stub(docs[r["doc_id"]].encode())
        assert (r["width"], r["height"], r["n_frames"]) == (
            want["width"], want["height"], want["n_frames"],
        )


def test_psi_zero_for_identical_cohorts_and_positive_definite(spark, sf_dir):
    """PSI is >= 0 by construction (Gibbs), small for the even/odd split
    of one distribution, and the bucket histogram must cover every
    audited dimension."""
    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal import (
        _PSI_DIMS,
        mm_embedding_drift_psi,
    )

    rows = mm_embedding_drift_psi(spark, sf_dir).collect()
    assert {r["dim"] for r in rows} == set(range(_PSI_DIMS))
    for r in rows:
        assert r["psi"] >= 0.0
        # same-distribution cohorts: no dimension should cross the
        # classic 0.25 "significant drift" alert line
        assert r["psi"] < 0.25


def test_pca_power_iteration_matches_numpy(spark):
    """The fixed-point power iteration must match an exact-integer numpy
    replica bit for bit (same floor quantization, same truncating
    rescale), and the loadings must be unit-norm."""
    import numpy as np

    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal import (
        _PCA_SCALE,
        mm_pca_power_iteration,
    )

    sf = "/root/testdata/sf0.001"
    rows = {r["dim_i"]: r for r in mm_pca_power_iteration(spark, sf).collect()}
    emb = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    # quantize in FLOAT32: Spark float * int-literal and DuckDB float *
    # integer both run in FLOAT; a float64 replica flips floor() on
    # ~0.4% of elements
    E = np.array([r["embedding"] for r in emb], dtype=np.float32)
    Q = np.floor(E * np.float32(_PCA_SCALE)).astype(object)
    G = Q.T @ Q
    v = np.array([_PCA_SCALE] * 64, dtype=object)
    for _ in range(3):
        gv = G @ v
        m = max(abs(int(x)) for x in gv)
        v = np.array(
            [
                (1 if int(x) >= 0 else -1) * (abs(int(x)) * _PCA_SCALE // m)
                for x in gv
            ],
            dtype=object,
        )
    den = int(v @ v)
    gv = G @ v
    num = int(v @ gv)
    trace = int(sum(G[i][i] for i in range(64)))
    for i in range(64):
        assert rows[i]["loading"] == round(int(v[i]) / np.sqrt(den), 4), i
    want_pct = round(100.0 * ((num / den) / trace), 4)
    assert rows[0]["explained_pct"] == want_pct
    norm = sum(r["loading"] ** 2 for r in rows.values())
    assert abs(norm - 1.0) < 1e-2  # rounding to 4dp perturbs unit norm


def test_resize_plan_geometry(spark):
    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal import (
        _RESIZE_TARGET,
        mm_resize_plan,
    )

    rows = mm_resize_plan(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        # the long side hits the target exactly; aspect never inverts
        assert max(r["dst_w"], r["dst_h"]) == _RESIZE_TARGET
        assert 1 <= min(r["dst_w"], r["dst_h"]) <= _RESIZE_TARGET
        if r["src_w"] >= r["src_h"]:
            assert r["dst_w"] >= r["dst_h"]
        else:
            assert r["dst_h"] >= r["dst_w"]
        # floor-fit: dst aspect <= src aspect within one integer step
        assert r["dst_h"] * r["src_w"] <= r["src_h"] * (r["dst_w"] + 1) + r["src_w"]


# ---------------------------------------------------------------------------
# decode_ppm: the REAL in-container image decoder
# ---------------------------------------------------------------------------
def test_decode_ppm_known_image():
    raster = bytes(range(12))  # 2x2 RGB
    out = M.decode_ppm(b"P6\n2 2\n255\n" + raster)
    assert out == {
        "width": 2, "height": 2, "n_px": 12,
        "sum_px": sum(range(12)), "min_px": 0, "max_px": 11,
    }


def test_decode_ppm_header_comments_and_whitespace():
    # netpbm allows comments and arbitrary whitespace between header tokens
    payload = b"P6 # a comment\n# another\n 3\t1 #w h\n255\n" + b"\xff" * 9
    out = M.decode_ppm(payload)
    assert (out["width"], out["height"]) == (3, 1)
    assert out["sum_px"] == 255 * 9 and out["max_px"] == 255


def test_decode_ppm_rejects_garbage():
    with pytest.raises(ValueError, match="P6"):
        M.decode_ppm(b"P5\n2 2\n255\n" + b"\x00" * 4)  # PGM, not PPM
    with pytest.raises(ValueError, match="raster"):
        M.decode_ppm(b"P6\n2 2\n255\n" + b"\x00" * 11)  # short raster
    with pytest.raises(ValueError, match="maxval"):
        M.decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 3)  # 16-bit samples
    with pytest.raises(ValueError):
        M.decode_ppm(b"P6\n2")  # truncated header


def test_decode_ppm_stats_consistency(spark):
    rows = M.mm_decode_ppm_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["n_px"] == r["width"] * r["height"] * 3
        assert 0 <= r["min_px"] <= r["max_px"] <= 255
        assert r["min_px"] * r["n_px"] <= r["sum_px"] <= r["max_px"] * r["n_px"]


# --------------------------------------------------------------------------
# round 7: magic-byte dispatcher over the ten real decoders
# --------------------------------------------------------------------------


def test_decode_image_auto_routes_all_ten_formats():
    """decode_image_auto recognizes every format the package decodes for
    real — by CONTENT, not name — and returns the routed decoder's
    stats under a format tag."""
    from mit_6_5840_mapreduce_with_go_spark.operators import (
        multimodal2 as M2,
        multimodal3 as M3,
        multimodal4 as M4,
        multimodal6 as M6,
        multimodal7 as M7,
        multimodal8 as M8,
        multimodal9 as M9,
    )

    pix = lambda x, y, c: (x * 7 + y * 19 + c * 11) % 256  # noqa: E731
    pix3 = lambda x, y: (pix(x, y, 0), pix(x, y, 1), pix(x, y, 2))  # noqa: E731

    ppm = b"P6\n4 3\n255\n" + bytes(
        pix(x, y, c) for y in range(3) for x in range(4) for c in range(3)
    )
    payloads = {
        "ppm": ppm,
        "png": M2.encode_png(4, 3, pix),
        "jpeg_gray": M3.encode_jpeg_gray(16, 16, lambda bx, by: 77),
        "jpeg_color": M3.encode_jpeg_ycbcr(
            16, 16, lambda bx, by: 90, lambda bx, by: 120, lambda bx, by: 140
        ),
        "jpeg_progressive_gray": M8.encode_jpeg_progressive(
            16, 16, [(1, 1, lambda x, y: 64)], ac_al=1
        ),
        "gif": M6.encode_gif(
            4, 3, [(i, (i * 3) % 256, (i * 7) % 256) for i in range(8)],
            lambda x, y: (x + y) % 8,
        ),
        "qoi": M7.encode_qoi(4, 3, pix3),
        "bmp": M9.encode_bmp(4, 3, pix),
        "wav": M4.encode_wav(100, lambda i: (i * 3) % 2000 - 1000),
        "y4m": M4.encode_y4m(16, 12, 3, lambda f, x, y: (f + x + y) % 256),
    }
    for fmt, pay in payloads.items():
        out = M.decode_image_auto(pay)
        assert out["format"] == fmt, (fmt, out["format"])

    # routed output == direct decoder output (spot-check three)
    assert M.decode_image_auto(payloads["ppm"]) == {
        "format": "ppm", **M.decode_ppm(payloads["ppm"])
    }
    assert M.decode_image_auto(payloads["bmp"]) == {
        "format": "bmp", **M9.decode_bmp(payloads["bmp"])
    }
    assert M.decode_image_auto(payloads["qoi"]) == {
        "format": "qoi", **M7.decode_qoi(payloads["qoi"])
    }
    # y4m summary aggregates the per-frame walk
    y = M.decode_image_auto(payloads["y4m"])
    assert (y["n_frames"], y["width"], y["height"]) == (3, 16, 12)
    assert y["sum_y"] == sum((f + x + y) % 256
                             for f in range(3) for y in range(12) for x in range(16))


def test_decode_image_auto_rejects_unknown_and_malformed():
    with pytest.raises(ValueError, match="unrecognized payload"):
        M.decode_image_auto(b"\x00\x01\x02\x03 not a known magic")
    with pytest.raises(ValueError, match="unrecognized payload"):
        M.decode_image_auto(b"")
    # known magic, malformed body -> the routed decoder's ValueError
    with pytest.raises(ValueError):
        M.decode_image_auto(b"\x89PNG\r\n\x1a\n" + b"garbage")
    # JPEG SOI but no SOF: the peek itself rejects
    with pytest.raises(ValueError, match="SOF"):
        M.decode_image_auto(b"\xff\xd8\xff\xd9")
