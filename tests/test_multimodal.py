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


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_image_real(b"x")


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
