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
