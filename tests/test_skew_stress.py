"""Skew stress for the LSH band-bucket candidate join: a boilerplate-
heavy corpus (30% of docs share one template body) drives the hottest
(band, bucket) far past `_LSH_MAX_BUCKET`, and the cap must bound the
candidate blow-up.  A bucket of B docs yields B^2/2 pairs — at 100 TB an
uncapped hot bucket is THE failure mode of every bucketed-pair join in
this repo; this test fails if the cap is removed from
`_lsh_candidate_pairs`."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mit_6_5840_mapreduce_with_go_spark.operators.dedup import (
    _LSH_MAX_BUCKET,
    _lsh_bands,
    _lsh_candidate_pairs,
    BAND_SIZE,
    N_PERM,
)

N_DOCS = 2000
BOILER_FRAC = 0.30
_BOILER = (
    "subscribe to our newsletter all rights reserved terms of service "
    "privacy policy cookie settings contact us about careers"
)


@pytest.fixture()
def boiler_docs(spark):
    rng = random.Random(97)
    words = [f"w{i}" for i in range(5000)]
    rows = []
    for i in range(N_DOCS):
        if i % 10 < BOILER_FRAC * 10:
            text = _BOILER  # identical body -> identical signature
        else:
            text = " ".join(rng.choice(words) for _ in range(40))
        rows.append(Row(doc_id=i, text=text))
    return spark.createDataFrame(rows).repartition(8)


def test_fixture_actually_skews(boiler_docs):
    """Non-vacuity: the hottest raw bucket must dwarf the cap — identical
    boilerplate docs share every band bucket (~600 docs per bucket)."""
    _sigs, bands = _lsh_bands(boiler_docs)
    census = (
        bands.groupBy("band_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]
    )
    assert census["mx"] >= int(N_DOCS * BOILER_FRAC)
    assert census["mx"] > 2 * _LSH_MAX_BUCKET


def test_bucket_cap_bounds_candidate_pairs(boiler_docs):
    """With the cap, candidate volume is bounded by n_bands * C(cap, 2)
    plus the sparse non-boilerplate collisions.  Removing the cap admits
    the ~600-doc boilerplate bucket in EVERY band: C(600, 2) ≈ 180k
    pairs, two orders of magnitude past this bound — the assert fails."""
    _sigs, bands = _lsh_bands(boiler_docs)
    n_pairs = _lsh_candidate_pairs(bands).count()
    n_bands = N_PERM // BAND_SIZE
    cap_pairs = n_bands * (_LSH_MAX_BUCKET * (_LSH_MAX_BUCKET - 1)) // 2
    assert n_pairs <= cap_pairs, (
        f"{n_pairs} candidate pairs — the hot-bucket cap is not bounding "
        f"the band join (bound {cap_pairs})"
    )


def test_cap_drops_only_hot_buckets(boiler_docs):
    """The cap must not suppress NORMAL buckets: every surviving pair
    comes from a bucket of 2..cap docs, and no boilerplate doc pairs
    with a non-boilerplate doc through the capped path."""
    _sigs, bands = _lsh_bands(boiler_docs)
    pairs = _lsh_candidate_pairs(bands)
    boiler_ids = {i for i in range(N_DOCS) if i % 10 < BOILER_FRAC * 10}
    got = pairs.collect()
    for r in got:
        a_b = (r["doc_a"] in boiler_ids, r["doc_b"] in boiler_ids)
        # all-boilerplate buckets are over-cap in every band -> dropped;
        # a mixed pair would mean a hot bucket leaked past the filter
        assert a_b == (False, False), r
