"""Invariant tests for the round-2 incremental-curation tranche:
incremental batch-vs-corpus dedup (exact leg exercised with synthetic
byte-dups — the testdata corpus has only near-dups), the EWMA recursive
fold, and character-entropy bounds."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from mit_6_5840_mapreduce_with_go_spark.operators.dedup import (
    dedup_incremental_batch,
)
from mit_6_5840_mapreduce_with_go_spark.operators.text import text_char_entropy
from mit_6_5840_mapreduce_with_go_spark.operators.timeseries import (
    events_ewma_value,
)

SF = "/root/testdata/sf0.001"


def test_incremental_dedup_statuses_and_direction(spark):
    rows = dedup_incremental_batch(spark, SF).collect()
    # one verdict per batch (odd) doc, no duplicates
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert all(i % 2 == 1 for i in ids)
    for r in rows:
        if r["status"] == "kept":
            assert r["match_doc"] is None and r["jaccard"] is None
        else:
            # matches point INTO the existing corpus (even ids)
            assert r["match_doc"] is not None and r["match_doc"] % 2 == 0
        if r["status"] == "near_dup":
            assert r["jaccard"] >= 0.5
    # the synthetic corpus plants near-dups; the directional join finds them
    assert any(r["status"] == "near_dup" for r in rows)


def test_incremental_dedup_exact_leg(spark, tmp_path):
    # Build a corpus with a planted byte-dup and whitespace-dup: batch doc 1
    # equals existing doc 0; batch doc 3 equals doc 2 modulo whitespace.
    texts = {
        0: "alpha beta gamma delta epsilon zeta eta theta",
        1: "alpha beta gamma delta epsilon zeta eta theta",
        2: "one two three four five six seven eight nine ten",
        3: "one  two three four five six seven  eight nine ten",
        4: "completely different content with no overlap at all here",
        5: "unrelated fresh text that matches nothing in the corpus",
    }
    df = spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sf")
    df.repartition(1).write.parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: r for r in dedup_incremental_batch(spark, d).collect()}
    assert out[1]["status"] == "exact_dup" and out[1]["match_doc"] == 0
    assert out[3]["status"] == "exact_dup" and out[3]["match_doc"] == 2
    assert out[5]["status"] == "kept"


def test_ewma_matches_python_fold(spark):
    rows = {r["user_id"]: r for r in events_ewma_value(spark, SF).collect()}
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("user_id") < 100)
        .orderBy("ts", "event_id")
        .collect()
    )
    by_user: dict[int, list[float]] = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(e["value"])
    for uid, vals in by_user.items():
        s = vals[0]
        for v in vals[1:]:
            s = v * 0.5 + s * 0.5
        assert rows[uid]["n_events"] == len(vals)
        assert abs(rows[uid]["ewma_value"] - round(s, 4)) < 1e-9


def test_char_entropy_bounds(spark):
    rows = text_char_entropy(spark, SF).collect()
    assert rows
    for r in rows:
        # 0 <= H <= log2(alphabet size), and H = 0 iff one distinct char
        hi = math.log2(r["n_distinct_chars"]) + 1e-9
        assert -1e-9 <= r["char_entropy_bits"] <= hi + 1e-4
        if r["n_distinct_chars"] == 1:
            assert r["char_entropy_bits"] == 0.0
