"""Invariant tests for the PII scrub (privacy.py), embedding dimension
stats, and corpus composition.  Cross-engine value parity is covered by
the oracle mirror; these assert semantic invariants and non-vacuity."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from mit_6_5840_mapreduce_with_go_spark.operators.curation2 import (
    pipeline_corpus_composition,
)
from mit_6_5840_mapreduce_with_go_spark.operators.multimodal import (
    mm_embedding_dim_stats,
)
from mit_6_5840_mapreduce_with_go_spark.operators.privacy import (
    _EMAIL_RE,
    _PHONE_RE,
    _with_pii,
    pii_doc_redaction,
    pii_scrub_stats,
)
from mit_6_5840_mapreduce_with_go_spark.sources import load_table


def test_pii_redaction_counts_and_cleanliness(spark, sf_dir):
    rows = pii_doc_redaction(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    for r in rows:
        # the injector plants exactly 1 phone and 1 or 2 emails
        expected_emails = 2 if r["doc_id"] % 3 == 0 else 1
        assert r["n_emails"] == expected_emails
        assert r["n_phones"] == 1
        assert r["chars_removed"] != 0 or r["n_emails"] + r["n_phones"] == 0
        assert re.fullmatch(r"[0-9a-f]{32}", r["clean_digest"])


def test_pii_redacted_text_has_no_pii_left(spark, sf_dir):
    """Run the scrub expression itself and re-scan the output: a clean
    text must contain zero pattern hits and carry the placeholders."""
    docs = _with_pii(load_table(spark, sf_dir, "documents"))
    clean = F.regexp_replace(
        F.regexp_replace(F.col("full"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    out = docs.select(
        F.regexp_count(clean, F.lit(_EMAIL_RE)).alias("e"),
        F.regexp_count(clean, F.lit(_PHONE_RE)).alias("p"),
        clean.contains("<EMAIL>").alias("has_email_tag"),
        clean.contains("<PHONE>").alias("has_phone_tag"),
    ).collect()
    for r in out:
        assert r["e"] == 0 and r["p"] == 0, "scrub left a live pattern"
        assert r["has_email_tag"] and r["has_phone_tag"]


def test_pii_scrub_stats_totals_match_doc_level(spark, sf_dir):
    per_doc = pii_doc_redaction(spark, sf_dir).collect()
    stats = pii_scrub_stats(spark, sf_dir).collect()
    assert sum(r["n_emails"] for r in stats) == sum(r["n_emails"] for r in per_doc)
    assert sum(r["n_phones"] for r in stats) == sum(r["n_phones"] for r in per_doc)
    assert sum(r["chars_removed"] for r in stats) == sum(
        r["chars_removed"] for r in per_doc
    )
    assert sum(r["n_docs"] for r in stats) == len(per_doc)


def test_embedding_dim_stats_shape_and_moments(spark, sf_dir):
    rows = mm_embedding_dim_stats(spark, sf_dir).collect()
    assert len(rows) == 64, "one row per embedding dimension"
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert {r["dim"] for r in rows} == set(range(64))
    for r in rows:
        assert r["n"] == n_vecs
        assert r["dim_min"] <= r["mean"] <= r["dim_max"]
        assert r["stddev"] >= 0 and math.isfinite(r["stddev"])
        # stddev can't exceed half the range... not in general — but it
        # is bounded by the full range for any distribution
        assert r["stddev"] <= (r["dim_max"] - r["dim_min"]) + 1e-9


def test_embedding_dim_stats_mean_matches_exact(spark, sf_dir):
    """Cross-check dim 0 against an independently computed exact mean."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = emb.select(
        F.avg(F.col("embedding")[0].cast("double")).alias("m")
    ).head()["m"]
    row = [r for r in mm_embedding_dim_stats(spark, sf_dir).collect() if r["dim"] == 0][0]
    assert abs(row["mean"] - exact) < 1e-5


def test_corpus_composition_shares_sum_to_one(spark, sf_dir):
    rows = pipeline_corpus_composition(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["corpus_share"] for r in rows) - 1.0) < 0.01
    by_lang = {}
    for r in rows:
        assert r["n_docs"] >= 1 and r["n_tokens"] >= r["n_docs"]
        by_lang.setdefault(r["lang"], 0.0)
        by_lang[r["lang"]] += r["lang_share"]
    for lang, s in by_lang.items():
        assert abs(s - 1.0) < 0.01, f"{lang} shares sum to {s}"
    # doc totals partition the corpus
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs


def test_k_anonymity_consistent_with_direct_groupby(spark, sf_dir):
    from mit_6_5840_mapreduce_with_go_spark.operators.privacy import (
        _KA_K,
        privacy_k_anonymity,
    )
    from mit_6_5840_mapreduce_with_go_spark.sources import load_table

    r = privacy_k_anonymity(spark, sf_dir).collect()[0]
    sizes = [
        x["n"]
        for x in load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert r["n_groups"] == len(sizes)
    assert r["k_anonymity"] == min(sizes)
    assert r["n_violating_groups"] == sum(1 for s in sizes if s < _KA_K)
    assert r["n_risky_docs"] == sum(s for s in sizes if s < _KA_K)
    assert r["n_risky_docs"] <= sum(sizes)
    # non-vacuity: the synthetic corpus must exhibit small classes
    assert r["n_violating_groups"] > 0


def test_l_diversity_invariants(spark, sf_dir):
    from mit_6_5840_mapreduce_with_go_spark.operators.privacy import (
        privacy_l_diversity,
    )

    rows = privacy_l_diversity(spark, sf_dir).collect()
    assert rows
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["class_size"] for r in rows) == n_docs
    for r in rows:
        assert 1 <= r["l_distinct"] <= r["class_size"]
        # top share bounds: 1/l <= share <= 1
        assert r["top_value_share"] <= 1.0 + 1e-9
        assert r["top_value_share"] >= 1.0 / r["l_distinct"] - 1e-4
