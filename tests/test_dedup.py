"""Dedup operators: planted-duplicate detection for the rows-only
(engine-hash) pipelines, plus structural sanity on the oracle-checked
ones."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mit_6_5840_mapreduce_with_go_spark.operators import dedup as D


def _docs_df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def _minhash_pairs(spark, df):
    """Run the minhash pipeline against an arbitrary docs frame by
    monkey-free injection: reuse the internals via temp view swap."""
    import mit_6_5840_mapreduce_with_go_spark.operators.dedup as dd

    orig = dd.load_table
    try:
        dd.load_table = lambda s, d, n: df  # noqa: ARG005
        return dd.dedup_minhash_lsh(spark, "ignored").collect()
    finally:
        dd.load_table = orig


def test_minhash_finds_planted_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    near = base.replace("lazy", "sleepy")  # one token differs
    other = "completely different words about spark shuffles and parquet columnar scans"
    rows = [(1, base), (2, base), (3, near), (4, other)]
    pairs = _minhash_pairs(spark, _docs_df(spark, rows))
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 2) in found  # exact dup must always collide in every band
    est = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in pairs}
    assert est[(1, 2)] == 1.0
    assert all((4 not in p) for p in found)  # unrelated doc never pairs


def test_simhash_identical_docs_same_fingerprint(spark):
    rows = [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
            (3, "epsilon zeta eta theta")]
    import mit_6_5840_mapreduce_with_go_spark.operators.dedup as dd

    orig = dd.load_table
    try:
        dd.load_table = lambda s, d, n: _docs_df(spark, rows)  # noqa: ARG005
        out = {r["doc_id"]: r["simhash"] for r in dd.dedup_simhash(spark, "x").collect()}
    finally:
        dd.load_table = orig
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_exact_dedup_counts(spark, sf_dir):
    out = D.dedup_exact(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    agg = out.agg(F.sum("n_copies").alias("s")).collect()[0]["s"]
    assert agg == docs


def test_ngram_jaccard_range(spark, sf_dir):
    rows = D.dedup_ngram_jaccard(spark, sf_dir).collect()
    for r in rows:
        assert 0.05 <= r["jaccard"] <= 1.0
        assert r["doc_a"] < r["doc_b"]


def test_embedding_cosine_pairs_bounded(spark, sf_dir):
    rows = D.dedup_embedding_cosine(spark, sf_dir).collect()
    for r in rows:
        assert -1.0001 <= r["cos_sim"] <= 1.0001
        assert r["vec_a"] < r["vec_b"]


def test_minhash_pr_eval_consistent(spark, sf_dir):
    """P/R metrics must be internally consistent and non-vacuous: hits
    bounded by both sets, ratios match the counts, and the 4-band/2-row
    config is recall-biased (bands fire on coarse agreement), so recall
    must be high while precision pays for it."""
    from mit_6_5840_mapreduce_with_go_spark.operators.dedup import (
        dedup_minhash_pr_eval,
    )

    r = dedup_minhash_pr_eval(spark, sf_dir).collect()[0]
    assert r["n_truth"] > 0, "synthetic corpus must contain near-dups"
    assert r["n_hits"] <= min(r["n_truth"], r["n_candidates"])
    assert abs(r["precision_"] - r["n_hits"] / max(r["n_candidates"], 1)) < 1e-3
    assert abs(r["recall_"] - r["n_hits"] / max(r["n_truth"], 1)) < 1e-3
    assert r["recall_"] >= 0.9


def test_shingles_empty_for_short_docs(spark):
    """Docs with fewer than n tokens must produce ZERO shingles (the SQL
    oracles' generate_series construction yields none) — not a partial
    shingle."""
    from mit_6_5840_mapreduce_with_go_spark.operators.dedup import _shingles

    df = spark.createDataFrame(
        [(1, "one two"), (2, "one"), (3, "a b c"), (4, "a b c d")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: (r["n_shingles"], r["shingles"]) for r in _shingles(df).collect()}
    assert rows[1][0] == 0 and rows[2][0] == 0
    assert rows[3] == (1, ["a b c"])
    assert rows[4][0] == 2


def test_repeated_spans_planted_overlap(spark, tmp_path):
    """Two docs sharing an exact 12-token run (at different offsets, with
    unrelated prefixes/suffixes) must report longest_span_tokens == 12;
    a pair sharing only scattered trigrams must stay below threshold."""
    import mit_6_5840_mapreduce_with_go_spark.operators.dedup as dd

    span = "the quick brown fox jumps over the lazy dog near riverbank tonight"
    assert len(span.split()) == 12
    docs = [
        (1, "alpha beta gamma " + span + " omega end"),
        (2, "unrelated preamble words here " + span),
        # doc 3 shares only ONE trigram with 1/2 (run of 1 -> span 3)
        (3, "the quick brown completely different continuation of words"),
        (4, "nothing in common with anything else at all here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    got = {
        (r["doc_a"], r["doc_b"]): (r["longest_span_tokens"], r["n_shared_positions"])
        for r in dd.dedup_repeated_spans(spark, str(tmp_path)).collect()
    }
    assert got[(1, 2)][0] == 12
    assert (1, 3) not in got and (2, 3) not in got and (3, 4) not in got
    # 12 shared tokens = 10 matching trigram starts on one diagonal
    assert got[(1, 2)][1] == 10
