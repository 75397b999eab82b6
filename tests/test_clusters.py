"""Connected-components dedup clustering: planted-graph correctness."""

from __future__ import annotations

from mit_6_5840_mapreduce_with_go_spark.operators.clusters import (
    connected_components,
    dedup_clusters,
)


def test_connected_components_planted(spark):
    # two clusters {1,2,3,4} (chain) and {10,11}; 20-21-22 triangle
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    labels = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_converges_on_long_chain(spark):
    n = 12  # diameter stress: chain of 12 needs several rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "doc_a long, doc_b long"
    )
    labels = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert set(labels.values()) == {1} and len(labels) == n


def test_dedup_clusters_members_ge_2(spark, sf_dir):
    rows = dedup_clusters(spark, sf_dir).collect()
    for r in rows:
        assert r["n_members"] >= 2  # singletons are implicit
        assert r["canonical_doc_id"] == r["cluster_id"]


def test_kmeans_matches_oracle(spark, sf_dir, duck):
    from conftest import assert_df_matches_oracle

    from mit_6_5840_mapreduce_with_go_spark.registry import ORACLES, QUERIES

    df = QUERIES["cluster_kmeans_embeddings"](spark, sf_dir)
    assert_df_matches_oracle(df, duck, ORACLES["cluster_kmeans_embeddings"])


def test_kmeans_assignment_is_hash_agg_not_window(spark, sf_dir):
    # the argmax must be a map-side-combinable aggregate; a row_number
    # window would shuffle-and-sort all k*N scored rows.
    from mit_6_5840_mapreduce_with_go_spark.registry import QUERIES

    df = QUERIES["cluster_kmeans_embeddings"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
