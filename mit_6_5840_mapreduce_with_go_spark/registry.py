"""Central query registry: the contract between operator modules and the
driver entrypoint (``__spark_entry__.py``).

Every operator registers a ``(spark, sf_dir) -> DataFrame`` callable and,
when SQL-expressible, a DuckDB oracle SQL string over the pre-registered
views (region nation customer supplier part orders lineitem events
documents embeddings). Column names/aliases MUST match between the two —
the driver sorts columns by name and hash-compares values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks it non-SQL-expressible
    (the driver then records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness gate verifies the FIRST 50 registered queries
# (registration order == dict insertion order).  The window ROTATES each
# round so the hard cross-engine signal accumulates across the registry:
# round 1 pinned the TPC-H sweep + flagships, round 2 swapped in the
# session-2/3 flagships (both 50/50 green — see CORRECTNESS_r01/r02.json),
# and this round-3 window covers the next 50 highest-value queries that
# have never had a driver-green row (plus the KV/graph/dedup rows that
# were driver-green only in round 1, re-verified after two rounds of
# changes, and the two newly-oracled MinHash/SimHash pipelines).  Overlap
# with the round-2 window: 1 query (mr_wordcount, the MapReduce-parity
# headline kept for cross-round continuity).  Everything rotated out
# stays mirror-checked by tools/check_correctness.py over all queries.
WINDOW_PRIORITY: list[str] = [
    # MapReduce parity headline (continuity row, in every round's window)
    "mr_wordcount",
    # Newly oracle-checked end-to-end this round (were rows-only): the
    # portable-hash MinHash-LSH and SimHash pipelines
    "dedup_minhash_lsh",
    "dedup_simhash",
    # ANN / similarity: the compressed + hybrid + evaluation surfaces
    "sim_topk_ivfpq",
    "sim_hybrid_rrf",
    "sim_ann_recall_eval",
    "sim_ann_ndcg_eval",
    "sim_range_search_lsh",
    "sim_matryoshka_prefix_recall",
    "sim_ivf_incremental_update",
    # Dedup family: candidate generation + election + eval
    "dedup_ngram_jaccard",
    "dedup_minhash_xengine",
    "dedup_minhash_pr_eval",
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_containment",
    # Graph primitives over the duplicate-pair graph
    "graph_pagerank_dup_clusters",
    "graph_triangle_census",
    "graph_khop_reachability",
    "graph_lpa_communities",
    "cluster_silhouette_simplified",
    # KV/shard surface (driver-green only in r01; re-pinned)
    "kv_cas_replay",
    "kv_get_lookup",
    "kv_shard_distribution",
    # Curation tranches: the corpus-assembly operators
    "pipeline_curated_documents",
    "pipeline_pretrain_corpus",
    "pipeline_domain_cap",
    "pipeline_quality_resample",
    "pipeline_corpus_composition",
    "pipeline_mixture_weights",
    "pipeline_group_split",
    "pipeline_weighted_sample",
    "pipeline_paragraph_dedup",
    "pipeline_chunk_documents",
    "pipeline_drop_reasons",
    # Tokenizer: BPE apply (merges were driver-green in r02)
    "vocab_bpe_apply",
    # Text analysis breadth
    "text_token_stats",
    "text_lang_guess",
    "text_fingerprint",
    "text_char_entropy",
    "text_ngram_novelty",
    "text_keywords_tfidf",
    "text_collocations_pmi",
    # Stats / eval family (winsorized: rank convention pinned this round;
    # silhouette + quantile histogram: degenerate-input guards added)
    "stats_chi2_independence",
    "stats_winsorized_moments",
    "stats_lorenz_gini",
    "eval_calibration_bins",
    "eval_threshold_sweep",
    "sketch_quantile_histogram",
    # Privacy surface
    "privacy_k_anonymity",
]


def load_all() -> None:
    """Import every operator module for its registration side effects,
    then reorder the registry so ``WINDOW_PRIORITY`` occupies the first
    positions (the driver-verified window)."""
    from .mapreduce import apps  # noqa: F401
    from .operators import (  # noqa: F401
        behavior,
        bloom,
        clusters,
        curation,
        curation2,
        curation3,
        curation4,
        dedup,
        evaluation,
        graphs2,
        ivm,
        kv,
        layout,
        market,
        multimodal,
        pipelines,
        privacy,
        projection,
        relational,
        relational2,
        relational3,
        relational4,
        retrieval,
        scaleops,
        sessions,
        similarity,
        sketches2,
        stats2,
        text,
        timeseries,
        udafs,
        vocab,
    )
    from .streaming import windows  # noqa: F401

    missing = [n for n in WINDOW_PRIORITY if n not in QUERIES]
    if missing:
        raise ValueError(f"WINDOW_PRIORITY names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in WINDOW_PRIORITY}
    ordered.update({n: fn for n, fn in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)
