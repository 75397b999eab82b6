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
# rounds 1-6 pinned the TPC-H sweep, the session flagships, the
# dedup/ANN/curation/text families, the stitched/events/sketch/layout
# families, and the round-5/6 multimodal suite; the round-7 window
# closed the ledger at 277/277 (every registered query driver-green at
# least once, CORRECTNESS_r01-r07.json).  From round 8 on the window is
# a ROLLING REGRESSION GATE under a freshness SLA (VERDICT r9 #2):
# each round the window carries (a) every NEW query, (b) every CHANGED
# query, then (c) fills to 50 with the rows whose hard driver-green
# evidence is OLDEST in the cumulative CORRECTNESS_r* ledger — so no
# row's driver evidence ages past ~5 rounds.  The round-10 window: 5
# new (zstd entropy layer + dictionaries + .zst file source + seekable pruning, capped PPJoin), 4 changed (total zstd walk,
# ORC bound, dispatcher payload builder), the 21 rows last verified in
# round 2, and the 20 oldest round-4 rows.  Everything rotated out
# stays mirror-checked by tools/check_correctness.py over all queries
# at three SFs.
WINDOW_PRIORITY: list[str] = [
    # --- Round-10 window ---
    # New this round (never driver-verified): the zstd entropy layer
    # and the PPJoin candidate-budget kill-switch
    "mm_decode_zstd_entropy_stats",
    "dedup_ppjoin_capped",
    "mm_decode_zstd_dict_stats",
    "mm_zst_source_stats",
    "mm_zst_seekable_stats",
    # Changed this round (re-verification): the zstd frame walker is
    # now total (compressed blocks decode; checksums verified), the ORC
    # footer bound tightened (ADVICE r9), the total dispatcher's image
    # family map was made explicit (payload builder touched)
    "mm_decode_zstd_stats",
    "mm_decode_orc_stats",
    "mm_any_auto_dispatch_stats",
    "mm_any_auto_quarantine_stats",
    # Freshness SLA (VERDICT r9 #2): the 21 rows whose last hard
    # driver-green evidence dates to round 2 — after this window no
    # registry row's driver evidence is older than round 4
    "mr_wordcount_gutenberg",
    "events_sessionization",
    "sim_tfidf_topk",
    "text_repetition_quality",
    "pipeline_contamination_check",
    "pipeline_pack_sequences",
    "dedup_incremental_batch",
    "mm_pca_power_iteration",
    "eval_quality_auc",
    "maintenance_ivm_join_view",
    "layout_zorder_buckets",
    "asof_join_last_order_before_event",
    "sketch_distinct_users",
    "sketch_countmin_user_counts",
    "scd2_user_value_history",
    "sim_topk_pq_adc",
    "sim_mmr_rerank",
    "sketch_cms_sliding_counts",
    "text_quality_score",
    "events_time_weighted_avg",
    "vocab_bpe_merges",
    # ...and the 20 oldest round-4 rows (the remaining 25 r4-era rows
    # head the round-11 backlog)
    "dedup_clusters",
    "dedup_keep_best",
    "graph_pagerank_dup_clusters",
    "graph_triangle_census",
    "graph_khop_reachability",
    "cluster_silhouette_simplified",
    "pipeline_curated_documents",
    "pipeline_drop_reasons",
    "pipeline_domain_cap",
    "pipeline_pretrain_corpus",
    "pipeline_quality_resample",
    "pipeline_corpus_composition",
    "pipeline_paragraph_dedup",
    "pipeline_chunk_documents",
    "pipeline_group_split",
    "pipeline_weighted_sample",
    "pipeline_mixture_weights",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_minhash_xengine",
]


def load_all() -> None:
    """Import every operator module for its registration side effects,
    then reorder the registry so ``WINDOW_PRIORITY`` occupies the first
    positions (the driver-verified window)."""
    from .mapreduce import apps  # noqa: F401
    from .operators import (  # noqa: F401
        avro_container,
        behavior,
        bloom,
        clusters,
        crawl,
        curation,
        curation2,
        curation3,
        curation4,
        curation5,
        dedup,
        dedup2,
        dispatch2,
        dispatch3,
        evaluation,
        graphs2,
        ingest_csv,
        ivm,
        kv,
        lakehouse,
        layout,
        market,
        multimodal,
        multimodal2,
        multimodal3,
        multimodal4,
        multimodal5,
        multimodal6,
        multimodal7,
        multimodal8,
        multimodal9,
        multimodal10,
        multimodal11,
        multimodal12,
        multimodal13,
        multimodal14,
        parquet_footer,
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
        stream_projections,
        tensors,
        tfrecord,
        text,
        timeseries,
        udafs,
        vocab,
        warc_ingest,
    )
    from .streaming import windows  # noqa: F401

    missing = [n for n in WINDOW_PRIORITY if n not in QUERIES]
    if missing:
        raise ValueError(f"WINDOW_PRIORITY names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in WINDOW_PRIORITY}
    ordered.update({n: fn for n, fn in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)
