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
# row's driver evidence ages past ~5 rounds.  The round-11 window: 3
# new (zstfile Catalyst filter pushdown; the composed shard+frame
# point read; the seekable-shard WRITE-path round trip), 7 changed
# (the zstd family — cumulative no-FCS output cap in the frame walk,
# the chunk-refilled _BackBits bit reader, the pushdown refactor of the
# zstfile reader, the seekable shard-dir rename hardening — plus the
# CC-loop diet and the sketch-aggregate Expand split), the 28 rows
# whose evidence dates to round 4, and the 12 alphabetically-first
# round-5 rows (the remaining 35 r5 rows head the round-12 backlog).
# Everything rotated
# out stays mirror-checked by tools/check_correctness.py over all
# queries at three SFs.
WINDOW_PRIORITY: list[str] = [
    # --- Round-11 window ---
    # New this round (never driver-verified)
    "mm_zst_pushdown_stats",
    "mm_zst_shard_pointread_stats",
    "mm_zst_sink_roundtrip_stats",
    # Changed this round (re-verification): zstd decode internals, the
    # zstfile source reader, the CC loop diet + pairs checkpoint, and
    # the sketch-aggregate Expand split
    "dedup_cc_two_phase",
    "sketch_distinct_users",
    "mm_decode_zstd_stats",
    "mm_decode_zstd_entropy_stats",
    "mm_decode_zstd_dict_stats",
    "mm_zst_source_stats",
    "mm_zst_seekable_stats",
    # Freshness SLA: the 28 rows whose last hard driver-green evidence
    # dates to round 4 — after this window no registry row's driver
    # evidence is older than round 5
    "dedup_containment",
    "dedup_minhash_pr_eval",
    "eval_calibration_bins",
    "eval_threshold_sweep",
    "graph_lpa_communities",
    "kv_cas_replay",
    "kv_get_lookup",
    "kv_shard_distribution",
    "privacy_k_anonymity",
    "sim_ann_ndcg_eval",
    "sim_ann_recall_eval",
    "sim_hybrid_rrf",
    "sim_ivf_incremental_update",
    "sim_matryoshka_prefix_recall",
    "sim_range_search_lsh",
    "sim_topk_ivfpq",
    "sketch_quantile_histogram",
    "stats_chi2_independence",
    "stats_lorenz_gini",
    "stats_winsorized_moments",
    "text_char_entropy",
    "text_collocations_pmi",
    "text_fingerprint",
    "text_keywords_tfidf",
    "text_lang_guess",
    "text_ngram_novelty",
    "text_token_stats",
    "vocab_bpe_apply",
    # ...and the 16 alphabetically-first round-5 rows
    "asof_join_next_purchase_after_error",
    "bitmap_type_day_overlap",
    "events_ab_welch_t",
    "events_attribution_models",
    "events_changepoint_binary_seg",
    "events_cusum_drift",
    "events_ewma_value",
    "events_funnel_conversion",
    "events_gap_fill_hourly",
    "events_kaplan_meier",
    "events_leadlag_xcorr",
    "events_markov_transitions",
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
