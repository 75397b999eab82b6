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
# round 1 pinned the TPC-H sweep + flagships, round 2 the session-2/3
# flagships, rounds 3/4 the dedup/ANN/curation/text families (all 50/50
# green — CORRECTNESS_r01–r04.json).  This round-5 window: 48 queries
# that have NEVER had a driver-green row, led by everything rewritten in
# rounds 4–5 (the stitched global-ordering queries, the PRF pass, the
# two round-4 plan rewrites), plus 2 continuity rows (mr_wordcount, and
# sim_bm25_topk re-confirmed after the round-5 helper hoist).  Cumulative
# driver-verified after this window: 182/244.  Everything rotated out
# stays mirror-checked by tools/check_correctness.py over all queries.
WINDOW_PRIORITY: list[str] = [
    # MapReduce parity headline (continuity row, in every round's window)
    "mr_wordcount",
    # Rewritten in rounds 4-5 — never driver-verified (or re-pinned):
    "sim_bm25_topk",
    "sim_bm25_prf_expansion",
    "window_ntile_rank_lead",
    "skyline_orders_cheap_early",
    # Stitched this round (GWIN rewrites on plans/stitch.py)
    "layout_rle_run_estimate",
    "text_vocab_coverage",
    "text_zipf_fit",
    "text_heaps_law",
    "text_heaps_law_gutenberg",
    # Events/behavior analytics breadth (never driver-verified)
    "events_retention_cohorts",
    "events_markov_transitions",
    "events_ab_welch_t",
    "events_top_session_paths",
    "events_attribution_models",
    "events_pattern_sessions",
    "events_kaplan_meier",
    "events_funnel_conversion",
    "events_gap_fill_hourly",
    "events_rate_anomaly",
    "events_rolling_median",
    "events_ewma_value",
    "events_cusum_drift",
    "events_changepoint_binary_seg",
    "events_ohlc_bars",
    "events_leadlag_xcorr",
    "asof_join_next_purchase_after_error",
    # Custom UDAF surface
    "udaf_median_event_gap",
    "udaf_interdecile_value_spread",
    # Sketch family
    "sketch_bloom_partition_prune",
    "sketch_cms_join_size",
    "sketch_kmv_distinct_users",
    "sketch_kmv_source_overlap",
    "sketch_hll_sliding_union",
    "bitmap_type_day_overlap",
    # Storage-layout planners
    "layout_delta_varint_estimate",
    "layout_partition_prune_advisor",
    "layout_zorder_skip_measure",
    "layout_range_partition_plan",
    # Incremental maintenance
    "maintenance_snapshot_diff",
    "maintenance_ivm_agg_retraction",
    "maintenance_compaction_bins",
    "kv_consistent_hash_movement",
    # Pipeline / split tooling
    "pipeline_labels_asof_features",
    "pipeline_source_overlap_matrix",
    "pipeline_cluster_safe_split",
    "pipeline_epoch_shuffle",
    # Multimodal plumbing
    "mm_jl_projection",
    "mm_embedding_dim_stats",
    "mm_resize_plan",
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
        multimodal2,
        multimodal3,
        multimodal4,
        multimodal5,
        multimodal6,
        multimodal7,
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
