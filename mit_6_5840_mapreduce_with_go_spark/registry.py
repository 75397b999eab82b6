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
# row's driver evidence ages past ~5 rounds.  The round-12 window: 5
# new (the seek-table-only metadata census over corrupt-payload shards;
# the BETWEEN point read through the completed pushdown comparison
# algebra; the (file, frame_index) point read; the codec=huffman
# compressed-export round trip; the streaming shard source), 9 changed (the zstfile reader — IsNotNull nullability fix +
# <=/</= absorption — re-pins all four source-path rows; the streaming
# attempt-scoped sink rewrite re-pins the round trip; the eqNullSafe
# join fix re-pins the sketch split; the array-based PPJoin restructure
# re-pins all three of its consumers), the 35 rows whose evidence dates
# to round 5 (judge re-verified 10 of them green in r11), and the
# alphabetically-first round-6 row (the remaining 48 r6 rows head the
# round-13 backlog).  Everything rotated out stays mirror-checked by
# tools/check_correctness.py over all queries at three SFs.
WINDOW_PRIORITY: list[str] = [
    # --- Round-12 window ---
    # New this round (never driver-verified)
    "mm_zst_meta_census",
    "mm_zst_between_pointread_stats",
    "mm_zst_frame_pointread_stats",
    "mm_zst_sink_huffman_stats",
    "mm_zst_stream_source_stats",
    # Changed this round (re-verification): the zstfile reader's
    # pushdown algebra + nullability, the streaming two-phase sink, and
    # the null-safe sketch join
    "mm_zst_pushdown_stats",
    "mm_zst_shard_pointread_stats",
    "mm_zst_seekable_stats",
    "mm_zst_source_stats",
    "mm_zst_sink_roundtrip_stats",
    "sketch_distinct_users",
    "dedup_ppjoin_shingles",
    "dedup_ppjoin_zipf",
    "dedup_cc_two_phase",
    # Freshness SLA: the 35 rows whose last hard driver-green evidence
    # dates to round 5 — after this window no registry row's driver
    # evidence is older than round 6
    "events_ohlc_bars",
    "events_pattern_sessions",
    "events_rate_anomaly",
    "events_retention_cohorts",
    "events_rolling_median",
    "events_top_session_paths",
    "kv_consistent_hash_movement",
    "layout_delta_varint_estimate",
    "layout_partition_prune_advisor",
    "layout_range_partition_plan",
    "layout_rle_run_estimate",
    "layout_zorder_skip_measure",
    "maintenance_compaction_bins",
    "maintenance_ivm_agg_retraction",
    "maintenance_snapshot_diff",
    "mm_embedding_dim_stats",
    "mm_jl_projection",
    "mm_resize_plan",
    "pipeline_cluster_safe_split",
    "pipeline_epoch_shuffle",
    "pipeline_labels_asof_features",
    "pipeline_source_overlap_matrix",
    "sketch_bloom_partition_prune",
    "sketch_cms_join_size",
    "sketch_hll_sliding_union",
    "sketch_kmv_distinct_users",
    "sketch_kmv_source_overlap",
    "skyline_orders_cheap_early",
    "text_heaps_law",
    "text_heaps_law_gutenberg",
    "text_vocab_coverage",
    "text_zipf_fit",
    "udaf_interdecile_value_spread",
    "udaf_median_event_gap",
    "window_ntile_rank_lead",
    # ...and the alphabetically-first round-6 row
    "array_agg_supplier_profile",
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
