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
# a ROLLING REGRESSION GATE: 12 NEW round-8 queries (MP3/FLAC/animated-
# GIF metadata, the WARC + WET file-source pair, the parquet footer
# walk, 16-bit/tRNS PNG, RFC 9309 robots, 4 streaming final-state
# projections), 3 queries whose code CHANGED this round (the BM25 pair
# — pass-2 decomposition + postings-lever change — and adaptive-k
# SemDeDup), and the 35 STALEST driver-green rows (all last verified
# in round 1) — so the oldest evidence refreshes first.  Everything
# rotated out (and the round-8 queries that did not fit, led by
# text_html_links_stats) stays mirror-checked by
# tools/check_correctness.py over all queries at three SFs.
WINDOW_PRIORITY: list[str] = [
    # New round-8 queries (never driver-verified)
    "mm_decode_mp3_stats",
    "mm_decode_flac_stats",
    "mm_decode_gif_anim_stats",
    "mm_warc_source_stats",
    "mm_wet_source_stats",
    "mm_parquet_footer_stats",
    "mm_decode_png16_trns_stats",
    "stream_kv_cas_final_state",
    "stream_ewma_final_state",
    "stream_kmv_final_state",
    "stream_cdc_final_state",
    "crawl_robots_stats",
    # Changed this round (re-verification)
    "sim_bm25_prf_expansion",
    "sim_bm25_topk",
    "dedup_semdedup",
    # Stalest rows: last driver-verified in round 1
    "agg_distinct_parts_per_supplier",
    "anti_customers_without_orders",
    "cluster_kmeans_embeddings",
    "cube_status_priority",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_pairs_edit_distance",
    "dedup_simhash_xengine",
    "events_hourly_type_counts",
    "events_json_props_extract",
    "events_user_activity",
    "join_cross_region_nation",
    "join_full_outer_nation_balance",
    "join_segment_order_stats",
    "kv_last_writer_wins",
    "mm_binary_features",
    "mm_decode_frames",
    "mm_quantize_embeddings",
    "mr_doc_line_counts",
    "mr_inverted_index",
    "mr_nocrash_stats",
    "pipeline_stratified_sample_by_lang",
    "pivot_qty_by_linestatus",
    "range_join_error_context",
    "rollup_flag_status",
    "scalar_order_dates",
    "scalar_part_features",
    "semi_customers_with_orders",
    "setop_nations_cust_vs_supp",
    "subquery_above_nation_avg_balance",
    "topk_expensive_orders",
    "window_lag_order_gap_days",
    "window_running_supplier_revenue",
    "window_top3_orders_per_customer",
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
