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
# a ROLLING REGRESSION GATE.  The round-9 window: the 15 round-8
# post-freeze queries (the only rows with no hard driver-green record —
# container formats, crawl frontier, PPJoin/CC, CSV, DSIR), 9 NEW
# round-9 queries (politeness scheduler, natural-text PPJoin, total
# triage + quarantine census, ORC footer, Delta log replay + time
# travel, Iceberg census, streaming-frontier final state), 2 CHANGED queries (robots $-anchor fix + corpus
# extension; image-builder refactor), and the 26 STALEST driver-green
# rows (last verified in round 2: the TPC-H tranche and the first
# ANN/text rows) — oldest evidence refreshes first.  Everything rotated out stays
# mirror-checked by tools/check_correctness.py over all queries at
# three SFs.
WINDOW_PRIORITY: list[str] = [
    # Round-8 post-freeze queries: registered after the round-8 window
    # froze, so these 15 are the only rows with no hard driver-green
    # record (judge mirror-verified all 15 in round 8) — head of the
    # round-9 window per VERDICT r8 #1.
    "mm_decode_avro_stats",
    "text_html_links_stats",
    "crawl_sitemap_stats",
    "crawl_url_frontier_stats",
    "curation_dsir_weights",
    "dedup_ppjoin_shingles",
    "dedup_cc_two_phase",
    "mm_decode_zstd_stats",
    "mm_safetensors_stats",
    "mm_decode_npz_stats",
    "mm_decode_tfrecord_stats",
    "mm_tfrecord_source_stats",
    "mm_container_auto_dispatch_stats",
    "ingest_csv_permissive_stats",
    "mm_id3_tags_stats",
    # New round-9 queries (never driver-verified)
    "crawl_schedule_stats",
    "dedup_ppjoin_zipf",
    "mm_any_auto_dispatch_stats",
    "mm_decode_orc_stats",
    "table_delta_log_replay",
    "table_iceberg_manifest_census",
    "mm_any_auto_quarantine_stats",
    "table_delta_time_travel",
    "stream_frontier_final_state",
    # Changed this round (re-verification): the robots $-anchor fix
    # extended the planted corpus; the image-payload builder refactor
    # touched the image auto-dispatch corpus
    "crawl_robots_stats",
    "mm_decode_auto_dispatch_stats",
    # Stalest rows: last driver-verified in round 2 (first 24 of 45;
    # the remaining 21 r2-era rows head the round-10 backlog)
    "q2_min_cost_supplier",
    "q3_top_revenue_orders",
    "q4_late_shipment_orders",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_item_customers",
    "q11_important_parts",
    "q12_priority_lateness",
    "q13_customer_order_distribution",
    "q14_promo_revenue_pct",
    "q15_top_supplier",
    "q16_supplier_diversity",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_dominant_part_suppliers",
    "q21_sole_blame_suppliers",
    "q22_inactive_wealthy_customers",
    "pipeline_train_val_test_split",
    "sim_topk_bruteforce",
    "sim_topk_ivf",
    "sim_topk_lsh",
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
