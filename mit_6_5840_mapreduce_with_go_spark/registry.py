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
# families, and the round-5/6 multimodal suite (all 50/50 green --
# CORRECTNESS_r01-r06.json, cumulative 231/266).  This round-7 window
# CLOSES THE LEDGER: the 35 queries that have never had a driver-green
# row (led by the 7 round-6 container/codec queries, then the
# stats/events/text/audit tranche), the 11 new round-7 queries (WARC,
# HTTP-in-WARC, auto-dispatch, PAX tar, streamed ZIP, UTF-8 validation,
# zlib, URL host analytics, palette PNG, EXIF, corrupt-record
# quarantine), and 4 regression re-verification rows from the
# round-1/2 era (continuity mr_wordcount, q1/q18, dedup_minhash_lsh).
# Cumulative driver-verified after this window: 277/277 -- every
# registered query at least once.  Everything rotated out stays
# mirror-checked by tools/check_correctness.py over all queries.
WINDOW_PRIORITY: list[str] = [
    # Round-6 container/codec queries (added after the r6 rotation)
    "mm_decode_jpeg422_stats",
    "mm_decode_jpeg_progressive_color_stats",
    "mm_decode_gzip_stats",
    "mm_decode_bmp_stats",
    "mm_decode_tar_stats",
    "mm_webdataset_ingest_stats",
    "mm_decode_zip_stats",
    # Round-7 additions: WARC, HTTP envelope (chunked), magic-byte
    # dispatch, PAX tar, bit-3 ZIP
    "mm_decode_warc_stats",
    "mm_warc_http_stats",
    "mm_decode_auto_dispatch_stats",
    "mm_decode_tar_pax_stats",
    "mm_decode_zip_stream_stats",
    "text_utf8_validation_stats",
    "mm_decode_zlib_stats",
    "text_url_host_stats",
    "mm_decode_png_palette_stats",
    "mm_exif_orientation_stats",
    "mm_decode_quarantine_stats",
    # The stats/events/text/audit tranche (never driver-verified)
    "profile_orders_columns",
    "udtf_doc_sentences",
    "events_value_histogram",
    "udtf_doc_sentences_arrow",
    "sim_label_cohesion",
    "eval_ann_sign_test",
    "stats_key_skew_profile",
    "profile_fk_candidates",
    "stats_approx_groupby_eval",
    "audit_order_lineitem_recon",
    "audit_data_contracts",
    "stats_shrunken_source_value",
    "audit_benford_prices",
    "stats_correlation_matrix",
    "stats_ks_two_sample",
    "stats_poisson_bootstrap_ci",
    "stats_diff_in_diff",
    "text_langid_confusion",
    "text_bpe_token_count",
    "text_phrase_search",
    "events_value_trend",
    "events_value_outliers",
    "events_seasonality_profile",
    "events_mad_outliers",
    "events_seasonal_naive_eval",
    "events_theilsen_daily_trend",
    "events_holt_smoothing",
    "vocab_bpe_roundtrip",
    # Regression re-verification (r01/r02-era rows)
    "mr_wordcount",
    "q1_pricing_summary",
    "q18_large_volume_orders",
    "dedup_minhash_lsh",
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
        multimodal8,
        multimodal9,
        multimodal10,
        multimodal11,
        multimodal12,
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
