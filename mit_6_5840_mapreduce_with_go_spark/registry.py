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
# flagships, rounds 3/4 the dedup/ANN/curation/text families, round 5
# the stitched/events/sketch/layout families (all 50/50 green —
# CORRECTNESS_r01–r05.json, cumulative 182/258).  This round-6 window:
# 49 queries that have NEVER had a driver-green row — led by the 15
# round-5 multimodal decode/dedup/video queries, this round's new
# progressive-JPEG decode, and the bench-headline stragglers — plus 1
# continuity row (mr_wordcount).  Cumulative driver-verified after
# this window: 231/259.  Everything rotated out stays mirror-checked
# by tools/check_correctness.py over all queries.
WINDOW_PRIORITY: list[str] = [
    # MapReduce parity headline (continuity row, in every round's window)
    "mr_wordcount",
    # Round-5 multimodal suite: real decoders + video/audio/image dedup
    "mm_decode_ppm_stats",
    "mm_decode_png_stats",
    "mm_decode_jpeg_stats",
    "mm_decode_jpeg_color_stats",
    "mm_decode_gif_stats",
    "mm_decode_qoi_stats",
    "mm_decode_wav_stats",
    "mm_video_frame_sample",
    "mm_video_shot_boundaries",
    "mm_video_keyframes",
    "mm_audio_vad_segments",
    "mm_dedup_image_dhash",
    "mm_dedup_audio_fingerprint",
    "mm_dedup_image_pr_eval",
    "mm_embedding_drift_psi",
    # Round-6 addition: the progressive (SOF2) decode surface
    "mm_decode_jpeg_progressive_stats",
    # Bench-headline stragglers never driver-verified
    "dedup_repeated_spans",
    "sim_ivf_probe_sweep",
    "percentile_prices_by_status",
    # Text / curation breadth
    "text_boilerplate_ngrams",
    "text_quality_classifier_linear",
    "text_unigram_logprob",
    "text_tokenizer_fertility",
    "behavior_journey_similarity",
    # Pipeline / evaluation breadth
    "pipeline_mixture_weights_exact",
    "pipeline_padding_waste",
    "eval_conformal_coverage",
    "eval_markov_next_event",
    "basket_frequent_triples",
    "basket_association_rules",
    # Privacy / PII family
    "pii_doc_redaction",
    "pii_scrub_stats",
    "privacy_l_diversity",
    "privacy_dp_noisy_counts",
    # Relational breadth (scalar/agg/window/setop surfaces)
    "groupingsets_flag_status",
    "stats_price_moments",
    "sample_hash_orders",
    "scalar_string_breadth",
    "scalar_datetime_breadth",
    "bool_agg_discount_profile",
    "scalar_subquery_near_max",
    "events_trailing_hour_stats",
    "unpivot_customer_metrics",
    "salted_user_event_counts",
    "setop_multiset_lineflags",
    "window_first_last_ignore_nulls",
    "posexplode_doc_tokens",
    "array_agg_supplier_profile",
    "window_dist_rank_breadth",
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
