"""Measured scaling curve: run the bench headline set at every testdata
SF and report per-query sf0.01 -> sf0.1 time ratios (data grows 10x).

A ratio well under 10 at these sizes means fixed per-query overhead
(planning, task launch) still dominates; what matters for the 100 TB
argument is that NO query grows super-linearly (ratio > ~10 would flag a
quadratic pair-explosion or a driver-side bottleneck).

With ``--with-sf1`` the curve gains a fourth decade: the most expensive
queries also run against the synthetic sf1 stretch (tools/stretch_sf.py,
10x sf0.1 with natural workload shape) and the report records the
sf0.1->sf1 growth exponent log10(t_1/t_0.1) per query — ~1.0 is linear,
>1 flags super-linear growth at the decade where per-query fixed
overhead no longer masks it.

Usage: python tools/scaling_curve.py [out.json] [--with-sf1]
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mit_6_5840_mapreduce_with_go_spark.session import get_spark

import __spark_entry__ as entrymod
from bench import HEADLINE

SFS = ["0.001", "0.01", "0.1"]

# the expensive tail measured across the sf0.01 -> sf0.1 -> sf1 decades
SF1_QUERIES = [
    "sim_tfidf_topk",
    "agg_distinct_parts_per_supplier",
    "window_running_supplier_revenue",
    "sim_topk_ivf",
    "kv_cas_replay",
    "sim_bm25_topk",
    "mm_pca_power_iteration",
    "dedup_minhash_lsh",
    "vocab_bpe_merges",
    "sim_topk_pq_adc",
    # round-6 additions: the round-5 multimodal flagships most likely to
    # hide superlinear growth (image dedup's pair count grows ~n^2/256^2
    # past ~1k docs on the synthetic corpus — see multimodal5.py)
    "mm_dedup_image_dhash",
    "mm_decode_jpeg_color_stats",
    # round-7 additions: the container-ingest family (single sf1 points
    # existed in .sf1_mirror_r6.log; these give the decade exponents)
    "mm_decode_gzip_stats",
    "mm_decode_bmp_stats",
    "mm_decode_tar_stats",
    "mm_decode_zip_stats",
    "mm_webdataset_ingest_stats",
    "mm_decode_jpeg_progressive_stats",
    # and the round-7 queries themselves
    "mm_decode_warc_stats",
    "mm_decode_auto_dispatch_stats",
    "mm_decode_tar_pax_stats",
    "mm_decode_zip_stream_stats",
    "mm_warc_http_stats",
    "text_utf8_validation_stats",
    "mm_decode_zlib_stats",
    "text_url_host_stats",
    "mm_decode_png_palette_stats",
    "mm_exif_orientation_stats",
    # round-8 additions (VERDICT r7 #4): the shuffle-heavy families the
    # mirror had not yet covered at sf1 — dedup LSH/banding variants,
    # the remaining ANN index family, the BM25/hybrid retrieval stack,
    # the graph family (cohort-bounded, see SCALING.md), kv shard ops,
    # sessionization — plus the round-8 queries themselves.
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_simhash_xengine",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_semdedup",
    "dedup_repeated_spans",
    "dedup_incremental_batch",
    "dedup_containment",
    "sim_topk_bruteforce",
    "sim_topk_lsh",
    "sim_topk_ivfpq",
    "sim_ivf_probe_sweep",
    "sim_range_search_lsh",
    "sim_bm25_prf_expansion",
    "sim_hybrid_rrf",
    "sim_mmr_rerank",
    "graph_pagerank_dup_clusters",
    "graph_triangle_census",
    "graph_lpa_communities",
    "kv_last_writer_wins",
    "kv_shard_distribution",
    "kv_consistent_hash_movement",
    "events_sessionization",
    # round-8 queries
    "mm_warc_source_stats",
    "mm_wet_source_stats",
    "mm_parquet_footer_stats",
    "mm_decode_mp3_stats",
    "mm_decode_flac_stats",
    "mm_decode_gif_anim_stats",
    "stream_kv_cas_final_state",
    "stream_ewma_final_state",
    "stream_kmv_final_state",
    # late round-8 additions (crawl frontier, table formats, audio tags,
    # dirty CSV, DSIR, 16-bit/tRNS PNG)
    "mm_decode_zstd_stats",
    "mm_decode_avro_stats",
    "mm_id3_tags_stats",
    "ingest_csv_permissive_stats",
    "crawl_sitemap_stats",
    "crawl_robots_stats",
    "text_html_links_stats",
    "crawl_url_frontier_stats",
    "curation_dsir_weights",
    "mm_decode_png16_trns_stats",
    "mm_decode_tfrecord_stats",
    "mm_tfrecord_source_stats",
    "mm_safetensors_stats",
    "mm_decode_npz_stats",
    "dedup_ppjoin_shingles",
    "dedup_cc_two_phase",
    # round-9 additions: the natural-text PPJoin leg (the evidence that
    # prefix filtering scales on realistic element frequencies) and the
    # politeness scheduler completing the crawl stack
    "dedup_ppjoin_zipf",
    "crawl_schedule_stats",
    "mm_any_auto_dispatch_stats",
    "mm_decode_orc_stats",
    "table_delta_log_replay",
    "table_delta_time_travel",
    "table_iceberg_manifest_census",
    "stream_frontier_final_state",
    # round-9 mirror extension (VERDICT r8 #4): the shuffle-heavy /
    # pair-generating families not yet covered at sf1 — graph k-hop,
    # the bitmap/layout stack, the curation stage pipeline, sliding
    # sketches, session-path/cohort events, basket mining, and the
    # remaining join/split stages
    "graph_khop_reachability",
    "layout_zorder_buckets",
    "layout_delta_varint_estimate",
    "layout_rle_run_estimate",
    "layout_partition_prune_advisor",
    "layout_zorder_skip_measure",
    "layout_range_partition_plan",
    "bitmap_type_day_overlap",
    "pipeline_paragraph_dedup",
    "pipeline_group_split",
    "pipeline_cluster_safe_split",
    "pipeline_source_overlap_matrix",
    "pipeline_domain_cap",
    "pipeline_pack_sequences",
    "pipeline_epoch_shuffle",
    "pipeline_pretrain_corpus",
    "pipeline_chunk_documents",
    "sketch_kmv_source_overlap",
    "sketch_hll_sliding_union",
    "sketch_cms_sliding_counts",
    "sketch_bloom_partition_prune",
    "events_top_session_paths",
    "events_markov_transitions",
    "events_retention_cohorts",
    "events_pattern_sessions",
    "events_changepoint_binary_seg",
    "basket_frequent_triples",
    "basket_association_rules",
    "cluster_kmeans_embeddings",
    "udtf_doc_sentences_arrow",
    "asof_join_next_purchase_after_error",
    "maintenance_snapshot_diff",
    # round-10 queries
    "mm_decode_zstd_dict_stats",
    "mm_zst_source_stats",
    "mm_zst_seekable_stats",
    # round-10 extension (VERDICT r9 #1): the FULL registry —
    # every remaining registered query gains a decade row, so the
    # sf1 mirror no longer has an unmeasured tail
    "anti_customers_without_orders",
    "array_agg_supplier_profile",
    "asof_join_last_order_before_event",
    "audit_benford_prices",
    "audit_data_contracts",
    "audit_order_lineitem_recon",
    "behavior_journey_similarity",
    "bool_agg_discount_profile",
    "cluster_silhouette_simplified",
    "cube_status_priority",
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_minhash_pr_eval",
    "dedup_minhash_xengine",
    "dedup_pairs_edit_distance",
    "dedup_ppjoin_capped",
    "dedup_simhash",
    "eval_ann_sign_test",
    "eval_calibration_bins",
    "eval_conformal_coverage",
    "eval_markov_next_event",
    "eval_quality_auc",
    "eval_threshold_sweep",
    "events_ab_welch_t",
    "events_attribution_models",
    "events_cusum_drift",
    "events_ewma_value",
    "events_funnel_conversion",
    "events_gap_fill_hourly",
    "events_holt_smoothing",
    "events_hourly_type_counts",
    "events_json_props_extract",
    "events_kaplan_meier",
    "events_leadlag_xcorr",
    "events_mad_outliers",
    "events_ohlc_bars",
    "events_rate_anomaly",
    "events_rolling_median",
    "events_seasonal_naive_eval",
    "events_seasonality_profile",
    "events_theilsen_daily_trend",
    "events_time_weighted_avg",
    "events_trailing_hour_stats",
    "events_user_activity",
    "events_value_histogram",
    "events_value_outliers",
    "events_value_trend",
    "groupingsets_flag_status",
    "join_cross_region_nation",
    "join_full_outer_nation_balance",
    "join_segment_order_stats",
    "kv_get_lookup",
    "maintenance_compaction_bins",
    "maintenance_ivm_agg_retraction",
    "maintenance_ivm_join_view",
    "mm_any_auto_quarantine_stats",
    "mm_audio_vad_segments",
    "mm_binary_features",
    "mm_container_auto_dispatch_stats",
    "mm_decode_frames",
    "mm_decode_gif_stats",
    "mm_decode_jpeg422_stats",
    "mm_decode_jpeg_progressive_color_stats",
    "mm_decode_jpeg_stats",
    "mm_decode_png_stats",
    "mm_decode_ppm_stats",
    "mm_decode_qoi_stats",
    "mm_decode_quarantine_stats",
    "mm_decode_wav_stats",
    "mm_decode_zstd_entropy_stats",
    "mm_dedup_audio_fingerprint",
    "mm_dedup_image_pr_eval",
    "mm_embedding_dim_stats",
    "mm_embedding_drift_psi",
    "mm_jl_projection",
    "mm_quantize_embeddings",
    "mm_resize_plan",
    "mm_video_frame_sample",
    "mm_video_keyframes",
    "mm_video_shot_boundaries",
    "mr_doc_line_counts",
    "mr_inverted_index",
    "mr_nocrash_stats",
    "mr_wordcount",
    "mr_wordcount_gutenberg",
    "percentile_prices_by_status",
    "pii_doc_redaction",
    "pii_scrub_stats",
    "pipeline_contamination_check",
    "pipeline_corpus_composition",
    "pipeline_curated_documents",
    "pipeline_drop_reasons",
    "pipeline_labels_asof_features",
    "pipeline_mixture_weights",
    "pipeline_mixture_weights_exact",
    "pipeline_padding_waste",
    "pipeline_quality_resample",
    "pipeline_stratified_sample_by_lang",
    "pipeline_train_val_test_split",
    "pipeline_weighted_sample",
    "pivot_qty_by_linestatus",
    "posexplode_doc_tokens",
    "privacy_dp_noisy_counts",
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "profile_fk_candidates",
    "profile_orders_columns",
    "q10_returned_item_customers",
    "q11_important_parts",
    "q12_priority_lateness",
    "q13_customer_order_distribution",
    "q14_promo_revenue_pct",
    "q15_top_supplier",
    "q16_supplier_diversity",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_revenue",
    "q1_pricing_summary",
    "q20_dominant_part_suppliers",
    "q21_sole_blame_suppliers",
    "q22_inactive_wealthy_customers",
    "q2_min_cost_supplier",
    "q3_top_revenue_orders",
    "q4_late_shipment_orders",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "range_join_error_context",
    "rollup_flag_status",
    "salted_user_event_counts",
    "sample_hash_orders",
    "scalar_datetime_breadth",
    "scalar_order_dates",
    "scalar_part_features",
    "scalar_string_breadth",
    "scalar_subquery_near_max",
    "scd2_user_value_history",
    "semi_customers_with_orders",
    "setop_multiset_lineflags",
    "setop_nations_cust_vs_supp",
    "sim_ann_ndcg_eval",
    "sim_ann_recall_eval",
    "sim_ivf_incremental_update",
    "sim_label_cohesion",
    "sim_matryoshka_prefix_recall",
    "sketch_cms_join_size",
    "sketch_countmin_user_counts",
    "sketch_distinct_users",
    "sketch_kmv_distinct_users",
    "sketch_quantile_histogram",
    "skyline_orders_cheap_early",
    "stats_approx_groupby_eval",
    "stats_chi2_independence",
    "stats_correlation_matrix",
    "stats_diff_in_diff",
    "stats_key_skew_profile",
    "stats_ks_two_sample",
    "stats_lorenz_gini",
    "stats_poisson_bootstrap_ci",
    "stats_price_moments",
    "stats_shrunken_source_value",
    "stats_winsorized_moments",
    "stream_cdc_final_state",
    "subquery_above_nation_avg_balance",
    "text_boilerplate_ngrams",
    "text_bpe_token_count",
    "text_char_entropy",
    "text_collocations_pmi",
    "text_fingerprint",
    "text_heaps_law",
    "text_heaps_law_gutenberg",
    "text_keywords_tfidf",
    "text_lang_guess",
    "text_langid_confusion",
    "text_ngram_novelty",
    "text_phrase_search",
    "text_quality_classifier_linear",
    "text_quality_score",
    "text_repetition_quality",
    "text_token_stats",
    "text_tokenizer_fertility",
    "text_unigram_logprob",
    "text_vocab_coverage",
    "text_zipf_fit",
    "topk_expensive_orders",
    "udaf_interdecile_value_spread",
    "udaf_median_event_gap",
    "udtf_doc_sentences",
    "unpivot_customer_metrics",
    "vocab_bpe_apply",
    "vocab_bpe_roundtrip",
    "window_dist_rank_breadth",
    "window_first_last_ignore_nulls",
    "window_lag_order_gap_days",
    "window_ntile_rank_lead",
    "window_top3_orders_per_customer",
]


def _sf1_dir() -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, ".sf1_stretch")
    if not os.path.exists(os.path.join(out, "lineitem.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(root, "tools", "stretch_sf.py"), out],
            check=True,
        )
    return out


def measure_sf1(spark, queries) -> dict:
    """Times for SF1_QUERIES at sf0.01 / sf0.1 / sf1 plus per-query
    growth exponents for the last decade."""
    dirs = {
        "0.01": "/root/testdata/sf0.01",
        "0.1": "/root/testdata/sf0.1",
        "1": _sf1_dir(),
    }
    times: dict[str, dict[str, float]] = {q: {} for q in SF1_QUERIES}
    for sf, d in dirs.items():
        queries["q1_pricing_summary"](spark, d).write.format("noop").mode(
            "overwrite"
        ).save()
        for name in SF1_QUERIES:
            samples = []
            for _ in range(2):
                t0 = time.time()
                queries[name](spark, d).write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
            times[name][sf] = round(min(samples), 3)
    exponents = {
        q: round(math.log10(t["1"] / t["0.1"]), 2) for q, t in times.items()
    }
    return {
        "queries": times,
        "growth_exponent_01_to_1": exponents,
        "superlinear_queries": [q for q, e in exponents.items() if e > 1.0],
    }


def main() -> None:
    spark = get_spark("scaling_curve")
    queries = entrymod.queries()
    results: dict[str, dict[str, float]] = {q: {} for q in HEADLINE}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        # JVM/codegen warm-up, excluded from timings
        queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        for name in HEADLINE:
            fn = queries[name]
            samples = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
            results[name][sf] = round(min(samples), 3)

    report = {
        "sfs": SFS,
        "queries": results,
        "ratio_01_to_1": {
            q: round(r["0.1"] / r["0.01"], 2) if r.get("0.01") else None
            for q, r in results.items()
        },
    }
    superlinear = [q for q, v in report["ratio_01_to_1"].items() if v and v > 10]
    report["superlinear_queries"] = superlinear
    if "--with-sf1" in sys.argv:
        report["sf1"] = measure_sf1(spark, queries)
    out = json.dumps(report, indent=1)
    paths = [a for a in sys.argv[1:] if not a.startswith("--")]
    if paths:
        with open(paths[0], "w") as f:
            f.write(out + "\n")
    print(out)


if __name__ == "__main__":
    main()
