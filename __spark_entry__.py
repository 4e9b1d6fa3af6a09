"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``kafka_topic_dumper_spark.registry``; this
module is the thin adapter the driver imports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_topic_dumper_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: latest event per user
    (the reference's argmax-state pattern per key, SURVEY §2.4 A2)."""
    return registry.QUERIES["flagship_latest_event_per_user"](spark, SMOKE_SF_DIR)


# Verification-priority order. Each round's driver checks the FIRST ~50
# declared queries, so this list is rotated per round. Round-6 rotation
# (r5 verdict, item 1): (a) queries NEW this round, (b) the 29 queries
# whose latest driver row is round 2 — analytics/tpch_full/packing
# changed in the round-5 broadcast sweep AFTER those rows, (c) the rest
# of the r3/r4-stamped backlog, (d) the 50 fresh r5 rows.
# This is ordering only — coverage is always the full set.
_VERIFY_PRIORITY = [
    # --- (a) NEW round-6 rows (never driver-stamped) ---
    "text_bm25_topk",
    "sample_domain_temperature",
    "similarity_knn_graph",
    "layout_zorder_events",
    "text_bpe_pair_counts",
    "text_bpe_merges",
    "text_quality_classifier",
    "pipeline_tokenize_pack_ids",
    "retrieval_hybrid_rrf",
    "similarity_mutual_knn_clusters",
    "text_bpe_encode",
    "pipeline_quality_ensemble",
    "dedup_quality_survivor",
    "stats_corpus_drift",
    "dedup_minhash_clusters",
    "streaming_lm_quality",
    "similarity_topk_ivf_trained",
    "streaming_hourly_rollup",
    "dedup_semantic",
    "dedup_semantic_trained",
    "chunk_documents_sliding",
    "epoch_shuffle_order",
    "sample_stratified_per_group",
    "streaming_dedup_exact",
    "dedup_duplicate_spans",
    "similarity_topk_pq",
    "similarity_topk_pq_trained",
    "similarity_topk_pq_stored",
    "streaming_user_sessions",
    "merge_upsert_customers",
    "scd2_user_event_history",
    "similarity_topk_ivfpq",
    "similarity_topk_ivfpq_stored",
    "streaming_merge_latest_state",
    "multimodal_resize_raw",
    "dedup_remove_spans",
    # --- (a') rows whose SEMANTICS changed in round 6 (oracle + impl
    # in lockstep: exclusive log-end offsets; email-pass audit counts)
    # — their r5 driver stamps describe the old semantics ---
    "a4_offset_clamp",
    "text_redact_pii",
    "sessionize_events",
    "join_salted_skew",
    # --- (b) last driver-stamped in round 2; their source files
    # changed in the r5 broadcast sweep (r5 verdict item 1) ---
    "multimodal_feature_stub",
    "q17_small_quantity_revenue",
    "q16_supplier_diversity",
    "embedding_corpus_stats",
    "q4_order_priority_check",
    "q10_returned_items",
    "q12_lines_priority",
    "q14_promo_revenue",
    "q6_forecast_revenue",
    "q19_disjunctive_predicates",
    "q2_cheapest_supplier",
    "q7_nation_volume_shipping",
    "q8_nation_market_share",
    "q9_product_profit",
    "q11_important_stock_value",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q20_potential_part_promotion",
    "q21_late_shipping_suppliers",
    "q22_dormant_customers",
    "dedup_cluster_components",
    "stats_exact_percentiles",
    "grouping_sets_order_matrix",
    "pack_training_sequences",
    "sample_domain_mixture",
    "pipeline_clean_dedup_pack",
    "stats_key_skew_profile",
    "multimodal_phash_neardup",
    # --- (c) last driver-stamped round 3/4 ---
    "multimodal_frame_sample",
    "multimodal_resize_stub",
    "text_lang_id",
    "text_quality_score",
    "text_token_stats",
    "text_source_profile",
    "text_token_doc_frequency",
    "text_repetition_quality",
    "text_lang_corpus_stats",
    "text_fingerprint",
    "text_winnowing_fingerprints",
    "o3_limit_top_orders",
    "q1_pricing_summary",
    "rollup_order_revenue",
    "setops_customer_cohorts",
    "join_semi_anti_customers",
    "sample_stratified_by_lang",
    "sample_train_val_test_split",
    # --- (d) fresh r5 rows, events/similarity first (their
    # loaders/kernels changed again this round) ---
    "flagship_latest_event_per_user",
    "events_hourly_rollup",
    "p1_project_key_value",
    "p3_hot_reload_predicate",
    "a1_latest_dump_id",
    "a2_argmax_latest_state",
    "a3_a5_available_message_counts",
    "o1_sorted_file_plan",
    "o2_tail_k_per_partition",
    "b1_chunk_plan",
    "cube_event_activity",
    "window_event_metrics",
    "asof_join_last_purchase",
    "funnel_conversion",
    "f_scalar_surface",
    "approx_aggregates",
    "asof_join_next_purchase",
    "cohort_retention",
    "join_full_outer_reconcile",
    "join_range_interval",
    "pivot_user_event_matrix",
    "stats_numeric_profile",
    "stats_value_histogram",
    "timeseries_gap_fill",
    "window_distribution_metrics",
    "window_rolling_hour",
    "similarity_topk_lsh",
    "similarity_topk_lsh_stored",
    "similarity_topk_ivf_stored",
    "embedding_quantize_int8",
    "similarity_topk_ivf",
    "similarity_topk_bruteforce",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_incremental",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q18_large_volume_orders",
    "text_contamination_overlap",
    "text_bigram_lm_quality",
    "pipeline_quality_dedup_pack",
    "text_mean_token_df",
    "dedup_exact",
    "dedup_canonical_mapping",
    "multimodal_binary_meta",
    "multimodal_decode_stub",
]


def _ordered(mapping: dict) -> dict:
    front = {n: mapping[n] for n in _VERIFY_PRIORITY if n in mapping}
    rest = {n: v for n, v in mapping.items() if n not in front}
    return {**front, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.10."""
    return _ordered(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return _ordered(dict(registry.ORACLES))
