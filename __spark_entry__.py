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


# Verification-priority order. The round-1 and round-2 drivers each
# checked exactly the FIRST 50 declared queries (registration order).
# Round-3 rotation goal: after this round, no query's latest green row
# predates the last commit touching its code path. Order: (a) queries
# whose implementation changed in round 2 but whose green rows are
# still from round 1 (the stale set the r2 verdict flagged), (b) the
# rest of the r1-only-verified tail, (c) queries changed in round 3,
# (d) round-2-green queries whose code is unchanged since their row.
# This is ordering only — coverage is always the full set.
_VERIFY_PRIORITY = [
    # --- (a) changed in r2, last verified in r1 — stale rows first ---
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "multimodal_binary_meta",
    "multimodal_decode_stub",
    "multimodal_frame_sample",
    "multimodal_resize_stub",
    # --- (b) rest of the r1-only-verified tail ---
    "dedup_exact",
    "dedup_canonical_mapping",
    "events_hourly_rollup",
    "text_lang_id",
    "text_quality_score",
    "text_token_stats",
    "text_source_profile",
    "text_redact_pii",
    "text_token_doc_frequency",
    "text_mean_token_df",
    "text_repetition_quality",
    "text_lang_corpus_stats",
    "text_fingerprint",
    "p1_project_key_value",
    "p3_hot_reload_predicate",
    "a1_latest_dump_id",
    "a2_argmax_latest_state",
    "a3_a5_available_message_counts",
    "a4_offset_clamp",
    "o1_sorted_file_plan",
    "o2_tail_k_per_partition",
    "o3_limit_top_orders",
    "b1_chunk_plan",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q18_large_volume_orders",
    "rollup_order_revenue",
    "cube_event_activity",
    "setops_customer_cohorts",
    "window_event_metrics",
    "join_semi_anti_customers",
    "sample_stratified_by_lang",
    "sample_train_val_test_split",
    "asof_join_last_purchase",
    "similarity_topk_bruteforce",
    # --- (c) changed in round 3 (need fresh rows) ---
    "funnel_conversion",
    "dedup_ngram_jaccard",
    # --- (d) r2-green, unchanged since their r2 rows ---
    "q1_pricing_summary",
    "flagship_latest_event_per_user",
    "dedup_embedding_cosine",
    "text_winnowing_fingerprints",
    "f_scalar_surface",
    "multimodal_feature_stub",
    "sessionize_events",
    "q17_small_quantity_revenue",
    "q16_supplier_diversity",
    "window_rolling_hour",
    "embedding_corpus_stats",
    "q4_order_priority_check",
    "q10_returned_items",
    "q12_lines_priority",
    "q14_promo_revenue",
    "q6_forecast_revenue",
    "q19_disjunctive_predicates",
    "window_distribution_metrics",
    "q2_cheapest_supplier",
    "pivot_user_event_matrix",
    "stats_numeric_profile",
    "join_range_interval",
    "join_full_outer_reconcile",
    "approx_aggregates",
    "join_salted_skew",
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
    "text_contamination_overlap",
    "stats_exact_percentiles",
    "grouping_sets_order_matrix",
    "pack_training_sequences",
    "sample_domain_mixture",
    "pipeline_clean_dedup_pack",
    "dedup_incremental",
    "timeseries_gap_fill",
    "cohort_retention",
    "multimodal_phash_neardup",
    "stats_key_skew_profile",
    "stats_value_histogram",
    "asof_join_next_purchase",
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
