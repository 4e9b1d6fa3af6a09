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
# declared queries, so this list is rotated per round. Round-19
# rotation (the plan recorded in PARITY.md round-18 paragraph): after
# the r18 driver stamped the first 50 (the 49-row r14 cohort +
# graph_pagerank_dangling), the stalest remaining rows are the REST of
# the r15-stamped cohort (49 rows, starting at text_vocab_growth) —
# promoted to the front; the head of the r16 cohort (approx_aggregates)
# fills the 50-row window. The freshly r18-stamped 50 move to the
# back. After r19 no stamp is older than r16 — the steady three-round
# rotation for a 199-row registry.
# Ordering only — coverage is always the full set.
_VERIFY_PRIORITY = [
    # --- (a) rest of the r15-stamped cohort (49) — oldest stamps, leads r19 ---
    "text_vocab_growth",
    "graph_hits_scores",
    "stats_interarrival_quartiles",
    "p3_hot_reload_predicate",
    "a1_latest_dump_id",
    "a2_argmax_latest_state",
    "a3_a5_available_message_counts",
    "o1_sorted_file_plan",
    "o2_tail_k_per_partition",
    "f_scalar_surface",
    "b1_chunk_plan",
    "flagship_latest_event_per_user",
    "q3_shipping_priority",
    "q5_region_revenue",
    "events_hourly_rollup",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_canonical_mapping",
    "dedup_incremental",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "similarity_topk_bruteforce",
    "embedding_quantize_int8",
    "similarity_topk_lsh",
    "similarity_topk_lsh_stored",
    "similarity_topk_ivf",
    "similarity_topk_ivf_stored",
    "text_bigram_lm_quality",
    "text_mean_token_df",
    "text_contamination_overlap",
    "multimodal_binary_meta",
    "multimodal_decode_stub",
    "asof_join_last_purchase",
    "asof_join_next_purchase",
    "cube_event_activity",
    "window_event_metrics",
    "q18_large_volume_orders",
    "timeseries_gap_fill",
    "cohort_retention",
    "window_rolling_hour",
    "window_distribution_metrics",
    "funnel_conversion",
    "pivot_user_event_matrix",
    "stats_value_histogram",
    "stats_numeric_profile",
    "join_range_interval",
    "join_full_outer_reconcile",
    "dedup_editdist_join_realvocab",
    # --- (b) head of the r16 cohort — fills the 50-row r19 window ---
    "approx_aggregates",
    # --- (c) rest of the r16-stamped cohort (49) ---
    "pipeline_quality_dedup_pack",
    "a4_offset_clamp",
    "dedup_quality_survivor",
    "dedup_minhash_clusters",
    "dedup_duplicate_spans",
    "dedup_remove_spans",
    "dedup_semantic",
    "similarity_knn_graph",
    "similarity_mutual_knn_clusters",
    "similarity_topk_pq",
    "similarity_topk_pq_stored",
    "similarity_topk_ivfpq",
    "similarity_topk_ivfpq_stored",
    "text_redact_pii",
    "retrieval_hybrid_rrf",
    "stats_corpus_drift",
    "pipeline_quality_ensemble",
    "text_quality_classifier",
    "text_bm25_topk",
    "multimodal_feature_stub",
    "multimodal_resize_raw",
    "sessionize_events",
    "q17_small_quantity_revenue",
    "q16_supplier_diversity",
    "embedding_corpus_stats",
    "q4_order_priority_check",
    "q10_returned_items",
    "q12_lines_priority",
    "q14_promo_revenue",
    "q6_forecast_revenue",
    "q19_disjunctive_predicates",
    "join_salted_skew",
    "merge_upsert_customers",
    "scd2_user_event_history",
    "pipeline_tokenize_pack_ids",
    "sample_domain_temperature",
    "chunk_documents_sliding",
    "epoch_shuffle_order",
    "sample_stratified_per_group",
    "layout_zorder_events",
    "text_bpe_pair_counts",
    "streaming_hourly_rollup",
    "streaming_lm_quality",
    "streaming_dedup_exact",
    "streaming_merge_latest_state",
    "streaming_user_sessions",
    "q2_cheapest_supplier",
    "q7_nation_volume_shipping",
    "dedup_editdist_prefix_stored",
    # --- (d) r17-stamped cohort (50) ---
    "q8_nation_market_share",
    "q9_product_profit",
    "q11_important_stock_value",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q20_potential_part_promotion",
    "q21_late_shipping_suppliers",
    "q22_dormant_customers",
    "pack_training_sequences",
    "sample_domain_mixture",
    "pipeline_clean_dedup_pack",
    "stats_exact_percentiles",
    "stats_key_skew_profile",
    "dedup_cluster_components",
    "grouping_sets_order_matrix",
    "multimodal_phash_neardup",
    "q1_pricing_summary",
    "o3_limit_top_orders",
    "rollup_order_revenue",
    "setops_customer_cohorts",
    "join_semi_anti_customers",
    "sample_stratified_by_lang",
    "sample_train_val_test_split",
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
    "text_bpe_merges",
    "text_bpe_encode",
    "similarity_topk_ivf_trained",
    "dedup_semantic_trained",
    "similarity_topk_pq_trained",
    "streaming_sessionize_state",
    "multimodal_decode_png",
    "streaming_dedup_minhash",
    "text_quality_calibrated_rank",
    "sample_token_budget",
    "multimodal_wav_features",
    "multimodal_decode_gif",
    "multimodal_avi_frames",
    "p1_project_key_value",
    "multimodal_decode_mjpeg",
    "streaming_hopping_rollup",
    # --- (e) r18-stamped cohort (50) — freshest stamps, go last ---
    "sample_weighted_priority",
    "graph_kcore",
    "asof_join_tolerance",
    "stats_rolling_anomaly",
    "layout_hilbert_events",
    "embedding_pca_project",
    "streaming_rolling_anomaly",
    "similarity_recall_eval",
    "multimodal_phash_dct",
    "multimodal_phash_dct_neardup",
    "stats_cusum_changepoints",
    "text_kneser_ney_quality",
    "asof_join_nearest",
    "text_source_entropy",
    "text_source_snapshot_jsd",
    "stats_benford_profile",
    "multimodal_wav_spectral",
    "stats_mad_by_type",
    "graph_cotrading_projection",
    "multimodal_decode_jpeg",
    "streaming_interval_join",
    "similarity_topk_rp",
    "text_unicode_normalize",
    "graph_pagerank_supplier_network",
    "dedup_ngram_containment",
    "dedup_setsim_prefix_join",
    "curation_pareto_frontier",
    "text_cms_heavy_hitters",
    "dedup_bloom_admission",
    "dedup_editdist_join",
    "text_hll_shingle_cardinality",
    "streaming_cms_heavy_hitters",
    "stats_equidepth_histogram",
    "stats_groupwise_ols",
    "graph_triangle_counts",
    "streaming_hll_cardinality",
    "graph_clustering_coefficient",
    "stats_event_transitions",
    "graph_label_propagation",
    "streaming_bloom_admission",
    "source_orc_roundtrip",
    "source_jsonl_roundtrip",
    "source_csv_roundtrip",
    "stats_hourly_autocorrelation",
    "text_tfidf_keywords",
    "stats_gini_by_segment",
    "stats_hourly_ohlc",
    "graph_pagerank_weighted",
    "stats_ewma_smoothing",
    "graph_pagerank_dangling",
]


def _ordered(mapping: dict) -> dict:
    front = {n: mapping[n] for n in _VERIFY_PRIORITY if n in mapping}
    rest = {n: v for n, v in mapping.items() if n not in front}
    return {**front, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.10."""
    return _ordered(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check).

    Lazy oracles (trained-state literals — functions/trained_oracles.py)
    are resolved against the scale factor the driver's correctness
    check runs at (sf=0.01 per contract; env-overridable for local
    experiments)."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    return _ordered(registry.resolve_oracles(sf_dir))
