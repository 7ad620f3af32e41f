from etl_mini_spark.queries._base import *  # noqa: F401,F403
from etl_mini_spark.queries._base import _t, _TMP  # noqa: F401

# Registry ordering — the driver's CORRECTNESS gate records the FIRST 50
# entries in registry order, so that window is curated explicitly:
#
# - Round-robin across rounds: queries with a driver-green row in an
#   earlier CORRECTNESS_r*.json yield their slots to queries that have
#   never been driver-verified, to queries whose code changed this
#   round, and to new queries. tests/test_window_rotation.py machine-
#   checks the invariant (every oracle-backed query: driver-green row
#   OR current window slot; no rows-only entry in the window).
# - EVERY query — window and tail — is still differentially verified
#   every round by tests/test_queries_oracle.py at sf0.001 (same
#   DuckDB-oracle check the driver runs at sf0.01).
#
# Round-19 rotation (CORRECTNESS_r18 came back 50/50 green, so every
# round-18 slot owner rotates to the tail) — this EXECUTES the plan
# precomputed in round 18 verbatim:
# (a) the round-19 tier (8 entries, authored round 14 as
#     round19_pending, swept vs DuckDB at sf0.001/sf0.01/sf0.1 and
#     under a bare default session before registration) — never
#     driver-verified, so each holds a slot;
# (b) the 42 re-verify slots drain the STALEST green entries exactly
#     as named in the precomputed plan: the 37 remaining r08-cohort
#     entries, the 4 stalest r09-cohort entries, and the
#     stream_cms_incremental code-change canary (its micro-batch
#     fixture builder was rewritten in round 18). The pre-r09 debt is
#     now EMPTY: r08 37 -> 0, r09 48 -> 44.
# =========================================================================
# ROUND-20 ROTATION PLAN (precomputed mechanically in round 19 from
# CORRECTNESS_r01..r18 + the round-19 window, so the next session
# rotates without rework): register the 6 round20_pending entries
# (6 slots) and spend the remaining 44 slots on 43 of the 44 remaining
# r09-cohort entries plus one code-change canary,
# lexicographic within equal last-green rounds:
#   "agg_histogram", "agg_minmax_by", "agg_percentiles",
#   "agg_pricing_summary", "agg_rollup", "agg_stats_suite",
#   "array_math_suite", "brier_calibration_bins", "calendar_spine_fill",
#   "chi_square_cramers_v", "corpus_top_bigrams", "csv_multiline_quoted",
#   "csv_roundtrip", "dedup_keep_first", "doc_chunks",
#   "dq_duplicate_key_audit", "dq_freshness_sla", "drop_null_required",
#   "embedding_near_dups", "events_new_vs_returning", "filter_term",
#   "filter_time_range", "gini_lorenz", "herfindahl_concentration",
#   "ip_subnet_rollup", "join_inner_revenue", "join_left_counts",
#   "join_star_dims", "kl_divergence_bins", "mutual_information_discrete",
#   "nested_json_extract", "pr_auc_exact", "project_select", "scan_checksum",
#   "seasonal_weekday_index", "sql_groupby_all", "stratified_kfold_assign",
#   "token_pmi_bigrams", "unigram_sampling_table", "upsert_keyed",
#   "url_parse_suite", "wilson_ci_rates", "window_running_total",
#   "minhash_containment",  # canary: minhash_containment — its pair
#   generation was rewritten join-free in round 19 (the postings
#   self-join + checkpoint became the two-window bucket-expansion
#   shape shared with ngram Jaccard), so the code-change canary rule
#   gives it next round's driver re-verification ahead of its natural
#   r18-cohort turn (displacing woe_iv_binning, the lexicographically
#   last of the natural 44)
# (cohort sizes after that drain: r09 44 -> 1 (woe_iv_binning), r10 48,
# ... — round 21 then registers any staged tier and finishes r09 with
# woe_iv_binning plus the stalest r10 entries; add a further
# code-change canary slot only if a shared helper changes.)
# =========================================================================

_DRIVER_WINDOW = [
    "dtw_banded_daily", "ar1_yule_walker", "group_sequential_obf",
    "median_polish_residuals", "consistent_hash_rebalance",
    "storey_pi0_estimate", "zeller_congruence_audit", "mod97_checksum_audit",
    "embedding_centroid_drift", "feature_crosses_hashed",
    "feature_scaler_leakage_safe", "impute_missing_values",
    "interval_union_coverage", "inventory_wac_ledger", "iso_normalize",
    "ks_statistic_2sample", "lift_gains_deciles", "multimodal_binary_ingest",
    "ndjson_corrupt_quarantine", "pareto_front_parts", "pivot_multi_agg",
    "placeholder_extract", "psi_population_stability",
    "quality_threshold_sweep", "sample_weighted_topk", "sanitize_values",
    "set_intersect", "set_union_halves", "stream_interval_join_outer",
    "stream_tumbling_late_drop", "target_encoding_loo", "text_fingerprint",
    "text_lang_id", "text_quality", "text_token_counts", "text_zipf_fit",
    "time_derive_parts", "timeseries_ema", "timeseries_seasonal_decompose",
    "tolerant_select", "topk_limit", "train_test_temporal_split",
    "window_lag_lead", "window_session_30m", "window_tumbling_1h",
    "acf_hourly_lags", "agg_cube", "agg_distinct", "agg_grouping_sets",
    "stream_cms_incremental",
]

_TAIL = [
    # driver-green in earlier rounds (the round-18 window cohort
    # leads); every entry still locally oracle-verified per round at
    # sf0.001 (rows-only entries verified by dedicated pinned tests).
    "hyperloglog_md5_replay", "pcsa_fm_sketch", "knapsack_01_bounded",
    "shamir_secret_reconstruct", "luhn_checksum_audit", "kuiper_two_sample",
    "min_variance_two_asset", "lp_vertex_enumeration", "pit_table_build",
    "gale_shapley_stable", "forecast_seasonal_naive_eval",
    "funnel_with_timeouts", "incremental_agg_merge",
    "incremental_welford_merge", "join_asof_nearest",
    "join_asof_nearest_bucketed", "join_asof_tolerance", "join_salted_skew",
    "minhash_containment", "mixture_temperature_weights",
    "pareto_revenue_curve", "privacy_k_anonymity",
    "rolling_corr_click_purchase", "running_distinct_types", "set_ops_all",
    "sliding_distinct_users_7d", "split_leakage_safe", "sql_pipe_syntax",
    "survival_kaplan_meier", "text_bigram_lm_score", "text_inverted_index",
    "time_since_last_purchase", "timeseries_anomaly_zscore",
    "timeseries_cusum_changepoint", "timeseries_interpolate_linear",
    "trend_theil_sen", "try_arithmetic_suite", "user_activity_streaks",
    "window_rolling_median", "window_time_range_7d", "agg_distinct_salted",
    "agg_weighted_median", "attribution_time_decay",
    "audience_overlap_jaccard", "cdc_apply_log", "class_balance_downsample",
    "constant_columns", "dedup_exact_docs", "dq_referential_integrity",
    "dynamic_partition_overwrite", "tukey_kramer_hsd",
    "simpson_diversity_index", "wilcoxon_signed_rank", "huffman_code_lengths",
    "viterbi_two_state", "secretary_stopping_rule", "critical_path_lookback",
    "privacy_t_closeness", "elo_fixed_ladder", "dbscan_grid_blocked",
    "bm25f_fielded_topk", "textrank_keywords", "kadane_max_swing",
    "ratio_to_report", "rfm_segments", "scd2_late_correction",
    "scd2_point_in_time_join", "seq_packing_bins", "similarity_tfidf_pairs",
    "snapshot_table_diff", "sql_lateral_topn", "sql_q12_late_lines",
    "sql_q15_top_supplier", "sql_q17_small_qty", "sql_q20_promo_suppliers",
    "sql_q21_waiting_supplier", "sql_q4_priority", "sql_q8_mkt_share",
    "sql_q9_product_profit", "sql_recursive_series", "sql_udf_scalar",
    "timeseries_ohlc_twap", "variant_shred_extract", "vocab_oov_coverage",
    "window_tumbling_distinct", "xml_roundtrip", "ab_test_lift",
    "attribution_linear_multitouch", "basket_rules_lift",
    "benford_first_digit", "business_days_to_ship",
    "corpus_curation_pipeline", "corpus_ngram_novelty", "corpus_quota_cap",
    "corpus_skipgram_pairs", "daily_value_bands", "dau_mau_stickiness",
    "doc_keywords_tfidf_topk", "event_transition_matrix", "fifo_lot_matching",
    "pattern_vshape_runs", "interval_scheduling_wis", "lis_events_per_user",
    "soundex_phonetic_groups", "damerau_dl_blocked", "cronbach_alpha_items",
    "icc_oneway_quantity", "krippendorff_alpha_nominal",
    "ransac_integer_line", "adstock_geometric_decay", "mmr_diverse_topk",
    "graph_bfs_circulant", "stream_eviction_twin", "seasonal_mann_kendall",
    "dunns_pairwise_z", "avro_roundtrip", "sql_q6_forecast", "sql_q7_volume",
    "stream_interval_join", "stream_static_enrich", "table_profile",
    "text_near_template", "text_repetition", "time_trunc_suite",
    "token_stats_bpe", "window_value_suite", "zorder_locality",
    "bucketed_join_roundtrip", "churn_gap_flag", "co_purchase_pairs",
    "cohort_retention", "collation_distinct", "corpus_token_entropy",
    "csv_malformed_tolerant", "dedup_canonical_pick", "dedup_repeated_spans",
    "dpp_partitioned_join", "dq_expectations_report", "geo_radius_pairs",
    "graph_khop_reach", "graph_pagerank_converged", "graph_pagerank_parts",
    "graph_triangle_count", "join_asof_bucketed", "join_asof_forward",
    "join_null_safe", "listagg_sorted", "mad_outliers",
    "parquet_schema_evolution", "partitioned_roundtrip", "map_mrr_eval",
    "kmv_distinct_estimate", "graph_hits_hubs_authorities",
    "graph_label_propagation", "shapley_attribution_paths",
    "atkinson_inequality", "nelson_aalen_hazard", "tsb_intermittent_forecast",
    "forecast_error_suite", "snapshot_data_diff", "privacy_l_diversity",
    "window_count_distinct_parity", "vintage_default_curves",
    "sprt_sequential_test", "water_filling_allocation",
    "benjamini_hochberg_fdr", "approx_quantile_sketch", "cdc_scd2_history",
    "corpus_idf", "decontaminate_13gram", "dedup_bloom_prefilter",
    "dedup_clusters", "dedup_incremental", "embedding_quantize",
    "event_path_3gram", "first_touch_attribution", "higher_order_fns",
    "interval_overlap_agg", "json_table_extract", "lateral_tokens_topk",
    "map_fns_suite", "mixture_weighted_sample", "orc_roundtrip",
    "outlier_trim", "pipeline_corpus_filter", "posexplode_tokens",
    "range_bucket_join", "sessionize_events", "skew_diagnostic",
    "sql_q10_returned", "sql_q11_important_stock", "sql_q13_custdist",
    "sql_q14_promo", "sql_q16_supplier_cnt", "sql_q18_large_orders",
    "sql_q19_disjunctive", "sql_q22_global_sales", "sql_q2_min_cost_supplier",
    "sql_q3_shipping", "setjoin_prefix_filter", "geo_knn_topk_equirect",
    "geo_bbox_containment_join", "geo_polyline_track_length",
    "geo_grid_density_hotspots", "window_groups_frame_parity",
    "qualify_rank_of_rank", "sql_quantified_any_all", "sql_grouping_id_sets",
    "sql_agg_filter_clause", "sql_order_nulls_mixed", "sql_pivot_statement",
    "query_likelihood_dirichlet", "text_rake_keywords",
    "text_porter_stems_lite", "rocchio_relevance_vector",
    "text_sentence_stats", "vwap_anchored_monthly",
    "ewma_volatility_riskmetrics", "cash_conversion_cycle",
    "loan_prepay_cpr_schedule", "break_even_cvp", "benford_second_digit",
    "dq_column_entropy_profile", "dq_composite_key_candidates",
    "graph_adamic_adar_linkpred", "graph_local_clustering_coeff",
    "graph_bipartite_projection", "compaction_nfd_bins",
    "snapshot_retention_expiry", "partition_spec_evolution_routing",
    "markov_transition_stationary", "sax_symbolization_paa",
    "theta_method_forecast", "stream_state_ttl_eviction",
    "multimodal_wav_header_real", "price_elasticity_loglog",
    "weibull_median_rank_fit", "sql_named_window_clause",
    "text_accent_fold_dedup", "inventory_safety_stock",
    "did_difference_in_differences", "uplift_two_model_deciles",
    "cuped_variance_reduction", "ab_srm_check", "queueing_little_law_audit",
    "emd_1d_wasserstein", "multimodal_decode_real", "dedup_simhash",
    "embedding_near_dups_lsh", "agg_corr_regr", "int8_quant_cosine_topk",
    "matryoshka_overlap_audit", "rrf_hybrid_fusion", "ndcg_graded_eval",
    "manifest_pruning_audit", "delta_log_replay", "bitemporal_snapshot_query",
    "scd2_scd6_composed", "checkpoint_snapshot_isolation",
    "late_arriving_dimension", "fellegi_sunter_weights",
    "er_threshold_quality", "kalman_filter_1d", "irr_bisection_npv",
    "amortization_schedule", "bond_duration_convexity", "ols_two_predictors",
    "mahalanobis_outliers_2d", "pca_eigen_2d", "gradient_boost_stumps",
    "isotonic_regression_pav", "window_exclude_frames_parity",
    "qualify_filter_parity", "sessions_regex_path", "count_min_sketch_audit",
    "bloom_fpr_audit", "stream_sessionize_differential",
    "stream_cdc_upsert_latest", "geohash_prefix_radius",
    "corpus_amplified_jaccard", "url_canonicalize_dedup",
    "binary_header_metadata", "newsvendor_quantile_policy",
    "graph_kcore_peel", "graph_jaccard_link_prediction", "erlang_c_staffing",
    "weighted_sample_ares", "page_hinkley_drift", "walk_forward_validation",
    "holt_winters_multiplicative", "multimodal_resize_real",
    "multimodal_features_real", "join_asof_last_order", "sql_q5_local_volume",
    "stream_dedup_watermark", "stream_foreachbatch_upsert",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "friedman_test_blocks",
    "cochran_q_raters", "mcnemar_paired_rules", "fleiss_kappa_multi",
    "cliffs_delta_effect", "jonckheere_terpstra_trend", "pettitt_changepoint",
    "grubbs_max_outlier", "chow_structural_break", "theil_inequality_index",
    "xmr_control_chart", "record_breaking_days", "rsi_wilder_14",
    "macd_signal_line", "stochastic_oscillator_kd", "obv_daily_flow",
    "croston_intermittent", "holt_damped_trend", "hurst_rescaled_range",
    "xyz_volatility_classes", "equi_depth_histogram", "quantile_disc_parity",
    "unpivot_include_nulls", "date_arith_edges", "scd6_hybrid_dim",
    "merge_when_clauses", "bankers_rounding_ledger", "decision_stump_gain",
    "jaro_blocked_pairs", "corpus_amplified_gate", "http_paginated_extract",
    "pacf_durbin_levinson", "orderkey_gap_audit", "mean_family_suite",
    "pages_l_trend", "turning_points_test", "bartels_rank_vonneumann",
    "cox_stuart_trend", "stream_rsi_incremental", "mann_whitney_u",
    "roc_auc_exact", "kruskal_wallis_h", "stream_holt_incremental",
    "timeseries_resample_fill", "udf_registry_iso_parts",
    "unpivot_part_metrics", "upsert_null_update", "window_rank_suite",
    "window_sliding_15m", "window_topk_per_group", "kendall_tau_daily",
    "mann_kendall_trend", "cohens_kappa_rules", "mcc_threshold",
    "two_proportion_ztest", "holt_winters_weekly", "max_drawdown_daily",
    "bollinger_bands_7d", "stream_mg_incremental", "relational_division",
    "largest_remainder_allocation", "golden_record_survivorship",
    "null_completeness_matrix", "distinct_ratio_profile",
    "cross_field_consistency", "binary_encoding_suite",
    "iso_week_thursday_rule", "array_set_ops_suite", "hour_of_week_heatmap",
    "interorder_gap_percentiles", "fourier_weekly_coeffs",
    "quantile_cont_parity", "ma_crossover_signals",
    "customer_lifecycle_yearly", "rapid_repeat_events", "knn_label_accuracy",
    "holt_winters_forecast", "sql_keyset_pagination", "eoq_inventory_policy",
    "orders_backlog_aging", "bitmap_presence_rollup", "heavy_hitters_mg",
    "item_item_cosine_topk", "dedup_levenshtein_blocked", "similarity_topk",
    "http_pyds_scan", "order_by_hash", "pivot_type_counts",
    "sample_deterministic", "sample_split_counts", "sample_stratified_docs",
    "set_except", "sql_exists_urgent", "sql_scalar_above_avg",
    "string_fns_suite", "text_redact_pii", "time_tz_trimode",
    "spearman_rank_corr", "anova_oneway_f", "durbin_watson_autocorr",
    "seasonal_strength_eta", "holt_linear_trend", "cohort_ltv_curve",
    "histogram2d_margins", "confusion_matrix_thresholds",
    "feature_hash_collision_audit", "bm25_topk_docs", "char_ngram_profile",
    "regex_extract_all_suite", "graph_degree_histogram",
    "price_volume_mix_decomp", "table_row_checksum", "partition_skew_advisor",
    "privacy_erasure_audit", "shipping_lead_percentiles", "sql_distinct_on",
    "fixed_width_parse", "json_multiline_array_read", "corpus_heaps_law",
    "event_interarrival_expfit", "session_bounce_rate", "text_hapax_ratio",
    "levene_brown_forsythe", "rolling_regression_slope", "wow_movers_topk",
    "runs_test_wald_wolfowitz", "ljung_box_q", "inventory_abc_classes",
    "gaps_islands_order_days", "sql_asof_native_parity",
    "rfm_migration_matrix", "corpus_source_divergence", "growth_mom_yoy",
    "embedding_angle_histogram", "winsorized_mean_trimmed",
    "funnel_conversion", "groupby_date_type", "groupwise_zscore",
    "http_api_extract", "join_anti_no_orders", "join_full_outer",
    "join_range_followups", "join_semi_active", "multimodal_frames",
    "ndjson_roundtrip", "chi_square_cramers_v", "mutual_information_discrete",
    "gini_lorenz", "herfindahl_concentration", "wilson_ci_rates",
    "pr_auc_exact", "brier_calibration_bins", "woe_iv_binning",
    "stratified_kfold_assign", "unigram_sampling_table", "token_pmi_bigrams",
    "url_parse_suite", "ip_subnet_rollup", "calendar_spine_fill",
    "dq_freshness_sla", "dq_duplicate_key_audit", "csv_multiline_quoted",
    "sql_groupby_all", "kl_divergence_bins", "seasonal_weekday_index",
    "events_new_vs_returning", "agg_pricing_summary", "dedup_keep_first",
    "drop_null_required", "filter_term", "filter_time_range",
    "join_inner_revenue", "join_left_counts", "join_star_dims",
    "nested_json_extract", "project_select", "scan_checksum", "upsert_keyed",
    "window_running_total", "agg_histogram", "agg_minmax_by",
    "agg_percentiles", "agg_rollup", "agg_stats_suite", "array_math_suite",
    "corpus_top_bigrams", "csv_roundtrip", "doc_chunks",
    "embedding_near_dups", "similarity_ivf", "agg_approx_distinct",
    "stream_capped_sessions", "stream_capped_sessions_checksum",
    "embedding_kmeans", "ann_pq_rerank",
]


def _reorder_registry() -> None:
    ordered = _DRIVER_WINDOW + _TAIL
    assert len(_DRIVER_WINDOW) == 50, f"window is {len(_DRIVER_WINDOW)}, not 50"
    dupes = {n for n in ordered if ordered.count(n) > 1}
    assert not dupes, f"duplicate registry names: {dupes}"
    missing = set(QUERIES) - set(ordered)
    unknown = set(ordered) - set(QUERIES)
    assert not missing and not unknown, (
        f"registry/order drift: missing from order={sorted(missing)} "
        f"unknown in order={sorted(unknown)}"
    )
    # reorder IN PLACE so every module's reference to the registry
    # dicts (they all share _base.QUERIES/_base.ORACLE) stays valid
    snap_q, snap_o = dict(QUERIES), dict(ORACLE)
    QUERIES.clear()
    QUERIES.update({k: snap_q[k] for k in ordered})
    ORACLE.clear()
    ORACLE.update({k: snap_o[k] for k in ordered if k in snap_o})


_reorder_registry()
