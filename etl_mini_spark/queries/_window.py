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
# =========================================================================

_DRIVER_WINDOW = [
    # round-6 rotation:
    # (a) the 37 oracle-backed entries that had no driver CORRECTNESS row
    #     through r05 (round-5 additions landed after that window froze) —
    #     after this round EVERY oracle-backed entry is driver-verified
    #     at least once (165+new/165+new coverage);
    # (b) the four new round-6 queries (as-of skew path + forward
    #     direction, converged PageRank, SCD2 late correction);
    # (c) queries whose code changed in round 6 (containment denominator,
    #     as-of NULL handling, streaming NTZ recursion) plus canaries for
    #     the reader conf-scoping change (scan_checksum, csv_roundtrip,
    #     dedup_ngram_jaccard shares the shingle machinery).
    # Rows-only entries stay OUT — they cannot hash-match a DuckDB
    # oracle (r01's similarity_ivf lesson; machine-checked now).
    "sql_q4_priority", "sql_q8_mkt_share", "sql_q9_product_profit",
    "sql_q12_late_lines", "sql_q15_top_supplier", "sql_q17_small_qty",
    "sql_q20_promo_suppliers", "sql_q21_waiting_supplier", "sql_recursive_series",
    "sql_lateral_topn", "listagg_sorted", "variant_shred_extract",
    "collation_distinct", "try_arithmetic_suite", "cohort_retention",
    "rfm_segments", "ratio_to_report", "churn_gap_flag",
    "corpus_token_entropy", "mad_outliers", "dedup_canonical_pick",
    "window_tumbling_distinct", "graph_triangle_count", "graph_pagerank_parts",
    "geo_radius_pairs", "dedup_levenshtein_blocked", "timeseries_ohlc_twap",
    "dq_expectations_report", "co_purchase_pairs", "scd2_point_in_time_join",
    "xml_roundtrip", "join_null_safe", "partitioned_roundtrip",
    "bucketed_join_roundtrip", "csv_malformed_tolerant", "parquet_schema_evolution",
    "stream_foreachbatch_upsert", "join_asof_bucketed", "graph_pagerank_converged",
    "scd2_late_correction", "join_asof_forward",
    # (d) round-6 additions: LLM-pipeline tier, dynamic partition
    # pruning, Python-DataSource scan (csv_roundtrip and
    # stream_static_enrich rotate out — both long driver-green; CSV
    # stays canaried by csv_malformed_tolerant, streaming by
    # stream_dedup_watermark + stream_interval_join)
    "seq_packing_bins", "vocab_oov_coverage", "dpp_partitioned_join",
    "http_pyds_scan",
    # (e) round-6 batch 2 (never driver-verified → must hold slots):
    # repeated-span dedup, exact TF-IDF cosine pairs, SQL-defined UDFs,
    # k-hop BFS, snapshot diff. The five round-6 code-change canaries
    # (minhash_containment, join_asof_last_order, window_time_range_7d,
    # stream_dedup_watermark, stream_interval_join) rotate to the tail:
    # all are driver-green in r05 and their changed paths were
    # re-verified by this session's full-registry sf0.01 sweep.
    "dedup_repeated_spans", "similarity_tfidf_pairs", "sql_udf_scalar",
    "graph_khop_reach", "snapshot_table_diff",
]

_TAIL = [
    # driver-green in earlier rounds; every entry still locally
    # oracle-verified per round at sf0.001 (rows-only entries verified
    # by their dedicated pinned tests).
    "minhash_containment", "join_asof_last_order", "window_time_range_7d",
    "stream_dedup_watermark", "stream_interval_join",
    "agg_corr_regr", "corpus_idf", "decontaminate_13gram",
    "dedup_incremental", "embedding_quantize", "higher_order_fns",
    "map_fns_suite", "mixture_weighted_sample", "orc_roundtrip",
    "outlier_trim", "pipeline_corpus_filter", "posexplode_tokens",
    "sessionize_events", "skew_diagnostic", "sql_q6_forecast",
    "sql_q7_volume", "sql_q13_custdist", "sql_q14_promo",
    "sql_q18_large_orders", "sql_q19_disjunctive", "table_profile",
    "text_repetition", "time_trunc_suite", "window_value_suite",
    "zorder_locality", "dedup_clusters", "sql_q3_shipping",
    "sql_q5_local_volume", "sql_q10_returned", "approx_quantile_sketch",
    "dedup_bloom_prefilter", "token_stats_bpe", "json_table_extract",
    "lateral_tokens_topk", "interval_overlap_agg", "sql_q2_min_cost_supplier",
    "sql_q11_important_stock", "sql_q16_supplier_cnt", "sql_q22_global_sales",
    "event_path_3gram", "first_touch_attribution", "text_near_template",
    "cdc_scd2_history", "range_bucket_join", "project_select",
    "filter_time_range", "filter_term", "nested_json_extract",
    "drop_null_required", "join_inner_revenue", "join_left_counts",
    "join_star_dims", "agg_pricing_summary", "window_running_total",
    "dedup_keep_first", "upsert_keyed", "tolerant_select",
    "agg_distinct", "window_lag_lead", "topk_limit",
    "set_union_halves", "set_intersect", "time_derive_parts",
    "iso_normalize", "sanitize_values", "placeholder_extract",
    "constant_columns", "window_tumbling_1h", "window_session_30m",
    "dedup_exact_docs", "similarity_topk", "similarity_ivf",
    "join_salted_skew", "text_quality", "text_token_counts",
    "text_lang_id", "text_fingerprint", "multimodal_decode",
    "multimodal_resize", "multimodal_features", "agg_approx_distinct",
    "stream_capped_sessions", "stream_capped_sessions_checksum", "http_api_extract",
    "text_redact_pii", "doc_chunks", "corpus_top_bigrams",
    "join_full_outer", "window_rank_suite", "string_fns_suite",
    "timeseries_resample_fill", "funnel_conversion", "groupwise_zscore",
    "upsert_null_update", "join_anti_no_orders", "join_semi_active",
    "join_range_followups", "sql_exists_urgent", "sql_scalar_above_avg",
    "agg_rollup", "agg_cube", "agg_grouping_sets",
    "agg_stats_suite", "agg_percentiles", "agg_minmax_by",
    "agg_histogram", "groupby_date_type", "window_topk_per_group",
    "window_sliding_15m", "order_by_hash", "set_except",
    "pivot_type_counts", "unpivot_part_metrics", "array_math_suite",
    "time_tz_trimode", "udf_registry_iso_parts", "sample_split_counts",
    "sample_deterministic", "sample_stratified_docs", "ndjson_roundtrip",
    "dedup_minhash_lsh", "dedup_simhash", "embedding_near_dups",
    "embedding_near_dups_lsh", "multimodal_frames", "embedding_kmeans",
    "scan_checksum", "dedup_ngram_jaccard", "stream_static_enrich",
    "csv_roundtrip",
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
