from etl_mini_spark.queries._base import *  # noqa: F401,F403
from etl_mini_spark.queries._base import _t, _TMP  # noqa: F401

# Registry ordering — the driver's CORRECTNESS gate records the FIRST 50
# entries in registry order, so that window is curated explicitly:
#
# - Round-robin across rounds: queries that already earned a driver-green
#   row in CORRECTNESS_r01.json (text_*, dedup_exact_docs, similarity_topk,
#   multimodal_decode, the scalar-function suite, …) yield their window
#   slots to queries that have never been driver-verified (the TPC-H SQL
#   suite, cube/grouping-sets, stats/percentiles, sampling, roundtrips,
#   dedup_clusters) plus the queries whose r01 rows were vacuous and are
#   now non-empty (anti join, set_except, embedding near-dups, simhash).
# - EVERY query — window and tail — is still differentially verified
#   every round by tests/test_queries_oracle.py at sf0.001 (same
#   DuckDB-oracle check the driver runs at sf0.01).
# =========================================================================

_DRIVER_WINDOW = [
    # round-3 rotation: every slot below is either (a) never driver-
    # verified before r03 — the 11 round-2 tail additions — or (b) code
    # changed this round and needs re-verification (upsert_null_update
    # is the new explicit-NULL merge path; dedup_ngram_jaccard lost its
    # O(corpus) broadcast join-back; window_time_range_7d moved to
    # microsecond frames), or (c) kept from r02 because it has no
    # double-green history yet. Double-green (r01+r02) entries yielded
    # their slots and moved to the tail.
    #
    # never driver-verified (round-2 additions)
    "http_api_extract", "text_redact_pii", "doc_chunks", "corpus_top_bigrams",
    "join_full_outer", "window_rank_suite", "string_fns_suite",
    "timeseries_resample_fill", "funnel_conversion",
    "window_time_range_7d", "groupwise_zscore",
    # changed this round → re-verify
    "upsert_null_update", "dedup_ngram_jaccard",
    # joins (kept: green in r02 only)
    "join_anti_no_orders", "join_semi_active", "join_range_followups",
    "join_asof_last_order",
    # ANSI-SQL entry point (TPC-H-style)
    "sql_q3_shipping", "sql_q5_local_volume", "sql_q10_returned",
    "sql_exists_urgent", "sql_scalar_above_avg",
    # aggregation
    "agg_rollup", "agg_cube", "agg_grouping_sets",
    "agg_stats_suite", "agg_percentiles", "agg_minmax_by", "agg_histogram",
    "groupby_date_type",
    # windows / streaming windows
    "window_topk_per_group", "window_sliding_15m",
    # ordering / sets / reshape
    "order_by_hash", "set_except",
    "pivot_type_counts", "unpivot_part_metrics", "array_math_suite",
    # functions
    "time_tz_trimode", "udf_registry_iso_parts",
    # sampling
    "sample_split_counts", "sample_deterministic", "sample_stratified_docs",
    # roundtrips
    "csv_roundtrip", "ndjson_roundtrip",
    # LLM-pipeline ops
    "dedup_minhash_lsh", "dedup_simhash", "dedup_clusters",
    "embedding_near_dups", "embedding_near_dups_lsh", "multimodal_frames",
]

_TAIL = [
    # double-green r01+r02 — yielded their r03 window slots
    "scan_checksum", "project_select", "filter_time_range", "filter_term",
    "nested_json_extract", "drop_null_required", "join_inner_revenue",
    "join_left_counts", "join_star_dims", "agg_pricing_summary",
    "window_running_total", "dedup_keep_first", "upsert_keyed",
    # driver-green in r01 (rotated out of the window) or rows-only
    "tolerant_select", "agg_distinct", "window_lag_lead",
    "topk_limit", "set_union_halves", "set_intersect", "time_derive_parts",
    "iso_normalize", "sanitize_values", "placeholder_extract",
    "constant_columns", "window_tumbling_1h", "window_session_30m",
    "dedup_exact_docs", "similarity_topk",
    "similarity_ivf", "join_salted_skew", "text_quality",
    "text_token_counts", "text_lang_id", "text_fingerprint",
    "multimodal_decode", "multimodal_resize", "multimodal_features",
    "agg_approx_distinct",
    "stream_capped_sessions",
    # round-3 additions
    "stream_capped_sessions_checksum", "stream_dedup_watermark",
    "sessionize_events", "text_repetition",
    "sql_q6_forecast", "sql_q14_promo", "agg_corr_regr", "embedding_quantize",
    "window_value_suite", "outlier_trim", "pipeline_corpus_filter",
    # round-3 batch 2: corpus-scale ops + ORC + stream-stream join
    "decontaminate_13gram", "mixture_weighted_sample", "dedup_incremental",
    "corpus_idf", "orc_roundtrip", "stream_interval_join",
    "zorder_locality", "stream_static_enrich",
    "sql_q7_volume", "sql_q13_custdist", "sql_q18_large_orders",
    "sql_q19_disjunctive", "posexplode_tokens", "map_fns_suite",
    "higher_order_fns", "time_trunc_suite",
    "skew_diagnostic", "table_profile",
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
