"""Non-vacuity pins for the round-11 tier (oracle equivalence is
verified by tests/test_queries_oracle.py at sf0.001 and the driver at
sf0.01): bounds, conservation laws, monotonicity, and exact-identity
checks so no entry can go green as a degenerate constant. Migrated
unchanged from the staging harness at registration."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _registry():
    from etl_mini_spark.queries import QUERIES

    return QUERIES


PENDING = _registry()


def test_kendall_tau_bounded_nonvacuous(spark):
    row = PENDING["kendall_tau_daily"](spark, SF_SMOKE).collect()[0]
    assert -1.0 <= row["tau_b"] <= 1.0
    assert row["nc"] > 0 and row["nd"] > 0  # both signs actually occur
    assert row["nc"] + row["nd"] <= row["n"] * (row["n"] - 1) // 2


def test_mann_kendall_all_series_and_z_moves(spark):
    rows = PENDING["mann_kendall_trend"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    assert any(r["s"] != 0 for r in rows)
    for r in rows:
        assert abs(r["z"]) < 50


def test_kruskal_wallis_nonnegative(spark):
    row = PENDING["kruskal_wallis_h"](spark, SF_SMOKE).collect()[0]
    assert row["k"] == 5
    assert row["h_stat"] >= 0.0
    assert row["n"] > 100


def test_kappa_cells_conserve(spark):
    row = PENDING["cohens_kappa_rules"](spark, SF_SMOKE).collect()[0]
    assert row["n11"] + row["n10"] + row["n01"] + row["n00"] == row["n"]
    assert -1.0 <= row["kappa"] <= 1.0


def test_mcc_cells_conserve_and_bounded(spark):
    row = PENDING["mcc_threshold"](spark, SF_SMOKE).collect()[0]
    assert row["tp"] + row["fp"] + row["fn"] + row["tn"] > 0
    assert -1.0 <= row["mcc"] <= 1.0
    assert row["tp"] > 0 and row["tn"] > 0  # threshold actually splits


def test_two_proportion_counts_nest(spark):
    row = PENDING["two_proportion_ztest"](spark, SF_SMOKE).collect()[0]
    assert 0 < row["x1"] <= row["n1"] and 0 < row["x2"] <= row["n2"]
    assert abs(row["z"]) < 50


def test_holt_winters_seasonal_state_moves(spark):
    rows = PENDING["holt_winters_weekly"](spark, SF_SMOKE).orderBy(
        "event_type", "d"
    ).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert len(by_type) == 5
    for series in by_type.values():
        # 30-day fixture => outputs for days 8..30
        assert len(series) == 23
        # the seasonal component must actually vary (not a Holt clone)
        seas = [r["seasonal"] for r in series]
        assert max(seas) - min(seas) > 1e-9
        assert any(abs(r["trend"]) > 1e-12 for r in series)


def test_max_drawdown_positive_and_consistent(spark):
    row = PENDING["max_drawdown_daily"](spark, SF_SMOKE).collect()[0]
    assert row["max_drawdown"] > 0.0  # the net series actually draws down
    assert abs((row["peak"] - row["trough"]) - row["max_drawdown"]) < 1e-9


def test_bollinger_bands_ordered(spark):
    rows = PENDING["bollinger_bands_7d"](spark, SF_SMOKE).collect()
    assert len(rows) == 24  # 30 days - 6 warmup
    for r in rows:
        assert r["lower"] <= r["mid"] <= r["upper"]
        # a breach flag must agree with the band it claims to cross
        if r["breach_hi"]:
            assert r["revenue"] > r["mid"]
        if r["breach_lo"]:
            assert r["revenue"] < r["mid"]


def test_stream_mg_equals_batch_sketch(spark):
    """Incremental MG maintenance must reproduce the registered batch
    sketch exactly (same candidates superset -> same exact recount)."""
    from etl_mini_spark.queries import QUERIES

    inc = PENDING["stream_mg_incremental"](spark, SF_SMOKE).collect()
    bat = QUERIES["heavy_hitters_mg"](spark, SF_SMOKE).collect()
    assert [tuple(r) for r in inc] == [tuple(r) for r in bat]
    assert len(inc) > 3


def test_relational_division_discriminates(spark):
    rows = PENDING["relational_division"](spark, SF_SMOKE).collect()
    assert rows
    assert any(r["n_covered"] > 0 for r in rows)
    for r in rows:
        assert 0 <= r["n_covered"] <= r["n_types"]
        assert r["divides_all"] == (r["n_covered"] == r["n_types"])


def test_largest_remainder_conserves_budget(spark):
    rows = PENDING["largest_remainder_allocation"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    assert sum(r["alloc"] for r in rows) == 10000  # conservation law
    for r in rows:
        assert r["alloc"] in (r["base"], r["base"] + 1)


def test_golden_record_one_row_per_user(spark):
    rows = PENDING["golden_record_survivorship"](spark, SF_SMOKE).collect()
    users = [r["user_id"] for r in rows]
    assert len(users) == len(set(users)) > 0
    for r in rows:
        assert r["first_seen"] <= r["last_seen"]
        assert r["n_events"] >= 1


def test_completeness_matrix_full_schema(spark):
    rows = PENDING["null_completeness_matrix"](spark, SF_SMOKE).collect()
    assert [r["col"] for r in rows] == [
        "event_id", "event_type", "props", "ts", "user_id", "value"
    ]
    for r in rows:
        assert 0.0 <= r["completeness"] <= 1.0
        assert r["n_null"] + r["n_blank"] <= r["n"]


def test_distinct_profile_ratios(spark):
    rows = PENDING["distinct_ratio_profile"](spark, SF_SMOKE).collect()
    by_col = {r["col"]: r for r in rows}
    assert set(by_col) == {"event_type", "user_id", "value"}
    assert by_col["event_type"]["n_distinct"] == 5
    for r in rows:
        assert 0.0 < r["distinct_ratio"] <= 1.0
        assert r["top_freq"] >= 1


def test_cross_field_rules_nonvacuous(spark):
    rows = PENDING["cross_field_consistency"](spark, SF_SMOKE).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_checked"] > 0
        assert 0 <= r["n_violations"] <= r["n_checked"]


def test_binary_encoding_roundtrips(spark):
    rows = PENDING["binary_encoding_suite"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert len(r["md5_hex"]) == 32 and len(r["sha256_hex"]) == 64
        assert r["roundtrip_ok"] is True


def test_iso_week_covers_year_boundaries(spark):
    rows = PENDING["iso_week_thursday_rule"](spark, SF_SMOKE).collect()
    weeks = {(r["iso_year"], r["iso_week"]) for r in rows}
    assert all(1 <= w <= 53 for _, w in weeks)
    # orders span 1995-2001 => at least 6 distinct iso years
    assert len({y for y, _ in weeks}) >= 6
    # week 52/53 and week 1 both present (the boundary weeks that break
    # naive week math)
    assert any(w >= 52 for _, w in weeks) and any(w == 1 for _, w in weeks)


def test_array_set_ops_laws(spark):
    rows = PENDING["array_set_ops_suite"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # inclusion-exclusion on set cardinalities
        assert r["n_union"] == r["n_a"] + r["n_b"] - r["n_inter"]
        assert r["n_a_only"] == r["n_a"] - r["n_inter"]
        assert 0.0 <= r["jaccard"] <= 1.0


def test_heatmap_cells_and_share(spark):
    rows = PENDING["hour_of_week_heatmap"](spark, SF_SMOKE).collect()
    assert len(rows) <= 168
    assert all(0 <= r["dow_mon0"] <= 6 and 0 <= r["hr"] <= 23 for r in rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3


def test_interorder_gaps_ordered_percentiles(spark):
    rows = PENDING["interorder_gap_percentiles"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["p50_days"] <= r["p90_days"]
        assert r["n_gaps"] > 0


def test_fourier_amplitude_consistent(spark):
    rows = PENDING["fourier_weekly_coeffs"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        amp_check = (r["a1"] ** 2 + r["b1"] ** 2) ** 0.5
        assert abs(r["amplitude"] - amp_check) < 1e-5
        assert r["amplitude"] < 1.0  # shares are <=1 so the harmonic is too


def test_quantile_cont_ordered(spark):
    rows = PENDING["quantile_cont_parity"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["p25"] <= r["p50"] <= r["p75"]


def test_ma_crossover_states_and_signals(spark):
    rows = PENDING["ma_crossover_signals"](spark, SF_SMOKE).collect()
    assert len(rows) == 16  # 30 days - 14 warmup
    states = {r["state"] for r in rows}
    assert states <= {-1, 0, 1} and len(states) > 1  # the state actually flips
    for r in rows:
        if r["signal"] == "golden":
            assert r["state"] == 1
        if r["signal"] == "death":
            assert r["state"] == -1


def test_lifecycle_identity_holds(spark):
    rows = PENDING["customer_lifecycle_yearly"](spark, SF_SMOKE).orderBy("y").collect()
    assert len(rows) >= 6
    assert rows[0]["n_churned_out"] is None  # no cohort before the first year
    prev_active = None
    for r in rows:
        # accounting identity: active = new + retained + reactivated
        assert r["n_active"] == r["n_new"] + r["n_retained"] + r["n_reactivated"]
        if prev_active is not None:
            assert r["n_churned_out"] == prev_active - r["n_retained"]
        prev_active = r["n_active"]


def test_rapid_repeats_within_band(spark):
    rows = PENDING["rapid_repeat_events"](spark, SF_SMOKE).collect()
    assert rows  # threshold tuned non-vacuous at the smoke SF
    for r in rows:
        assert 0 <= r["delta_us"] <= 1_800_000_000
        assert r["event_a"] != r["event_b"]


def test_knn_accuracy_counts_nest(spark):
    rows = PENDING["knn_label_accuracy"](spark, SF_SMOKE).collect()
    assert rows
    total = sum(r["n_probes"] for r in rows)
    assert total > 0
    for r in rows:
        assert 0 <= r["n_correct"] <= r["n_probes"]


def test_hw_forecast_seven_horizons_per_series(spark):
    rows = PENDING["holt_winters_forecast"](spark, SF_SMOKE).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert len(by_type) == 5
    for series in by_type.values():
        assert sorted(r["h"] for r in series) == [1, 2, 3, 4, 5, 6, 7]
        # forecast dates strictly after the last observed day (2024-01-30)
        assert all(r["f_d"] > "2024-01-30" for r in series)
        # the weekly seasonal makes horizons differ (not a flat ramp)
        vals = [r["forecast"] for r in series]
        assert max(vals) - min(vals) > 1e-9


def test_keyset_page_is_rows_201_300(spark):
    """The keyset page must equal the OFFSET page — the rewrite is an
    optimization, not a semantics change."""
    from etl_mini_spark.queries._base import _t
    from pyspark.sql import functions as F

    page = PENDING["sql_keyset_pagination"](spark, SF_SMOKE).collect()
    assert len(page) == 100
    o = _t(spark, SF_SMOKE, "orders")
    expect = [
        (r["o_orderkey"], r["o_orderdate"])
        for r in o.select(
            "o_orderkey", F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate")
        )
        .orderBy("o_orderdate", "o_orderkey")
        .limit(300)
        .collect()[200:]
    ]
    assert [(r["o_orderkey"], r["o_orderdate"]) for r in page] == expect


def test_eoq_positive_and_scaled(spark):
    rows = PENDING["eoq_inventory_policy"](spark, SF_SMOKE).collect()
    assert len(rows) == 25  # TPC-H brand count
    for r in rows:
        assert r["eoq_units"] > 0 and r["reorder_point_units"] > 0
        assert r["demand_units"] > 0


def test_backlog_covers_open_orders_exactly(spark):
    from etl_mini_spark.queries._base import _t
    from pyspark.sql import functions as F

    rows = PENDING["orders_backlog_aging"](spark, SF_SMOKE).collect()
    assert rows
    total = sum(r["n_orders"] for r in rows)
    o = _t(spark, SF_SMOKE, "orders")
    n_open = o.filter(F.col("o_orderstatus").isin("O", "P")).count()
    assert total == n_open  # bucketing partitions the open set exactly
    # the reference date sits past the calendar's last order, so every
    # bucket is reachable — a mid-calendar reference would silently bin
    # future-dated orders as freshest (the r9 erasure-audit class)
    assert {r["bucket"] for r in rows} == {"a_0_1y", "b_1_2y", "c_2_4y", "d_4y_plus"}


def test_bitmap_masks_conserve_users(spark):
    from etl_mini_spark.queries._base import _t

    rows = PENDING["bitmap_presence_rollup"](spark, SF_SMOKE).collect()
    assert rows
    n_users = _t(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert 1 <= r["n_days"] <= 31
