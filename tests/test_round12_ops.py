"""Non-vacuity pins for the round-12 tier (oracle equivalence is
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


def test_friedman_rank_sums_conserve(spark):
    rows = PENDING["friedman_test_blocks"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    n, k = rows[0]["n"], rows[0]["k"]
    # doubled midranks sum to n*k*(k+1) across treatments
    assert sum(r["r2j"] for r in rows) == n * k * (k + 1)
    assert rows[0]["q_stat"] >= 0.0
    assert len({r["r2j"] for r in rows}) > 1  # types actually differ


def test_cochran_q_positive_and_raters_differ(spark):
    row = PENDING["cochran_q_raters"](spark, SF_SMOKE).collect()[0]
    assert row["q_stat"] > 0.0
    gs = {row["g1"], row["g2"], row["g3"]}
    assert len(gs) == 3  # three genuinely different screens
    assert all(0 < g < row["n"] for g in gs)


def test_mcnemar_discordant_both_ways(spark):
    row = PENDING["mcnemar_paired_rules"](spark, SF_SMOKE).collect()[0]
    assert row["b01"] > 0 and row["b10"] > 0
    assert row["chi2"] >= row["chi2_cc"] >= 0.0


def test_fleiss_kappa_bounded_nonvacuous(spark):
    row = PENDING["fleiss_kappa_multi"](spark, SF_SMOKE).collect()[0]
    assert -1.0 <= row["kappa"] <= 1.0
    assert row["c0"] + row["c1t"] + row["c2t"] == row["n"] * 3
    assert row["c0"] > 0 and row["c1t"] > 0  # bands actually used


def test_cliffs_delta_bounded(spark):
    row = PENDING["cliffs_delta_effect"](spark, SF_SMOKE).collect()[0]
    assert -1.0 <= row["delta"] <= 1.0
    assert abs(row["net"]) <= row["n1"] * row["n2"]
    assert row["n1"] > 10 and row["n2"] > 10


def test_jonckheere_j2_bounded(spark):
    row = PENDING["jonckheere_terpstra_trend"](spark, SF_SMOKE).collect()[0]
    assert 0 < row["j2"]
    assert abs(row["z"]) < 50


def test_pettitt_pick_is_max_abs(spark):
    row = PENDING["pettitt_changepoint"](spark, SF_SMOKE).collect()[0]
    assert row["k_stat"] == abs(row["ut"])
    assert row["k_stat"] > 0


def test_grubbs_positive(spark):
    row = PENDING["grubbs_max_outlier"](spark, SF_SMOKE).collect()[0]
    assert row["g_stat"] > 1.0  # max deviation always exceeds 1 sd for n>=3
    assert row["n"] >= 20


def test_chow_f_nonnegative(spark):
    row = PENDING["chow_structural_break"](spark, SF_SMOKE).collect()[0]
    assert row["f_stat"] >= 0.0
    assert row["nb"] * 2 <= row["n"] + 1


def test_theil_nonnegative_below_ln_n(spark):
    import math

    row = PENDING["theil_inequality_index"](spark, SF_SMOKE).collect()[0]
    assert 0.0 <= row["theil"] <= math.log(row["n"]) + 1e-9
    assert row["total_cents"] > 0


def test_xmr_limits_bracket_center(spark):
    rows = PENDING["xmr_control_chart"](spark, SF_SMOKE).collect()
    assert len(rows) >= 20
    r = rows[0]
    assert r["lcl"] < r["center"] < r["ucl"]
    # a flagged day is genuinely outside its limit
    for r in rows:
        if r["above_ucl"]:
            assert r["revenue"] > r["center"]
        if r["below_lcl"]:
            assert r["revenue"] < r["center"]


def test_record_days_strictly_increasing(spark):
    rows = PENDING["record_breaking_days"](spark, SF_SMOKE).collect()
    assert rows[0]["record_no"] == 1
    revs = [r["revenue"] for r in rows]
    assert all(b > a for a, b in zip(revs, revs[1:]))
    assert [r["record_no"] for r in rows] == list(range(1, len(rows) + 1))


def test_rsi_bounded_and_moves(spark):
    rows = PENDING["rsi_wilder_14"](spark, SF_SMOKE).collect()
    assert len(rows) >= 10
    assert all(0.0 <= r["rsi"] <= 100.0 for r in rows)
    assert len({r["rsi"] for r in rows}) > 1
    assert all(r["avg_gain"] >= 0 and r["avg_loss"] >= 0 for r in rows)


def test_macd_day1_zero_and_crossings_flagged(spark):
    rows = PENDING["macd_signal_line"](spark, SF_SMOKE).collect()
    assert rows[0]["macd"] == 0.0 and rows[0]["signal_line"] == 0.0
    assert not rows[0]["crossed"]
    # a crossed row's histogram sign differs from its predecessor's
    for prev, cur in zip(rows, rows[1:]):
        if cur["crossed"]:
            assert (cur["histogram"] > 0) != (prev["histogram"] > 0)
    assert any(r["crossed"] for r in rows[1:])


def test_stochastic_k_bounded(spark):
    rows = PENDING["stochastic_oscillator_kd"](spark, SF_SMOKE).collect()
    assert len(rows) >= 10
    assert all(0.0 <= r["pct_k"] <= 100.0 for r in rows)
    with_d = [r for r in rows if r["pct_d"] is not None]
    assert with_d and all(0.0 <= r["pct_d"] <= 100.0 for r in with_d)


def test_obv_day1_zero_and_bounded_steps(spark):
    rows = PENDING["obv_daily_flow"](spark, SF_SMOKE).collect()
    assert rows[0]["obv"] == 0
    for prev, cur in zip(rows, rows[1:]):
        assert abs(cur["obv"] - prev["obv"]) == (
            cur["v"] if cur["revenue"] != prev["revenue"] else 0
        )


def test_croston_interval_at_least_one(spark):
    rows = PENDING["croston_intermittent"](spark, SF_SMOKE).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["interval_ema"] >= 1.0  # intervals are >= 1 period
        assert r["size_ema"] > 0.0
        assert r["demand_days"] > 0


def test_holt_damped_tracks_level(spark):
    rows = PENDING["holt_damped_trend"](spark, SF_SMOKE).collect()
    assert len({r["event_type"] for r in rows}) == 5
    assert len({r["level"] for r in rows}) > 10  # genuinely per-day state
    # damped fitted = level + 0.9*trend of the PREVIOUS row
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for seq in by_type.values():
        for prev, cur in zip(seq, seq[1:]):
            assert abs(cur["fitted"] - (prev["level"] + 0.9 * prev["trend"])) < 1e-4


def test_hurst_in_unit_interval_and_rs_grows(spark):
    rows = PENDING["hurst_rescaled_range"](spark, SF_SMOKE).collect()
    assert [r["sz"] for r in rows] == [16, 64, 256]
    assert rows[0]["mean_rs"] < rows[1]["mean_rs"] < rows[2]["mean_rs"]
    assert 0.0 < rows[0]["hurst"] < 1.0
    assert len({r["hurst"] for r in rows}) == 1  # scalar repeated


def test_xyz_cv_positive_and_varies(spark):
    rows = PENDING["xyz_volatility_classes"](spark, SF_SMOKE).collect()
    assert len(rows) == 25
    assert all(r["cv"] > 0 for r in rows)
    assert len({r["cv"] for r in rows}) > 10  # genuinely per-brand
    for r in rows:
        want = "X" if r["cv"] < 0.21 else ("Y" if r["cv"] < 0.25 else "Z")
        assert r["xyz_class"] == want


def test_equi_depth_buckets_ordered_and_balanced(spark):
    rows = PENDING["equi_depth_histogram"](spark, SF_SMOKE).collect()
    assert len(rows) == 8
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # NTILE fill rule
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]  # depth buckets tile the value axis


def test_quantile_disc_values_monotone(spark):
    rows = PENDING["quantile_disc_parity"](spark, SF_SMOKE).collect()
    assert [r["q"] for r in rows] == ["p10", "p25", "p50", "p75", "p90"]
    vals = [r["value"] for r in rows]
    assert all(a <= b for a, b in zip(vals, vals[1:]))
    assert vals[0] < vals[-1]


def test_unpivot_include_nulls_keeps_null_rows(spark):
    df = PENDING["unpivot_include_nulls"](spark, SF_SMOKE)
    rows = df.collect()
    per_cust = {}
    for r in rows:
        per_cust.setdefault(r["c_custkey"], []).append(r)
    assert all(len(v) == 2 for v in per_cust.values())  # INCLUDE NULLS
    assert any(r["value"] is None for r in rows)  # the null rows survive


def test_date_arith_clamps_month_end(spark):
    rows = PENDING["date_arith_edges"](spark, SF_SMOKE).collect()
    by_d = {r["d"]: r for r in rows}
    jan31 = [r for r in rows if r["d"].endswith("-01-31")]
    assert jan31, "no Jan 31 order dates in data"
    for r in jan31:
        y = int(r["d"][:4])
        leap = y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)
        assert r["plus_1m"] == f"{y}-02-{29 if leap else 28}"
    assert any(r["is_month_end"] for r in rows)
    assert by_d  # non-empty


def test_scd6_current_row_and_prev_chain(spark):
    rows = PENDING["scd6_hybrid_dim"](spark, SF_SMOKE).collect()
    per_cust = {}
    for r in rows:
        per_cust.setdefault(r["o_custkey"], []).append(r)
    for seq in per_cust.values():
        seq.sort(key=lambda r: r["change_seq"])
        assert seq[0]["prev_priority"] is None
        assert seq[-1]["valid_to"] is None and seq[-1]["is_current"]
        assert all(not r["is_current"] for r in seq[:-1])
        # type-1 column repeats the last value everywhere
        assert {r["current_priority"] for r in seq} == {seq[-1]["priority"]}
        # type-3 prev chain matches the type-2 sequence
        for a, b in zip(seq, seq[1:]):
            assert b["prev_priority"] == a["priority"]
    assert any(len(v) > 1 for v in per_cust.values())


def test_merge_actions_partition(spark):
    rows = PENDING["merge_when_clauses"](spark, SF_SMOKE).collect()
    acts = {r["action"] for r in rows}
    assert "delete" not in acts
    assert {"update", "insert", "keep"} <= acts
    assert all(r["order_cnt"] > 0 for r in rows)


def test_bankers_ties_exist_and_differ_from_half_up(spark):
    rows = PENDING["bankers_rounding_ledger"](spark, SF_SMOKE).collect()
    assert len(rows) == 3
    assert sum(r["tie_rows"] for r in rows) > 0  # half-even branch exercised
    assert all(r["tax_cents_half_even"] > 0 for r in rows)


def test_stump_best_unique_and_gain_nonneg(spark):
    rows = PENDING["decision_stump_gain"](spark, SF_SMOKE).collect()
    assert len(rows) == 7
    assert sum(1 for r in rows if r["is_best"]) == 1
    assert all(r["info_gain"] >= 0.0 for r in rows)
    for r in rows:
        assert r["pl"] <= r["nl"] and r["pr"] <= r["nr"]


def test_jaro_pairs_bounded_and_nonvacuous(spark):
    rows = PENDING["jaro_blocked_pairs"](spark, SF_SMOKE).collect()
    assert rows, "threshold leaves no pairs at smoke SF"
    assert all(0.60 <= r["jaro"] <= 1.0 for r in rows)
    assert all(r["a_key"] < r["b_key"] for r in rows)


def test_amplified_corpus_counts_conserve(spark):
    rows = PENDING["corpus_amplified_gate"](spark, SF_SMOKE).collect()
    assert [r["v"] for r in rows] == list(range(10))
    n0 = rows[0]["n_docs"]
    assert all(r["n_docs"] == n0 for r in rows)  # every variant keeps all docs
    assert all(r["n_distinct"] + r["n_dup_rows"] == r["n_docs"] for r in rows)


def test_http_paginated_covers_id_range_exactly(spark):
    rows = PENDING["http_paginated_extract"](spark, SF_SMOKE).collect()
    assert [r["id"] for r in rows] == list(range(120))  # no dropped/dup pages
    assert rows[7]["name"] == "row_7"


def test_pacf_lag1_equals_acf1(spark):
    rows = PENDING["pacf_durbin_levinson"](spark, SF_SMOKE).collect()
    assert [r["lag"] for r in rows] == [1, 2, 3]
    assert rows[0]["acf"] == rows[0]["pacf"]  # DL base case
    assert all(-1.0 <= r["pacf"] <= 1.0 for r in rows)
    assert len({r["acf"] for r in rows}) > 1


def test_orderkey_gaps_positive_and_ordered(spark):
    rows = PENDING["orderkey_gap_audit"](spark, SF_SMOKE).collect()
    assert rows, "TPC-H order keys are sparse; gaps must exist"
    for r in rows:
        assert r["gap_len"] == r["gap_end"] - r["gap_start"] + 1 > 0
    starts = [r["gap_start"] for r in rows]
    assert starts == sorted(starts)


def test_mean_family_inequality_chain(spark):
    rows = PENDING["mean_family_suite"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        # AM >= GM >= HM (strict on non-constant data); RMS >= AM
        assert r["mean_rms"] >= r["mean_arith"] > r["mean_geo"] > r["mean_harm"] > 0


def test_pages_l_rank_sums_conserve(spark):
    rows = PENDING["pages_l_trend"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    b, k = rows[0]["b"], 5
    assert sum(r["r2j"] for r in rows) == b * k * (k + 1)
    assert abs(rows[0]["z"]) < 50
    assert len({r["r2j"] for r in rows}) > 1


def test_turning_points_bounded(spark):
    row = PENDING["turning_points_test"](spark, SF_SMOKE).collect()[0]
    assert 0 < row["tp"] <= row["n"] - 2
    assert abs(row["z"]) < 20


def test_bartels_rvn_in_range(spark):
    row = PENDING["bartels_rank_vonneumann"](spark, SF_SMOKE).collect()[0]
    assert 0.0 < row["rvn"] < 4.0  # theoretical support of the ratio
    assert row["sd2"] > 0


def test_cox_stuart_counts_nest(spark):
    row = PENDING["cox_stuart_trend"](spark, SF_SMOKE).collect()[0]
    assert 0 <= row["n_plus"] <= row["m"] > 0


def test_stream_rsi_equals_batch_recursion(spark):
    """The incremental stream must reproduce the batch Wilder
    recursion exactly — state handoff across micro-batch boundaries
    (incl. mid-seed) is the thing under test."""
    batch = {r["d"]: r for r in PENDING["rsi_wilder_14"](spark, SF_SMOKE).collect()}
    stream = {r["d"]: r for r in PENDING["stream_rsi_incremental"](spark, SF_SMOKE).collect()}
    assert set(batch) == set(stream)
    for d in batch:
        assert batch[d]["rsi"] == stream[d]["rsi"], d
        assert batch[d]["avg_gain"] == stream[d]["avg_gain"], d
