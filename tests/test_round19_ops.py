"""Non-vacuity pins for the round-19 tier (oracle equivalence is
verified by tests/test_queries_oracle.py at sf0.001 and the driver at
sf0.01). Migrated unchanged from the staging harness at
registration."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _registry():
    from etl_mini_spark.queries import QUERIES

    return QUERIES


PENDING = _registry()


def test_dtw_bounds(spark):
    from pyspark.sql import functions as F

    from etl_mini_spark.queries._base import _t

    r = PENDING["dtw_banded_daily"](spark, SF_SMOKE).collect()[0]
    assert r["nx"] > 0 and r["ny"] > 0 and abs(r["nx"] - r["ny"]) <= 5
    assert 0 < r["dtw_cents"] < 1152921504606846976  # in-band path exists
    # DTW is bounded below by |sum(x) - sum(y)| / ... no; use the
    # diagonal-alignment upper bound instead: matching same-day cells
    e = _t(spark, SF_SMOKE, "events").filter(F.col("event_type").isin("click", "view"))
    daily = e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("d"), "event_type").agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias("c"))
    piv = daily.groupBy("d").pivot("event_type", ["click", "view"]).sum("c")
    diag = piv.agg(F.sum(F.abs(F.coalesce("click", F.lit(0))
                               - F.coalesce("view", F.lit(0)))).alias("s")).collect()[0]["s"]
    assert r["dtw_cents"] <= diag  # warping never beats... is beaten by diagonal


def test_ar1_phi_and_forecast_converges_to_mean(spark):
    rows = sorted(PENDING["ar1_yule_walker"](spark, SF_SMOKE).collect(),
                  key=lambda r: r["h"])
    assert len(rows) == 7
    phi = rows[0]["phi"]
    assert all(r["phi"] == phi for r in rows)
    assert -1.0 < phi < 1.0  # stationary daily revenue
    # successive forecast steps contract toward the mean
    diffs = [abs(rows[i + 1]["forecast"] - rows[i]["forecast"]) for i in range(6)]
    assert all(diffs[i + 1] <= diffs[i] + 1e-9 for i in range(5))


def test_obf_looks_complete_and_null_rarely_crosses(spark):
    rows = sorted(PENDING["group_sequential_obf"](spark, SF_SMOKE).collect(),
                  key=lambda r: r["k"])
    assert [r["k"] for r in rows] == [1, 2, 3, 4]
    for r in rows:
        assert r["n1"] + r["n2"] > 0 and 0 <= r["h1"] <= r["n1"]
        assert r["crossed"] == (abs(r["z"]) >= {1: 4.333, 2: 2.963, 3: 2.359, 4: 2.014}[r["k"]])
    # sample sizes grow across looks
    assert rows[0]["n1"] + rows[0]["n2"] < rows[3]["n1"] + rows[3]["n2"]


def test_median_polish_converges(spark):
    r = PENDING["median_polish_residuals"](spark, SF_SMOKE).collect()[0]
    assert r["n_cells"] >= 70  # ~7 years x 12 months
    assert r["max_abs_resid_q"] >= 0
    # after two sweeps at least one cell sits exactly on its row+col fit
    assert r["n_zero"] >= 1


def test_consistent_hash_movement_guarantee(spark):
    rows = PENDING["consistent_hash_rebalance"](spark, SF_SMOKE).collect()
    total = sum(r["n_docs"] for r in rows)
    moved = sum(r["n_docs"] for r in rows if r["before_node"] != r["after_node"])
    assert total > 0
    # the consistent-hashing guarantee: every moved doc lands on the NEW node
    for r in rows:
        if r["before_node"] != r["after_node"]:
            assert r["after_node"] == "n5", r
    # expected movement ~ 4/20 vnodes; allow a wide hash-variance band
    assert moved / total < 0.6
    assert any(r["after_node"] == "n5" for r in rows)


def test_storey_pi0_near_planted(spark):
    r = PENDING["storey_pi0_estimate"](spark, SF_SMOKE).collect()[0]
    assert r["m"] > 0 and 0 <= r["n_above"] <= r["m"]
    # planted 90% null; the signal stratum (p/50) almost never exceeds 0.5
    assert 0.7 <= r["pi0"] <= 1.1


def test_zeller_histogram_covers_week(spark):
    rows = PENDING["zeller_congruence_audit"](spark, SF_SMOKE).collect()
    dows = {r["iso_dow"] for r in rows}
    assert dows == set(range(1, 8))  # 2,400 days hit every weekday
    assert all(r["n"] > 0 for r in rows)


def test_mod97_detects_exactly_the_corrupted_population(spark):
    rows = {(r["corrupted"], r["valid"]): r["n"]
            for r in PENDING["mod97_checksum_audit"](spark, SF_SMOKE).collect()}
    assert rows.get((False, True), 0) > 0
    assert rows.get((False, False), 0) == 0
    assert rows.get((True, False), 0) > 0
    assert rows.get((True, True), 0) == 0
