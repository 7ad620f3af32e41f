"""Non-vacuity pins for the round-9 tier: oracle equivalence runs
through tests/test_queries_oracle.py (and ran at sf0.001 + sf0.01
before registration); these pins assert the STATISTICS mean something
— bounds, monotonicity, conservation laws, differential twins — so a
query can't go green by degenerating to a constant."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _registry():
    from etl_mini_spark.queries import QUERIES

    return QUERIES


QUERIES = _registry()


def test_gini_bounded_and_nonzero(spark):
    row = QUERIES["gini_lorenz"](spark, SF_SMOKE).collect()[0]
    assert 0.0 < row["gini"] < 1.0
    assert row["total_rev"] > 0 and row["n"] > 0


def test_chi2_positive_and_cramers_bounded(spark):
    row = QUERIES["chi_square_cramers_v"](spark, SF_SMOKE).collect()[0]
    assert row["chi2"] > 0
    assert 0.0 <= row["cramers_v"] <= 1.0
    assert row["dof"] >= (5 - 1) * (2 - 1)  # 5 event types × at least 2 bands


def test_mutual_information_bounds(spark):
    row = QUERIES["mutual_information_discrete"](spark, SF_SMOKE).collect()[0]
    # MI >= 0 up to the 9dp term rounding; NMI <= 1; H(X) of 5 types <= ln 5
    assert row["mi_nats"] >= -1e-6
    assert row["nmi"] <= 1.0 + 1e-9
    assert 0 < row["h_x"] <= 1.6094379312


def test_heavy_hitters_match_naive_exact(spark):
    """The MG sketch path must reproduce the naive exact heavy-hitter
    set — same tokens, same exact frequencies — which is the sketch's
    entire contract (superset candidates + exact verify)."""
    from etl_mini_spark.session import load_table

    got = {
        r["t"]: r["freq"] for r in QUERIES["heavy_hitters_mg"](spark, SF_SMOKE).collect()
    }
    d = load_table(spark, SF_SMOKE, "documents")
    toks = d.select(
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")
        ).alias("t")
    )
    n_total = toks.count()
    naive = {
        r["t"]: r["freq"]
        for r in toks.groupBy("t")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .filter(F.col("freq") * 31 > n_total)
        .collect()
    }
    assert got == naive and len(naive) > 0
    # the threshold must discriminate, not pass the whole vocabulary
    assert toks.select("t").distinct().count() > len(naive)


def test_brier_bins_monotone_and_informative(spark):
    rows = QUERIES["brier_calibration_bins"](spark, SF_SMOKE).orderBy("bin").collect()
    assert 1 < len(rows) <= 10
    preds = [r["mean_pred"] for r in rows]
    assert preds == sorted(preds)  # bin order == predicted-probability order
    # the +300 milli boost makes high bins observably positive-rich
    assert rows[-1]["obs_rate"] > rows[0]["obs_rate"]
    assert 0 < rows[0]["brier_total"] < 1


def test_acf_rows_and_bounds(spark):
    rows = QUERIES["acf_hourly_lags"](spark, SF_SMOKE).collect()
    assert [r["lag"] for r in rows] == [1, 2, 3, 24]
    assert all(abs(r["acf"]) <= 1.0 + 1e-9 for r in rows)
    assert all(r["n_pairs"] > 100 for r in rows)


def test_calendar_spine_dense_and_zero_filled(spark):
    import datetime as dt

    rows = QUERIES["calendar_spine_fill"](spark, SF_SMOKE).orderBy("d").collect()
    days = [dt.date.fromisoformat(r["d"]) for r in rows]
    assert all((b - a).days == 1 for a, b in zip(days, days[1:]))  # no holes
    gaps = [r for r in rows if r["is_gap"]]
    assert gaps, "spine must contain gap days at this SF"
    assert all(r["revenue"] == 0.0 for r in gaps)


def test_csv_multiline_exact_content(spark):
    rows = {r["id"]: r for r in QUERIES["csv_multiline_quoted"](spark, SF_SMOKE).collect()}
    assert rows[1]["notes"] == "line one\nline two"
    assert rows[2]["name"] == 'O"Brien, Pat'
    assert rows[2]["notes"] == 'says "hi" to\nall, always'
    assert rows[4]["notes"] == "multi\nline\nthree"
    assert len(rows) == 5


def test_item_item_topk_shape(spark):
    rows = QUERIES["item_item_cosine_topk"](spark, SF_SMOKE).collect()
    assert rows
    per_item: dict = {}
    for r in rows:
        assert 1 <= r["rn"] <= 3
        assert 0 < r["cosine"] <= 1.0
        per_item.setdefault(r["item"], []).append(r["cosine"])
    assert all(cs == sorted(cs, reverse=True) for cs in per_item.values())


def test_new_vs_returning_conserves_users(spark):
    from etl_mini_spark.session import load_table

    rows = QUERIES["events_new_vs_returning"](spark, SF_SMOKE).collect()
    total_new = sum(r["new_users"] for r in rows)
    n_users = load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    assert total_new == n_users  # every user is new exactly once


def test_pr_auc_beats_prevalence(spark):
    row = QUERIES["pr_auc_exact"](spark, SF_SMOKE).collect()[0]
    # planted +25 signal => AP must clear the random baseline (= prevalence)
    assert row["pr_auc"] > row["prevalence"]
    assert row["pr_auc"] <= 1.0


def test_wilson_interval_brackets_rate(spark):
    for r in QUERIES["wilson_ci_rates"](spark, SF_SMOKE).collect():
        assert 0.0 <= r["wilson_lo"] <= r["rate"] <= r["wilson_hi"] <= 1.0


def test_url_parse_fields(spark):
    for r in QUERIES["url_parse_suite"](spark, SF_SMOKE).collect():
        assert r["host"].endswith(".example.com")
        assert r["page"] == str(r["doc_id"] % 7)
        assert r["path"].endswith(f"doc-{r['doc_id']}")


def test_kfold_balanced(spark):
    rows = QUERIES["stratified_kfold_assign"](spark, SF_SMOKE).collect()
    assert [r["fold"] for r in rows] == [0, 1, 2, 3, 4]
    assert all(abs(r["size_dev"]) < 0.25 for r in rows)  # md5 uniform at n≈390


def test_kl_js_nonnegative_and_js_bounded(spark):
    row = QUERIES["kl_divergence_bins"](spark, SF_SMOKE).collect()[0]
    assert row["kl_pq"] >= 0 and row["kl_qp"] >= 0
    assert 0 <= row["js"] <= 0.6931471806  # ln 2
