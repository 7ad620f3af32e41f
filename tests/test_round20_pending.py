"""Non-vacuity pins for the round-20 STAGED tier (oracle equivalence
is swept by sweep_oracle.py / verified at sf0.001 + sf0.01 + sf0.1
before staging). At registration these pins migrate unchanged."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _pending():
    from etl_mini_spark.queries.round20_pending import PENDING20_QUERIES

    return PENDING20_QUERIES


PENDING = _pending()


def test_isqrt_certificate(spark):
    r = PENDING["isqrt_newton_exact"](spark, SF_SMOKE).collect()[0]
    assert r["certified"] and r["n"] > 0 and r["r"] > 0
    assert r["r"] * r["r"] <= r["n"] < (r["r"] + 1) * (r["r"] + 1)
    assert 1 <= r["n_iterations"] <= 40


def test_continued_fraction_convergents(spark):
    rows = sorted(PENDING["euclid_continued_fraction"](spark, SF_SMOKE).collect(),
                  key=lambda r: r["k"])
    assert rows and rows[0]["quotient"] >= 0
    # convergent denominators strictly increase after k=1 and the
    # convergent recurrence holds step over step
    for a, b in zip(rows[1:], rows[2:]):
        assert b["conv_q"] > a["conv_q"]
        assert b["conv_p"] == b["quotient"] * a["conv_p"] + (
            rows[rows.index(a) - 1]["conv_p"] if rows.index(a) >= 1 else 1)


def test_swrr_counts_track_weights(spark):
    rows = PENDING["swrr_scheduler_replay"](spark, SF_SMOKE).collect()
    total_w = sum(r["weight"] for r in rows)
    assert sum(r["n_picked"] for r in rows) == 200
    for r in rows:
        expected = 200 * r["weight"] / total_w
        # SWRR's bounded-deviation property: within 1 of proportional
        assert abs(r["n_picked"] - expected) <= 1.0 + 1e-9, r


def test_ewma_chart_tracks_series(spark):
    rows = PENDING["ewma_control_chart"](spark, SF_SMOKE).collect()
    assert len(rows) > 100
    assert len({r["ewma_hundreds"] for r in rows}) > 10  # the line moves
    # an in-control majority (the chart is on the series' own moments)
    frac_out = sum(1 for r in rows if r["out_of_control"]) / len(rows)
    assert frac_out < 0.5


def test_josephus_survivor_in_range(spark):
    r = PENDING["josephus_survivor"](spark, SF_SMOKE).collect()[0]
    assert r["n_users"] > 1
    assert 0 <= r["survivor_idx0"] < r["n_users"]
    assert r["survivor_uid"] is not None


def test_tukey_fences_consistent(spark):
    rows = PENDING["tukey_fences_outliers"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["q1"] <= r["q3"] and r["n"] > 0
        assert 0 <= r["n_low"] + r["n_high"] < r["n"]
