from etl_mini_spark.queries._base import *  # noqa: F401,F403
from etl_mini_spark.queries._base import _t, _TMP  # noqa: F401

# Statistical aggregates (SURVEY §2.4 extension: the standard Spark
# aggregate surface beyond sum/count — one shuffle each, map-side
# partials, AQE-coalesced; identical plans at 100 TB)
# =========================================================================

@q(
    "agg_stats_suite",
    """SELECT l_returnflag,
              round(stddev_samp(l_extendedprice), 4) AS sd_price,
              round(var_samp(l_quantity), 4) AS var_qty,
              round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp,
              round(corr(l_discount, l_tax), 6) AS corr_dt
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_stats_suite(spark, sf_dir):
    """Moment aggregates (stddev/variance/covariance/correlation) per
    group — Spark's built-in numerically-stable one-pass merge formulas
    (partial-aggregable, unlike a naive two-pass plan)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_qp"),
            F.round(F.corr("l_discount", "l_tax"), 6).alias("corr_dt"),
        )
    )


@q(
    "agg_percentiles",
    """SELECT event_type,
              round(quantile_cont(value, 0.5), 6) AS p50,
              round(quantile_cont(value, 0.9), 6) AS p90,
              round(quantile_cont(value, 0.99), 6) AS p99
       FROM events GROUP BY event_type""",
)
def agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark `percentile` ≡
    DuckDB `quantile_cont`, both linear interpolation). Exact
    percentiles buffer the group's values — at 100 TB swap in
    `percentile_approx` (t-digest, bounded state; see
    agg_approx_distinct for the analogous sketch trade-off)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


@q(
    "agg_minmax_by",
    """SELECT o_custkey,
              (max(struct_pack(p := o_totalprice, k := o_orderkey))).k AS best_order,
              (min(struct_pack(p := o_totalprice, k := o_orderkey))).k AS worst_order,
              round((max(struct_pack(p := o_totalprice, k := o_orderkey))).p, 2) AS best_price
       FROM orders GROUP BY o_custkey""",
)
def agg_minmax_by(spark, sf_dir):
    """Deterministic arg-max/arg-min per group via lexicographic struct
    max — plain max_by/arg_max is nondeterministic under value ties, so
    the orderkey rides inside the comparison (SURVEY §7.4 determinism
    rule, same reasoning as ordered_dedup tie-breakers)."""
    s = F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max(s)["k"].alias("best_order"),
            F.min(s)["k"].alias("worst_order"),
            F.round(F.max(s)["p"], 2).alias("best_price"),
        )
    )


@q(
    "agg_histogram",
    """SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin,
              count(*) AS n, round(sum(value), 2) AS sum_v
       FROM events GROUP BY 1""",
)
def agg_histogram(spark, sf_dir):
    """Fixed-width histogram as a groupBy on the bin key — the
    shuffle carries only #bins rows after map-side partials, so this
    is scan-bound at any scale."""
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("bin", F.floor(F.col("value") / 50.0).cast("long"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_v"))
    )


# =========================================================================
