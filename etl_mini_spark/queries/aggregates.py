from etl_mini_spark.queries._base import *  # noqa: F401,F403
from etl_mini_spark.queries._base import _t, _TMP  # noqa: F401

# Aggregations (SURVEY §2.4: DQ-6, DQ-18…DQ-20)
# =========================================================================

@q(
    "agg_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
              round(avg(l_quantity), 6) AS avg_qty,
              round(avg(l_extendedprice), 6) AS avg_price,
              round(avg(l_discount), 6) AS avg_disc,
              count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus""",
)
def agg_pricing_summary(spark, sf_dir):
    """DQ-18 (A2): TPC-H Q1-style pricing summary — partial (map-side)
    aggregation then one shuffle on the 2-key group."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc), 2).alias("sum_disc_price"),
        F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@q(
    "agg_distinct",
    """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
              CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
              count(*) AS n_rows
       FROM events""",
)
def agg_distinct(spark, sf_dir):
    """DQ-19 (A3): exact distinct counts (approx_count_distinct is the
    scale path — benchmarked, not hash-compared)."""
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.count("*").alias("n_rows"),
    )


@q(
    "agg_rollup",
    """SELECT r_name, n_name, count(*) AS n, round(sum(c_acctbal), 2) AS sum_bal
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY ROLLUP (r_name, n_name)""",
)
def agg_rollup(spark, sf_dir):
    """DQ-20 (A4): rollup over the joined star."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 2).alias("sum_bal"))
    )


@q(
    "groupby_date_type",
    """SELECT event_type, strftime(ts, '%Y-%m-%d') AS d, count(*) AS n,
              CAST(min(event_id) AS BIGINT) AS min_id, CAST(max(event_id) AS BIGINT) AS max_id
       FROM events GROUP BY 1, 2""",
)
def groupby_date_type(spark, sf_dir):
    """DQ-6 (A1/S11): group-by (type, date) — ≡ parse_json_lines'
    {type: {date: [records]}} grouping (data_processing.py:18-60);
    the record lists become write.partitionBy in production."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("d")
    ).agg(
        F.count("*").alias("n"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


# =========================================================================
