from etl_mini_spark.queries._base import *  # noqa: F401,F403
from etl_mini_spark.queries._base import _t, _TMP  # noqa: F401

# Windows (SURVEY §2.5: DQ-21, DQ-22)
# =========================================================================

@q(
    "window_running_total",
    """SELECT o_custkey, o_orderkey,
              round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
       FROM orders""",
)
def window_running_total(spark, sf_dir):
    """DQ-21: running revenue per customer."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_total")
    )


@q(
    "window_topk_per_group",
    """SELECT o_custkey, o_orderkey, rn, round(o_totalprice, 2) AS o_totalprice FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) WHERE rn <= 3""",
)
def window_topk_per_group(spark, sf_dir):
    """DQ-22: top-3 orders per customer by row_number."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


@q(
    "window_lag_lead",
    """SELECT event_id,
              lag(event_id)  OVER w AS prev_event_id,
              lead(event_id) OVER w AS next_event_id,
              epoch_us(ts) - epoch_us(lag(ts) OVER w) AS micros_since_prev
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)
def window_lag_lead(spark, sf_dir):
    """§2.5: lag/lead + event-time deltas per user."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("micros_since_prev"),
    )


# =========================================================================
