from etl_mini_spark.queries._base import *  # noqa: F401,F403
from etl_mini_spark.queries._base import _t, _TMP  # noqa: F401

# Joins (SURVEY §2.3: DQ-13…DQ-17)
# =========================================================================

@q(
    "join_inner_revenue",
    """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment""",
)
def join_inner_revenue(spark, sf_dir):
    """DQ-13 (J1): equi inner join + aggregation; customer side is
    broadcast (dimension ≪ fact)."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


@q(
    "join_left_counts",
    """SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey""",
)
def join_left_counts(spark, sf_dir):
    """DQ-14 (J2): left outer join keeping zero-order customers."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@q(
    "join_anti_no_orders",
    """SELECT c_custkey, c_name FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderpriority = '1-URGENT')""",
)
def join_anti_no_orders(spark, sf_dir):
    """DQ-15 (J3): anti join — customers with no URGENT order. (Every
    customer has *some* order in the testdata, so the anti-join is run
    against the urgent subset to keep the expected result non-empty —
    a 0-row match proves nothing.)"""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@q(
    "join_semi_active",
    """SELECT c_custkey, c_mktsegment FROM customer
       WHERE EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND o_totalprice > 150000)""",
)
def join_semi_active(spark, sf_dir):
    """J3 semi: customers having a big order."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    c = _t(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


@q(
    "join_star_dims",
    """SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_bal
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name, n_name""",
)
def join_star_dims(spark, sf_dir):
    """DQ-13 fold (J4): two broadcast dimension hops up the star."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"), F.round(F.sum("c_acctbal"), 2).alias("sum_bal"))
    )


@q(
    "join_range_followups",
    """SELECT s.event_id AS signup_id, count(*) AS n_follow,
              CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_types
       FROM events s JOIN events e
         ON s.user_id = e.user_id
        AND e.ts > s.ts AND e.ts <= s.ts + INTERVAL 1 HOUR
       WHERE s.event_type = 'signup'
       GROUP BY s.event_id""",
)
def join_range_followups(spark, sf_dir):
    """DQ-16 (J5): interval join — events within 1h after each signup of
    the same user. Equi key (user_id) keeps it a hash join; the range is
    a post-join predicate, never a cross join."""
    e = _t(spark, sf_dir, "events")
    s = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), F.col("user_id").alias("s_uid"), F.col("ts").alias("s_ts")
    )
    joined = s.join(
        e,
        (F.col("s_uid") == e.user_id)
        & (e.ts > F.col("s_ts"))
        & (e.ts <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    return joined.groupBy("signup_id").agg(
        F.count("*").alias("n_follow"), F.countDistinct("event_type").alias("n_types")
    )


@q(
    "join_asof_last_order",
    """SELECT event_id, o_orderkey, round(o_totalprice, 2) AS o_totalprice
       FROM (
         SELECT e.event_id, o.o_orderkey, o.o_totalprice,
                row_number() OVER (PARTITION BY e.event_id
                                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
         FROM events e LEFT JOIN orders o
           ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
       ) WHERE rn = 1""",
)
def join_asof_last_order(spark, sf_dir):
    """DQ-17 (J6): as-of join — latest order at-or-before each event for
    the same user, via the single-shuffle union-sort operator (NOT the
    oracle's quadratic join+rank plan). Keys here are near-uniform, so
    this runs the lean single-window path; under celebrity-key skew pass
    ``bucket_seconds`` to asof_join for the time-bucketed parallel sort
    with boundary carry-in (row-identical, plan- and equivalence-tested
    in tests/test_operators.py) — measured +~0.9 s of fixed shuffle cost
    at sf0.1, which only pays for itself when a hot key would otherwise
    serialize one task."""
    e = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    res = asof_join(
        e.withColumnRenamed("user_id", "o_custkey"),
        o,
        on=["o_custkey"],
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
    )
    return res.select("event_id", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))


# =========================================================================
