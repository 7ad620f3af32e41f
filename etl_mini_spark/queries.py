"""Query registry: every implemented operator from SURVEY.md §2 as a
(spark_fn, oracle_sql) pair. The driver (and tests/test_queries_oracle)
runs the Spark side and the DuckDB oracle on the same parquet and
hash-compares values — names here ARE the correctness surface.

Conventions (hash-parity rules, FIXTURES.md §C):
- every computed column aliased identically in Spark and SQL
- timestamps/dates stringified ('yyyy-MM-dd[ HH:mm:ss]'), UTC session
- float aggregates rounded (2 for big sums, 6 for ratios/averages)
- integer aggregates cast to BIGINT in DuckDB (sum() is HUGEINT there)
- deterministic tie-breakers on every top-k / rank / limit
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_mini_spark.functions.registry import AdditionalField, default_registry, apply_additional_fields
from etl_mini_spark.functions.sanitize import sanitize_scalar
from etl_mini_spark.functions.time_fns import normalize_iso_col
from etl_mini_spark.operators import (
    asof_join,
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    embedding_near_dup_pairs,
    exact_dedup,
    merge_upsert,
    near_dup_pairs_minhash_lsh,
    near_dup_pairs_ngram_jaccard,
    ordered_dedup,
    simhash,
)
from etl_mini_spark.operators import text as TX
from etl_mini_spark.operators.multimodal import attach_binary_payload, decode_media
from etl_mini_spark.session import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# =========================================================================
# Scans / projections / filters (SURVEY §2.1-2.2: DQ-1, DQ-7…DQ-12)
# =========================================================================

@q(
    "scan_checksum",
    """SELECT count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_event_id,
              round(sum(value), 2) AS sum_value
       FROM events""",
)
def scan_checksum(spark, sf_dir):
    """DQ-1: full scan, count + checksum (reference S1 scan parity)."""
    return _t(spark, sf_dir, "events").agg(
        F.count("*").alias("cnt"),
        F.sum("event_id").alias("sum_event_id"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@q(
    "project_select",
    """SELECT event_id, event_type, strftime(ts, '%Y-%m-%d') AS ts_date
       FROM events""",
)
def project_select(spark, sf_dir):
    """DQ-7: projection pushed to the parquet scan (P1)."""
    return _t(spark, sf_dir, "events").select(
        "event_id", "event_type", F.date_format("ts", "yyyy-MM-dd").alias("ts_date")
    )


@q(
    "filter_time_range",
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
       FROM events
       WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
       GROUP BY event_type""",
)
def filter_time_range(spark, sf_dir):
    """DQ-10: half-open time-range predicate (P5), PUSHED to the parquet
    scan — the bound is applied to the raw ns value before conversion so
    row-group min/max stats prune (sources/readers.py)."""
    from datetime import datetime

    from etl_mini_spark.sources.readers import read_parquet_ts_range

    e = read_parquet_ts_range(
        spark,
        f"{sf_dir}/events.parquet",
        "ts",
        start=datetime(2024, 1, 10),
        end=datetime(2024, 1, 20),
    )
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


@q(
    "filter_term",
    """SELECT event_id, user_id, value FROM events
       WHERE event_type = 'click' AND user_id % 3 = 0""",
)
def filter_term(spark, sf_dir):
    """DQ-11: conjunctive term-equality filters (P6)."""
    e = _t(spark, sf_dir, "events")
    return e.filter((F.col("event_type") == "click") & (F.col("user_id") % 3 == 0)).select(
        "event_id", "user_id", "value"
    )


@q(
    "nested_json_extract",
    """SELECT event_id,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
              CAST(coalesce(json_extract_string(props, '$.missing'), 'dflt') AS VARCHAR) AS m
       FROM events""",
)
def nested_json_extract(spark, sf_dir):
    """DQ-8: nested-path extraction with default (P2/F4) from the JSON
    props column — ≡ the reference's nested_key walk
    (tsv_converter.py:169-177, data_processing.py:8-15)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.coalesce(F.get_json_object("props", "$.missing"), F.lit("dflt")).alias("m"),
    )


@q("tolerant_select", "SELECT c_custkey, c_name FROM customer")
def tolerant_select(spark, sf_dir):
    """DQ-9: tolerant column-subset select (P4) — requested columns that
    don't exist are skipped (require_all_columns=False semantics,
    pandas_select_and_enrich.py:60-69)."""
    c = _t(spark, sf_dir, "customer")
    wanted = ["c_custkey", "c_name", "bogus_column"]
    present = [x for x in wanted if x in c.columns]
    return c.select(*present)


@q(
    "drop_null_required",
    """SELECT count(*) AS cnt, round(sum(v2), 2) AS sum_v2 FROM (
         SELECT CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v2 FROM events
       ) WHERE v2 IS NOT NULL""",
)
def drop_null_required(spark, sf_dir):
    """DQ-12: not-null constraint as tolerant na.drop (P7/P8)."""
    e = _t(spark, sf_dir, "events").withColumn(
        "v2", F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value"))
    )
    return e.na.drop(subset=["v2"]).agg(
        F.count("*").alias("cnt"), F.round(F.sum("v2"), 2).alias("sum_v2")
    )


# =========================================================================
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
    oracle's quadratic join+rank plan)."""
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
# Sort / limit / dedup / set ops (SURVEY §2.6: DQ-23…DQ-26)
# =========================================================================

@q(
    "order_by_hash",
    """WITH per_day AS (
         SELECT strftime(ts, '%Y-%m-%d') AS day,
                md5(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY ts, event_id)) AS day_hash,
                count(*) AS cnt
         FROM events WHERE event_type = 'purchase' GROUP BY 1
       )
       SELECT md5(string_agg(day_hash, ',' ORDER BY day)) AS ordered_hash,
              CAST(sum(cnt) AS BIGINT) AS cnt
       FROM per_day""",
)
def order_by_hash(spark, sf_dir):
    """DQ-23 (O1): consumer-visible total order, checked scalably.

    Hash-of-the-ordered-id-stream as a SEGMENTED checksum: the sort-key
    space is partitioned deterministically (by day — a data-derived
    range, not Spark's partitioner, so both engines agree), each
    segment hashes its ids in (ts, event_id) order, and the final
    checksum hashes the segment hashes in segment order. Equal final
    hash ⇔ both engines agree on the total order. No group ever holds
    more than one segment's ids — unlike a global collect_list, which
    funnels every row through one task (the r01 version; VERDICT §wrong
    item 4). At finer scale, swap day → hour for smaller segments."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    per_day = e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id"))),
                    lambda s: s.getField("event_id").cast("string"),
                ),
                ",",
            )
        ).alias("day_hash"),
        F.count("*").alias("cnt"),
    )
    return per_day.agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("day", "day_hash"))),
                    lambda s: s.getField("day_hash"),
                ),
                ",",
            )
        ).alias("ordered_hash"),
        F.sum("cnt").alias("cnt"),
    )


@q(
    "dedup_keep_first",
    """SELECT user_id, event_type, event_id, value FROM (
         SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS rn
         FROM events) WHERE rn = 1""",
)
def dedup_keep_first(spark, sf_dir):
    """DQ-24 (D1): ordered keep-first dedup — the reference's
    sort+drop_duplicates(keep='first') (pandas_select_and_enrich.py:52-57)
    with an explicit event_id tie-breaker for determinism."""
    e = _t(spark, sf_dir, "events")
    return ordered_dedup(e, ["user_id", "event_type"], ["ts", "event_id"]).select(
        "user_id", "event_type", "event_id", "value"
    )


@q(
    "topk_limit",
    """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
       FROM lineitem
       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""",
)
def topk_limit(spark, sf_dir):
    """DQ-25 (O3): global top-k — Spark plans TakeOrderedAndProject
    (per-partition heap + driver merge), no full sort."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(10)
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("l_extendedprice"))
    )


@q(
    "set_union_halves",
    """SELECT event_type, count(*) AS n FROM (
         SELECT * FROM events WHERE ts <  TIMESTAMP '2024-01-15 00:00:00'
         UNION ALL
         SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
       ) GROUP BY event_type""",
)
def set_union_halves(spark, sf_dir):
    """DQ-26 (U1): union of two half-open slices == full table."""
    e = _t(spark, sf_dir, "events")
    a = e.filter(F.col("ts") < "2024-01-15 00:00:00")
    b = e.filter(F.col("ts") >= "2024-01-15 00:00:00")
    return a.unionByName(b).groupBy("event_type").agg(F.count("*").alias("n"))


@q(
    "set_intersect",
    """SELECT user_id FROM events WHERE event_type = 'click'
       INTERSECT
       SELECT user_id FROM events WHERE event_type = 'purchase'""",
)
def set_intersect(spark, sf_dir):
    """U1: users who both clicked and purchased."""
    e = _t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").select("user_id")
    b = e.filter(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


@q(
    "set_except",
    """SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events WHERE event_type = 'view'
       EXCEPT
       SELECT user_id, strftime(ts, '%Y-%m-%d') FROM events WHERE event_type = 'purchase'""",
)
def set_except(spark, sf_dir):
    """U1: (user, day) pairs that viewed but did not purchase that day.
    Keyed on (user_id, day) — per-user-only EXCEPT is empty in the
    testdata (every user hits every event type), and a 0-row = 0-row
    match is vacuous."""
    e = _t(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    a = e.filter(F.col("event_type") == "view").select("user_id", day)
    b = e.filter(F.col("event_type") == "purchase").select("user_id", day)
    return a.subtract(b)  # EXCEPT (set) semantics, matching the SQL oracle


# =========================================================================
# Scalar functions (SURVEY §2.7: DQ-27…DQ-31) + UDF registry (DQ-32)
# =========================================================================

@q(
    "time_derive_parts",
    """SELECT event_id,
              strftime(ts, '%Y-%m-%d %H:%M:%S') AS datetime_s,
              CAST(epoch_us(ts) % 1000000 AS BIGINT) AS time_mcs,
              strftime(date_trunc('month', ts), '%Y-%m-%d') AS month_
       FROM events""",
)
def time_derive_parts(spark, sf_dir):
    """DQ-28 (F2): the flagship derived-time columns, all native."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("datetime_s"),
        (F.unix_micros("ts") % 1000000).alias("time_mcs"),
        F.date_format(F.date_trunc("month", "ts"), "yyyy-MM-dd").alias("month_"),
    )


@q(
    "iso_normalize",
    """WITH raw AS (
         SELECT event_id,
                CASE WHEN event_id % 7 = 0
                     THEN substr(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'), 1, 19)
                     ELSE substr(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'), 1, 20 + event_id % 7)
                END AS iso
         FROM events)
       SELECT event_id,
              CASE WHEN strpos(iso, '.') = 0 THEN iso || '.000000'
                   ELSE rpad(iso, 26, '0') END AS iso_norm
       FROM raw""",
)
def iso_normalize(spark, sf_dir):
    """DQ-27 (F1): ISO fractional-second normalization to 6 digits over
    a corpus with 0-6 fraction digits (rounding/clamp cases unit-tested
    in tests/test_time_fns.py)."""
    e = _t(spark, sf_dir, "events")
    full = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    d = F.col("event_id") % 7
    raw = F.when(d == 0, F.substring(full, 1, 19)).otherwise(
        full.substr(F.lit(1), (d + 20).cast("int"))
    )
    return e.select(
        "event_id", normalize_iso_col(raw).alias("iso_norm")
    )


@q(
    "time_tz_trimode",
    """WITH src AS (
         SELECT event_id,
                strftime(ts, '%Y-%m-%dT%H:%M:%S') ||
                  CASE user_id % 3 WHEN 0 THEN 'Z' WHEN 1 THEN '+02:00' ELSE '' END AS iso,
                CASE user_id % 3 WHEN 1 THEN 120 ELSE 0 END AS off_min,
                CASE user_id % 3 WHEN 0 THEN 'Z' WHEN 1 THEN '+02:00' ELSE '' END AS suffix
         FROM events),
       parsed AS (
         SELECT event_id, suffix,
                strptime(CASE WHEN suffix = '' THEN iso
                              ELSE substr(iso, 1, 19) END, '%Y-%m-%dT%H:%M:%S')
                  - to_minutes(off_min) AS utc_ts
         FROM src)
       SELECT event_id,
              strftime(utc_ts, '%Y-%m-%d %H:%M:%S') AS datetime_s,
              strftime(date_trunc('month', utc_ts), '%Y-%m-%d') AS month_,
              (suffix = 'Z') AS offset_ok
       FROM parsed""",
)
def time_tz_trimode(spark, sf_dir):
    """DQ-29 (F2): the reference's timezone-expectation tri-mode
    (time_converter.py:105-120) over an offset-bearing ISO corpus built
    deterministically from events — a third each of 'Z', '+02:00' and
    naive suffixes (user_id % 3). Warning mode attaches ``offset_ok``
    (expected offset 'Z') and the parts extraction converts every
    offset to the UTC instant, so '+02:00' rows land 2 h earlier.
    Error/ignore modes are unit-tested (tests/test_time_fns.py); the
    oracle does the offset arithmetic explicitly (strptime − offset) so
    it is independent of DuckDB's session timezone."""
    from etl_mini_spark.functions.time_fns import check_expected_offset, iso_to_parts_cols

    e = _t(spark, sf_dir, "events")
    m = F.col("user_id") % 3
    suffix = F.when(m == 0, "Z").when(m == 1, "+02:00").otherwise("")
    iso = F.concat(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"), suffix)
    df = e.select("event_id", iso.alias("iso"))
    df = check_expected_offset(df, "iso", "Z", mode="warning")
    parts = iso_to_parts_cols(F.col("iso"))
    return df.select(
        "event_id",
        parts["datetime_s"].alias("datetime_s"),
        parts["month_s"].alias("month_"),
        "offset_ok",
    )


@q(
    "sanitize_values",
    """SELECT doc_id,
              md5(regexp_replace(text || chr(9) || lang, '[' || chr(9) || chr(10) || ']', ' ', 'g')) AS clean_md5,
              (n_chars > 400) AS is_long
       FROM documents""",
)
def sanitize_values(spark, sf_dir):
    """DQ-29 (F3): tab/newline sanitization + over-length flag."""
    d = _t(spark, sf_dir, "documents")
    dirty = F.concat_ws("\t", F.col("text"), F.col("lang"))
    return d.select(
        "doc_id",
        F.md5(sanitize_scalar(dirty)).alias("clean_md5"),
        (F.col("n_chars") > 400).alias("is_long"),
    )


@q(
    "placeholder_extract",
    """SELECT doc_id,
              array_to_string(regexp_extract_all('{' || lang || '} text {' || source || '}',
                                                 '\\{(.*?)\\}', 1), ',') AS placeholders
       FROM documents""",
)
def placeholder_extract(spark, sf_dir):
    """DQ-30 (F5): `{placeholder}` extraction (string_utils.py:5-26)."""
    d = _t(spark, sf_dir, "documents")
    tmpl = F.concat(F.lit("{"), F.col("lang"), F.lit("} text {"), F.col("source"), F.lit("}"))
    return d.select(
        "doc_id",
        F.array_join(F.regexp_extract_all(tmpl, F.lit(r"\{(.*?)\}"), 1), ",").alias("placeholders"),
    )


@q(
    "constant_columns",
    """SELECT p_partkey, 's3' AS source, 'v1' AS version, round(p_retailprice, 2) AS p_retailprice
       FROM part""",
)
def constant_columns(spark, sf_dir):
    """DQ-31 (F7): constant column injection via the additional_fields
    constant mode (tsv_converter.py:149-152)."""
    p = _t(spark, sf_dir, "part")
    specs = [AdditionalField(value="s3", output_fields=["source"]),
             AdditionalField(value="v1", output_fields=["version"])]
    out = apply_additional_fields(p, specs, default_registry())
    return out.select("p_partkey", "source", "version", F.round("p_retailprice", 2).alias("p_retailprice"))


@q(
    "udf_registry_iso_parts",
    """SELECT event_id,
              strftime(ts, '%Y-%m-%d %H:%M:%S') AS dt,
              CAST(epoch_us(ts) % 1000000 AS BIGINT) AS mcs,
              strftime(date_trunc('month', ts), '%Y-%m-%d') AS mon
       FROM events""",
)
def udf_registry_iso_parts(spark, sf_dir):
    """DQ-32 (§2.8): the registered iso_to_parts function applied through
    the closed UDF registry on the *pandas_udf* path (use_native=False) —
    proving the slow path computes exactly what the native rewrite does."""
    e = _t(spark, sf_dir, "events").withColumn(
        "iso", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    )
    spec = AdditionalField(
        value="iso_to_parts",
        input_mapping={"iso": "iso"},
        output_mapping={"datetime": "dt", "microseconds": "mcs", "month": "mon"},
        use_native=False,
    )
    out = apply_additional_fields(e, [spec], default_registry())
    return out.select("event_id", "dt", "mcs", "mon")


# =========================================================================
# Upsert (SURVEY §2.1 S9: DQ-5)
# =========================================================================

@q(
    "upsert_keyed",
    """WITH base AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 4 <> 0),
            upd AS (SELECT o_orderkey, o_totalprice + 1000 AS o_totalprice, 'U' AS o_orderstatus
                    FROM orders WHERE o_orderkey % 2 = 0)
       SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderstatus FROM upd
       UNION ALL
       SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderstatus FROM base
       WHERE NOT EXISTS (SELECT 1 FROM upd WHERE upd.o_orderkey = base.o_orderkey)""",
)
def upsert_keyed(spark, sf_dir):
    """DQ-5 (S9): keyed upsert — batch2 overrides batch1 on o_orderkey
    (ON CONFLICT DO UPDATE semantics, postgresql_service.py:213-229)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    base = o.filter(F.col("o_orderkey") % 4 != 0)
    upd = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
        F.lit("U").alias("o_orderstatus"),
    )
    merged = merge_upsert(base, upd, keys=["o_orderkey"])
    return merged.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "o_orderstatus"
    )


@q(
    "upsert_null_update",
    """WITH t AS (SELECT o_orderkey, o_totalprice, o_orderpriority, o_orderstatus
                  FROM orders WHERE o_orderkey % 2 = 0),
            s AS (SELECT o_orderkey, o_totalprice + 500 AS o_totalprice,
                         CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE upper(o_orderpriority) END AS o_orderpriority,
                         'N' AS o_orderstatus
                  FROM orders WHERE o_orderkey % 3 = 0),
            upd AS (SELECT t.o_orderkey,
                           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
                           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderpriority ELSE t.o_orderpriority END AS o_orderpriority,
                           t.o_orderstatus
                    FROM t LEFT JOIN s ON t.o_orderkey = s.o_orderkey)
       SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderpriority, o_orderstatus FROM upd
       UNION ALL
       SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderpriority, o_orderstatus FROM s
       WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.o_orderkey = s.o_orderkey)""",
)
def upsert_null_update(spark, sf_dir):
    """DQ-5b (S9): partial-column upsert where the source deliberately
    sets an update column to NULL — `ON CONFLICT DO UPDATE SET col =
    excluded.col` OVERWRITES with NULL (ref postgresql_service.py:
    213-229), it does not keep the stale target value. Every o_orderkey
    divisible by 12 hits the matched-row-with-explicit-NULL path, so a
    coalesce-style merge would hash-mismatch here. o_orderstatus is NOT
    an update column: matched rows keep the target's status, inserted
    rows carry the source's."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "o_orderstatus"
    )
    target = o.filter(F.col("o_orderkey") % 2 == 0)
    source = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + 500).alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.upper("o_orderpriority"))
        .alias("o_orderpriority"),
        F.lit("N").alias("o_orderstatus"),
    )
    merged = merge_upsert(
        target, source, keys=["o_orderkey"], update_columns=["o_totalprice", "o_orderpriority"]
    )
    return merged.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderpriority",
        "o_orderstatus",
    )


# =========================================================================
# Streaming-window batch equivalents (SURVEY §2.9: DQ-33)
# =========================================================================

@q(
    "window_tumbling_1h",
    """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
              event_type, count(*) AS n, round(sum(value), 2) AS sum_value
       FROM events GROUP BY 1, 2""",
)
def window_tumbling_1h(spark, sf_dir):
    """DQ-33: tumbling 1h window per event_type — identical groupBy
    works under readStream+watermark (streaming/windows.py)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@q(
    "window_session_30m",
    """WITH x AS (
         SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_sess
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       ), y AS (
         SELECT user_id, ts,
                sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess
         FROM x)
       SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
              count(*) AS n_events
       FROM y GROUP BY user_id, sess""",
)
def window_session_30m(spark, sf_dir):
    """DQ-33b: session windows (30-min gap) in batch via
    F.session_window — same expression streams with a watermark."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("mn"))
        .select(
            "user_id",
            F.date_format("mn", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


# =========================================================================
# North-star LLM-pipeline ops (SURVEY §2.11: DQ-34, DQ-35, dedup/text/ANN)
# =========================================================================

@q(
    "dedup_exact_docs",
    """SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
              CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS n_dups
       FROM documents GROUP BY 1""",
)
def dedup_exact_docs(spark, sf_dir):
    """DQ-34: exact dedup on normalized text."""
    return exact_dedup(_t(spark, sf_dir, "documents"), "text", "doc_id")


_JACCARD_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
     sh AS (SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) AS shingles
            FROM toks)
SELECT d1, d2, round(j, 6) AS jaccard FROM (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         len(list_intersect(a.shingles, b.shingles))::DOUBLE
           / len(list_distinct(list_concat(a.shingles, b.shingles))) AS j
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id) WHERE j >= 0.8
"""


@q("dedup_ngram_jaccard", _JACCARD_ORACLE)
def dedup_ngram_jaccard(spark, sf_dir):
    """Near-dup pairs, exact 3-word-shingle Jaccard ≥ 0.8 via inverted
    shingle index (the oracle brute-forces all pairs — deliberately a
    different plan shape for a stronger differential check)."""
    return near_dup_pairs_ngram_jaccard(_t(spark, sf_dir, "documents"), "doc_id", "text")


@q("dedup_minhash_lsh", _JACCARD_ORACLE)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(64)+LSH(16 bands, r=4) candidates, exact-verified at
    0.8 — per-pair miss prob (1-j⁴)¹⁶ ≈ 2e-4 at j=0.8, 4e-8 at j=0.9,
    so the oracle is the exact pair set. This is the 100 TB dedup path:
    candidate generation shuffles only (band, bucket) keys."""
    return near_dup_pairs_minhash_lsh(
        _t(spark, sf_dir, "documents"), "doc_id", "text", num_hashes=64, bands=16
    )


# SimHash oracle: DuckDB recomputes the exact 64-bit SimHash —
# whitespace tokens, per-token hash = first 8 md5 bytes big-endian
# (== python int.from_bytes(md5(tok).digest()[:8], 'big') ==
# ('0x'||substr(md5(tok),1,16))::UBIGINT), per-bit majority vote —
# then takes ALL pairs with bit_count(xor) <= 3. The Spark side must
# reproduce this exact pair set through the block-bucket LSH path.
_SIMHASH_BIT_SUMS = ",\n         ".join(
    f"sum(CAST((hv >> {i}) & 1 AS BIGINT)) AS b{i}" for i in range(64)
)
# bit weights as decimal literals: DuckDB's << overflows at bit 63
_SIMHASH_BIT_OR = " + ".join(
    f"(CASE WHEN 2 * v.b{i} > v.ntok THEN {1 << i}::UBIGINT ELSE 0::UBIGINT END)"
    for i in range(64)
)
_SIMHASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents
),
h AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS hv FROM toks
),
votes AS (
  SELECT doc_id, count(*) AS ntok,
         {_SIMHASH_BIT_SUMS}
  FROM h GROUP BY doc_id
),
sh AS (
  SELECT d.doc_id,
         COALESCE(({_SIMHASH_BIT_OR}), 0::UBIGINT) AS hv
  FROM documents d LEFT JOIN votes v ON d.doc_id = v.doc_id
)
SELECT a.doc_id AS d1, b.doc_id AS d2,
       CAST(bit_count(xor(a.hv, b.hv)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.hv, b.hv)) <= 3
"""


@q("dedup_simhash", _SIMHASH_ORACLE)
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs within hamming distance 3 via 4×16-bit
    block-bucket LSH (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 of 4 blocks equal,
    so recall is exactly 1) + exact bit_count(xor) verify. No all-pairs
    join anywhere — candidate volume is bounded by 16-bit block-bucket
    collisions. Differential oracle: DuckDB recomputes SimHash from
    scratch (same md5 token hash, same majority vote) and enumerates
    the exact pair set."""
    from etl_mini_spark.operators.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3, n_blocks=4
    )


@q(
    "similarity_topk",
    """SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
              round(list_cosine_similarity(c.embedding::DOUBLE[], p.embedding::DOUBLE[]), 6) AS cosine
       FROM embeddings c JOIN embeddings p
         ON p.vec_id % 50 = 0 AND c.vec_id <> p.vec_id
       QUALIFY row_number() OVER (PARTITION BY p.vec_id
                                  ORDER BY cosine DESC, c.vec_id) <= 5""",
)
def similarity_topk(spark, sf_dir):
    """DQ-35: exact top-5 cosine neighbors for probe vectors
    (vec_id % 50 = 0), brute force, JVM-side arithmetic."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0)
    return cosine_topk_bruteforce(emb, probes, k=5)


@q("similarity_ivf")  # recall<1 by design — rows-only check
def similarity_ivf(spark, sf_dir):
    """IVF ANN over trained spherical-k-means cells, nprobe=4/16 —
    the pruned scale path (scan ~25% of the corpus per probe)."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0)
    return cosine_topk_ivf(emb, probes, k=5, nprobe=4, n_cells=16)


@q(
    "embedding_near_dups",
    """SELECT a.vec_id AS id1, b.vec_id AS id2,
              round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45""",
)
def embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact scoring). Threshold 0.45:
    the synthetic embeddings are near-orthogonal (max natural cosine
    ~0.51 at sf0.01), so 0.95 yields an empty — vacuous — result;
    0.45 keeps a small non-empty pair set at every test SF."""
    return embedding_near_dup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.45)


@q(
    "embedding_near_dups_lsh",
    """WITH aug AS (
         SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
         UNION ALL
         SELECT vec_id + 1000000,
                list_transform(embedding::DOUBLE[], x -> x + 0.02)
         FROM embeddings WHERE vec_id % 25 = 0
       )
       SELECT a.vec_id AS id1, b.vec_id AS id2,
              round(list_cosine_similarity(a.embedding, b.embedding), 6) AS cosine
       FROM aug a JOIN aug b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95""",
)
def embedding_near_dups_lsh(spark, sf_dir):
    """Embedding near-dups via random-hyperplane LSH + exact verify —
    the non-broadcast 100 TB path (no side held in memory). Candidates
    are bucket cohabitants only; exact cosine verification makes the
    output the true pair set (per-pair miss prob ~3e-11 at cos≈0.987),
    so the oracle is the exact all-pairs query.

    The corpus is augmented with PLANTED near-dups (every 25th vector,
    re-inserted at vec_id+1e6 with +0.02 added to each component →
    cosine ≈ 0.987 to its source, ≤0.49 to everything else): the
    synthetic embeddings have no natural pairs above ~0.51, so without
    planting the ≥0.95 check is vacuously 0 = 0. Both engines build the
    same augmented corpus, so the oracle stays exact."""
    from etl_mini_spark.operators.similarity import embedding_near_dup_pairs_lsh

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.02)).alias("embedding"),
    )
    return embedding_near_dup_pairs_lsh(emb.unionByName(planted), threshold=0.95)


@q(
    "join_salted_skew",
    """SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS revenue
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment""",
)
def join_salted_skew(spark, sf_dir):
    """Skew-resistant salted join (deterministic salt, right side
    replicated) — row-identical to the plain join, so the oracle is the
    plain SQL join. The forced shuffle join shows the salt spreading
    one hot key over N reducers."""
    from etl_mini_spark.operators.joins import salted_join

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    j = salted_join(o, c.hint("shuffle_hash"), on=["o_custkey"], salts=8)
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )


@q(
    "text_quality",
    """SELECT doc_id,
              CAST(len(regexp_extract_all(trim(text), '\\S+')) AS BIGINT) AS n_tokens,
              round(len(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
                    / greatest(len(regexp_extract_all(trim(text), '\\S+')), 1), 6) AS avg_token_len,
              round(len(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE
                    / greatest(len(text), 1), 6) AS punct_ratio,
              round((len(regexp_extract_all(text, '\\bthe\\b')) + len(regexp_extract_all(text, '\\ba\\b'))
                     + len(regexp_extract_all(text, '\\bof\\b')) + len(regexp_extract_all(text, '\\band\\b'))
                     + len(regexp_extract_all(text, '\\bto\\b')) + len(regexp_extract_all(text, '\\bin\\b'))
                     + len(regexp_extract_all(text, '\\bis\\b')))::DOUBLE
                    / greatest(len(regexp_extract_all(trim(text), '\\S+')), 1), 6) AS stopword_ratio
       FROM documents""",
)
def text_quality(spark, sf_dir):
    """Quality features for corpus filtering (north star)."""
    d = _t(spark, sf_dir, "documents")
    out = TX.quality_features(d, "text", "doc_id")
    return out.select("doc_id", "n_tokens", "avg_token_len", "punct_ratio", "stopword_ratio")


@q(
    "text_token_counts",
    """SELECT doc_id,
              CAST(len(regexp_extract_all(trim(text), '\\S+')) AS BIGINT) AS n_ws_tokens,
              CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens
       FROM documents""",
)
def text_token_counts(spark, sf_dir):
    """Token counting: whitespace + BPE-ish regex pre-tokens."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count(F.col("text")).cast("long").alias("n_ws_tokens"),
        TX.bpe_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


@q(
    "text_lang_id",
    """SELECT doc_id,
              CASE WHEN s_en >= s_fr AND s_en >= s_es THEN 'en'
                   WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS pred_lang
       FROM (SELECT doc_id,
                    len(regexp_extract_all(text, '\\bthe\\b')) + len(regexp_extract_all(text, '\\ba\\b'))
                      + len(regexp_extract_all(text, '\\bof\\b')) + len(regexp_extract_all(text, '\\band\\b'))
                      + len(regexp_extract_all(text, '\\bto\\b')) AS s_en,
                    len(regexp_extract_all(text, '\\ble\\b')) + len(regexp_extract_all(text, '\\bla\\b'))
                      + len(regexp_extract_all(text, '\\bde\\b')) + len(regexp_extract_all(text, '\\bet\\b'))
                      + len(regexp_extract_all(text, '\\bles\\b')) AS s_fr,
                    len(regexp_extract_all(text, '\\bel\\b')) + len(regexp_extract_all(text, '\\bla\\b'))
                      + len(regexp_extract_all(text, '\\bde\\b')) + len(regexp_extract_all(text, '\\by\\b'))
                      + len(regexp_extract_all(text, '\\blos\\b')) AS s_es
             FROM documents)""",
)
def text_lang_id(spark, sf_dir):
    """Marker-word language ID heuristic (deterministic precedence)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TX.lang_id(F.col("text")).alias("pred_lang"))


@q(
    "text_fingerprint",
    """SELECT doc_id,
              md5(array_to_string(list_sort(list_distinct(
                    regexp_extract_all(trim(lower(text)), '\\S+'))), ' ')) AS fp
       FROM documents""",
)
def text_fingerprint(spark, sf_dir):
    """Order-insensitive doc fingerprint (sorted distinct token set)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))


@q(
    "multimodal_decode",
    """SELECT doc_id,
              CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
              sha256(text) AS sha256,
              CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
              CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INT) AS height,
              CAST(octet_length(encode(text)) % 16 + 1 AS INT) AS n_frames
       FROM documents""",
)
def multimodal_decode(spark, sf_dir):
    """Multimodal plumbing: binary payload column → mapInPandas decode
    (deterministic stub kernel; real batch/schema/Arrow path)."""
    d = attach_binary_payload(_t(spark, sf_dir, "documents"), "text")
    return decode_media(d, "doc_id")


# =========================================================================
# File-format roundtrips (SURVEY §2.1 S3/S5: DQ-2, DQ-3)
# =========================================================================

_TMP = Path("/root/repo/tmp")


@q(
    "http_api_extract",
    """SELECT CAST(range AS BIGINT) AS id,
              'row_' || range AS name,
              round(range * 1.5, 2) AS value
       FROM range(100)""",
)
def http_api_extract(spark, sf_dir):
    """S4: template-driven HTTP-API extract (≡ reference
    simple_api_service.py:19-61) landed as a DataFrame. The transport
    is a deterministic stub (no network in the harness): it parses the
    RENDERED url — so template selection, placeholder validation and
    substitution are all on the exercised path — and synthesizes the n
    requested JSON rows. The oracle regenerates the same rows from
    DuckDB's range()."""
    from etl_mini_spark.sources.http_api import fetch_to_dataframe

    templates = {
        "export": {
            "url": "stub://export/{TABLE}?n={N}",
            "headers": {"Authorization": "Bearer {TOKEN}"},
            "method": "GET",
        }
    }

    def stub_transport(request):
        import json as _json
        from urllib.parse import parse_qs, urlparse

        assert request["headers"]["Authorization"] == "Bearer tok0"
        n = int(parse_qs(urlparse(request["url"]).query)["n"][0])
        rows = [{"id": i, "name": f"row_{i}", "value": round(i * 1.5, 2)} for i in range(n)]
        return 200, "application/json", _json.dumps(rows).encode()

    return fetch_to_dataframe(
        spark,
        templates,
        "export",
        {"TABLE": "events", "N": "100", "TOKEN": "tok0"},
        transport=stub_transport,
        schema="id long, name string, value double",
    )


@q(
    "csv_roundtrip",
    """SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price,
              CAST(min(strftime(l_shipdate, '%Y-%m-%d')) AS VARCHAR) AS min_ship
       FROM lineitem WHERE l_orderkey % 10 = 0 GROUP BY l_returnflag""",
)
def csv_roundtrip(spark, sf_dir):
    """DQ-2 (S3/F6): export→CSV→re-read with explicit schema + renames +
    coercing casts (≡ the S3 chunked CSV scan, s3_service.py:155-184),
    then checksum."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    path = str(_TMP / f"csv_roundtrip_{Path(sf_dir).name}")
    (
        l.select(
            F.col("l_orderkey").alias("Order Key"),
            F.col("l_returnflag").alias("Return Flag"),
            F.col("l_extendedprice").alias("Extended Price"),
            F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("Ship Date"),
        )
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )
    schema = T.StructType(
        [
            T.StructField("Order Key", T.LongType()),
            T.StructField("Return Flag", T.StringType()),
            T.StructField("Extended Price", T.DoubleType()),
            T.StructField("Ship Date", T.StringType()),
        ]
    )
    rename = {"Order Key": "l_orderkey", "Return Flag": "l_returnflag",
              "Extended Price": "l_extendedprice", "Ship Date": "l_shipdate"}
    back = spark.read.option("header", True).schema(schema).csv(path).withColumnsRenamed(rename)
    back = back.withColumn("l_shipdate", F.try_to_timestamp("l_shipdate"))
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.min(F.date_format("l_shipdate", "yyyy-MM-dd")).alias("min_ship"),
    )


@q(
    "ndjson_roundtrip",
    """SELECT event_type, count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id
       FROM events WHERE user_id % 5 = 0 GROUP BY event_type""",
)
def ndjson_roundtrip(spark, sf_dir):
    """DQ-3 (S5/F9): events subset → JSON-Lines → re-read → checksum."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 0)
    path = str(_TMP / f"ndjson_roundtrip_{Path(sf_dir).name}")
    e.select("event_id", "event_type", "user_id").write.mode("overwrite").json(path)
    back = spark.read.json(path)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("event_id").alias("sum_id")
    )


# =========================================================================
# SQL surface — same engine, ANSI-SQL entry point (spark.sql); the SQL
# string compiles to the same Catalyst plans as the DataFrame API.
# =========================================================================

_Q3_SQL = """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


@q("sql_q3_shipping", _Q3_SQL)
def sql_q3_shipping(spark, sf_dir):
    """TPC-H Q3 (shipping priority) submitted as a plain SQL string —
    demonstrates the ANSI-SQL entry point over registered views."""
    from etl_mini_spark.session import register_tables

    register_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(
        _Q3_SQL.replace("strftime(o_orderdate, '%Y-%m-%d')",
                        "date_format(o_orderdate, 'yyyy-MM-dd')")
    )


# =========================================================================
# Extended aggregation surface (SURVEY §2.4 A4: cube / grouping sets /
# approx-distinct) and windowed/sliding/pivot shapes
# =========================================================================

@q(
    "agg_cube",
    """SELECT r_name, n_name, count(*) AS n, round(sum(c_acctbal), 2) AS sum_bal
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY CUBE (r_name, n_name)""",
)
def agg_cube(spark, sf_dir):
    """A4: cube over the joined star (all 4 grouping-set combinations)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .cube("r_name", "n_name")
        .agg(F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 2).alias("sum_bal"))
    )


@q(
    "agg_grouping_sets",
    """SELECT r_name, mktsegment, count(*) AS n
       FROM (SELECT r_name, c_mktsegment AS mktsegment
             FROM customer
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey)
       GROUP BY GROUPING SETS ((r_name), (mktsegment))""",
)
def agg_grouping_sets(spark, sf_dir):
    """A4: explicit grouping sets — per-region and per-segment totals in
    one pass (SQL surface; Spark expands to a single shuffle)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", F.col("c_mktsegment").alias("mktsegment"))
    )
    j.createOrReplaceTempView("__gs_in")
    return spark.sql(
        """SELECT r_name, mktsegment, count(*) AS n
           FROM __gs_in GROUP BY GROUPING SETS ((r_name), (mktsegment))"""
    )


@q("agg_approx_distinct")  # approximate by design — rows-only check
def agg_approx_distinct(spark, sf_dir):
    """A3 scale path: HyperLogLog++ distinct counts. At 100 TB the exact
    count-distinct shuffle is the bottleneck; HLL sketches aggregate
    map-side into a few KB per partition. rsd pinned for determinism."""
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.approx_count_distinct("event_type", rsd=0.01).alias("approx_types"),
    )


@q(
    "window_sliding_15m",
    """WITH slid AS (
         SELECT event_type,
                unnest([time_bucket(INTERVAL '15 minutes', ts) - to_minutes(15*k)
                        for k in range(0, 4)]) AS window_start
         FROM events)
       SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
              event_type, count(*) AS n
       FROM slid GROUP BY 1, 2""",
)
def window_sliding_15m(spark, sf_dir):
    """§2.9: 1-hour window sliding every 15 min (each event lands in 4
    windows). Same function body serves readStream inputs."""
    from etl_mini_spark.streaming.windows import sliding_counts

    e = _t(spark, sf_dir, "events")
    out = sliding_counts(e, "ts", ["event_type"], width="1 hour", slide="15 minutes")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
    )


@q(
    "pivot_type_counts",
    """SELECT user_id,
              CAST(count(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS click,
              CAST(count(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS view,
              CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
              CAST(count(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS signup,
              CAST(count(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS error
       FROM events GROUP BY user_id""",
)
def pivot_type_counts(spark, sf_dir):
    """Pivot: per-user event-type count matrix. Explicit value list —
    an unpinned pivot would need an extra distinct pass at scale."""
    e = _t(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c)
          for c in ["click", "view", "purchase", "signup", "error"]],
    )


@q(
    "unpivot_part_metrics",
    """SELECT p_partkey, metric, round(value, 2) AS value FROM (
         SELECT p_partkey, 'size' AS metric, p_size::DOUBLE AS value FROM part
         UNION ALL
         SELECT p_partkey, 'retailprice' AS metric, p_retailprice::DOUBLE AS value FROM part)""",
)
def unpivot_part_metrics(spark, sf_dir):
    """Unpivot (melt): wide part metrics → long (key, metric, value)."""
    p = _t(spark, sf_dir, "part")
    return p.unpivot(
        "p_partkey",
        [F.col("p_size").cast("double").alias("size"),
         F.col("p_retailprice").cast("double").alias("retailprice")],
        "metric",
        "value",
    ).select("p_partkey", "metric", F.round("value", 2).alias("value"))


@q(
    "array_math_suite",
    """SELECT vec_id,
              CAST(len(embedding) AS INT) AS dim,
              round(list_min(embedding)::DOUBLE, 6) AS vmin,
              round(list_max(embedding)::DOUBLE, 6) AS vmax,
              round(list_sum(embedding::DOUBLE[]), 6) AS vsum,
              round(sqrt(list_sum([x*x for x in embedding::DOUBLE[]])), 6) AS l2norm
       FROM embeddings""",
)
def array_math_suite(spark, sf_dir):
    """§2.7 array/math surface over array<float>: size, min/max,
    aggregate-sum, L2 norm — all JVM-side higher-order functions."""
    e = _t(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("vmin"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("vmax"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x), 6).alias("vsum"),
        F.round(F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x * x)), 6).alias("l2norm"),
    )


@q(
    "multimodal_frames",
    """SELECT doc_id, CAST(unnest(range(0, octet_length(encode(text)) % 16 + 1, 4)) AS INT) AS frame_idx
       FROM documents""",
)
def multimodal_frames(spark, sf_dir):
    """Frame sampling plumbing: one row per sampled frame (stub demuxer,
    real mapInPandas batch shape). Oracle reproduces the deterministic
    frame-count rule."""
    from etl_mini_spark.operators.multimodal import frame_sample

    d = attach_binary_payload(_t(spark, sf_dir, "documents"), "text")
    return frame_sample(d, "doc_id").select("doc_id", "frame_idx")


@q("multimodal_resize")  # binary payload output — rows-only check
def multimodal_resize(spark, sf_dir):
    """Resize plumbing (stub kernel): fixed target dims, binary out."""
    from etl_mini_spark.operators.multimodal import resize_media

    d = attach_binary_payload(_t(spark, sf_dir, "documents"), "text")
    return resize_media(d, "doc_id")


@q("multimodal_features")  # float32 stub embedding — rows-only check
def multimodal_features(spark, sf_dir):
    """Feature extraction plumbing: payload → dense array<float> via the
    stub embedder; output feeds operators/similarity.py unchanged."""
    from etl_mini_spark.operators.multimodal import extract_features

    d = attach_binary_payload(_t(spark, sf_dir, "documents"), "text")
    out = extract_features(d, "doc_id")
    return out.select(
        "doc_id",
        F.size("feature").alias("dim"),
        F.round(F.aggregate(F.transform("feature", lambda x: x.cast("double")), F.lit(0.0), lambda a, x: a + x), 6).alias("fsum"),
    )


# =========================================================================
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
# Deterministic sampling / dataset splits (operators/sampling.py — the
# training-data split idiom: membership is a pure function of the key,
# so it reproduces on any engine and needs no shuffle)
# =========================================================================

_BUCKET_SQL = "CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR) || ':{salt}'), 1, 15)) AS BIGINT) % 100000"


@q(
    "sample_split_counts",
    f"""WITH s AS (
         SELECT event_type, value,
                {_BUCKET_SQL.format(key='event_id', salt='split')} AS b
         FROM events)
       SELECT CASE WHEN b < 80000 THEN 'train'
                   WHEN b < 90000 THEN 'val' ELSE 'test' END AS split,
              event_type, count(*) AS n, round(sum(value), 2) AS sum_value
       FROM s GROUP BY 1, 2""",
)
def sample_split_counts(spark, sf_dir):
    """80/10/10 train/val/test split of events by event_id hash —
    disjoint, exhaustive, engine-portable; the split itself is a
    narrow map (zero shuffle), only this audit aggregation shuffles."""
    from etl_mini_spark.operators.sampling import split_assign

    e = _t(spark, sf_dir, "events")
    s = split_assign(e, "event_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return s.groupBy("split", "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


@q(
    "sample_deterministic",
    f"""SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id
       FROM events
       WHERE {_BUCKET_SQL.format(key='event_id', salt='')} < 5000""",
)
def sample_deterministic(spark, sf_dir):
    """~5% hash sample with a row-set checksum: the same rows are
    selected regardless of engine, run, or partitioning (df.sample is
    seed+partition dependent and can't promise that)."""
    from etl_mini_spark.operators.sampling import deterministic_sample

    e = _t(spark, sf_dir, "events")
    return deterministic_sample(e, "event_id", 0.05).agg(
        F.count("*").alias("n"), F.sum("event_id").alias("sum_id")
    )


@q(
    "sample_stratified_docs",
    """SELECT lang, doc_id FROM (
         SELECT lang, doc_id,
                row_number() OVER (PARTITION BY lang
                                   ORDER BY md5(CAST(doc_id AS VARCHAR) || ':'), doc_id) AS rk
         FROM documents) WHERE rk <= 20""",
)
def sample_stratified_docs(spark, sf_dir):
    """Class-balanced sampling: exactly 20 docs per language, ranked by
    key hash inside each stratum (deterministic pseudo-random order)."""
    from etl_mini_spark.operators.sampling import stratified_take

    d = _t(spark, sf_dir, "documents")
    return stratified_take(d, ["lang"], 20, "doc_id").select("lang", "doc_id")


# =========================================================================
# Extended SQL surface: multi-way joins + subqueries as ANSI-SQL strings.
# The engine's SQL entry point is spark.sql over registered views; the
# oracle is the identical string on duckdb (dialect-portable SQL).
# =========================================================================

_Q5_SQL = """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
"""


@q("sql_q5_local_volume", _Q5_SQL)
def sql_q5_local_volume(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): 6-way join with a same-nation
    theta condition, submitted as plain SQL. Catalyst broadcast-joins the
    three dims and reorders the fact joins; at cluster scale the
    customer/orders/lineitem joins shuffle on their keys while
    supplier/nation/region stay broadcast."""
    from etl_mini_spark.session import register_tables

    register_tables(
        spark, sf_dir, ["customer", "orders", "lineitem", "supplier", "nation", "region"]
    )
    return spark.sql(_Q5_SQL)


_Q10_SQL = """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


@q("sql_q10_returned", _Q10_SQL)
def sql_q10_returned(spark, sf_dir):
    """TPC-H Q10 (returned-item report): fact-fact join + top-20 by
    aggregated revenue. The ORDER BY ... LIMIT compiles to TakeOrderedAndProject
    (per-partition top-k, no global sort) — the plan that survives 100 TB."""
    from etl_mini_spark.session import register_tables

    register_tables(spark, sf_dir, ["customer", "orders", "lineitem", "nation"])
    return spark.sql(_Q10_SQL)


_EXISTS_SQL = """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
"""


@q("sql_exists_urgent", _EXISTS_SQL)
def sql_exists_urgent(spark, sf_dir):
    """Correlated EXISTS subquery — Catalyst rewrites it to a left-semi
    join on o_custkey (no per-row subquery execution)."""
    from etl_mini_spark.session import register_tables

    register_tables(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_EXISTS_SQL)


_SCALAR_SQL = """
    SELECT p_brand, count(*) AS n, round(min(p_retailprice), 2) AS min_price
    FROM part
    WHERE p_retailprice > (SELECT round(avg(p_retailprice), 0) FROM part)
    GROUP BY p_brand
"""


@q("sql_scalar_above_avg", _SCALAR_SQL)
def sql_scalar_above_avg(spark, sf_dir):
    """Uncorrelated scalar subquery in a predicate — executed once,
    result broadcast into the filter (the avg is rounded to a whole unit
    so the float boundary cannot flip rows between engines)."""
    from etl_mini_spark.session import register_tables

    register_tables(spark, sf_dir, ["part"])
    return spark.sql(_SCALAR_SQL)


_CLUSTERS_ORACLE = """
WITH RECURSIVE
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT doc_id,
              list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             for i in range(1, len(w) - 1)]) AS shingles
       FROM toks),
pairs AS (
  SELECT d1, d2 FROM (
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           len(list_intersect(a.shingles, b.shingles))::DOUBLE
             / len(list_distinct(list_concat(a.shingles, b.shingles))) AS j
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id) WHERE j >= 0.8),
edges AS (SELECT d1 AS a, d2 AS b FROM pairs
          UNION SELECT d2, d1 FROM pairs),
reach(node, lbl) AS (
    SELECT a, a FROM edges
  UNION
    SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node),
comp AS (SELECT node AS doc_id, min(lbl) AS cluster_rep FROM reach GROUP BY node)
SELECT doc_id, cluster_rep,
       count(*) OVER (PARTITION BY cluster_rep) AS cluster_size
FROM comp
"""


@q("dedup_clusters", _CLUSTERS_ORACLE)
def dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTER assignment: shingle-Jaccard pairs (≥0.8) →
    transitive closure via iterative min-label propagation → one
    representative (min doc_id) per component plus the component size.
    The keep/drop decision a dedup pipeline actually needs — pairs alone
    under-delete when A~B and B~C but A~C is below threshold. The oracle
    recomputes the closure with a recursive CTE (a completely different
    evaluation strategy — strong differential check)."""
    from etl_mini_spark.operators.dedup import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = near_dup_pairs_ngram_jaccard(d, "doc_id", "text")
    comp = connected_components(pairs)
    w = Window.partitionBy("cluster_rep")
    return comp.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("cluster_rep")
    ).withColumn("cluster_size", F.count("*").over(w))


@q(
    "text_redact_pii",
    r"""WITH src AS (
         SELECT doc_id,
                text || ' contact user' || doc_id || '@example.com or 10.0.0.' ||
                (doc_id % 256) || ' card 4111111111111111' AS text
         FROM documents)
       SELECT doc_id,
              regexp_replace(
                regexp_replace(
                  regexp_replace(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
                '\b\d{13,16}\b', '<NUM>', 'g') AS redacted
       FROM src""",
)
def text_redact_pii(spark, sf_dir):
    """PII redaction (email/IPv4/card-shaped digit runs → typed tokens)
    over a corpus with deterministically INJECTED PII — the raw
    documents contain none, so redacting them alone would be a no-op
    check. Both engines build the same augmented text, redact, and
    compare full output strings. Pure regexp_replace chain: whole-stage
    codegen, linear scan at any scale."""
    from etl_mini_spark.operators.text import redact_pii

    d = _t(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com or 10.0.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit(" card 4111111111111111"),
    )
    return d.select("doc_id", redact_pii(injected).alias("redacted"))


@q(
    "doc_chunks",
    r"""WITH t AS (
         SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
       nz AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
       s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 64)) AS start FROM nz)
       SELECT doc_id, CAST(start / 64 AS BIGINT) AS chunk_id,
              array_to_string(toks[start+1:start+128], ' ') AS chunk,
              CAST(len(toks[start+1:start+128]) AS BIGINT) AS n_tokens
       FROM s""",
)
def doc_chunks(spark, sf_dir):
    """Overlapping token-window chunking (window 128, stride 64) — the
    tokenize-and-pack step before embedding/training. Narrow explode,
    no shuffle; chunk text compared verbatim against the oracle."""
    from etl_mini_spark.operators.text import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), "doc_id", "text", window=128, stride=64
    )


@q(
    "corpus_top_bigrams",
    r"""WITH t AS (
         SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
         ),
       bg AS (
         SELECT unnest(list_transform(list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
                                      p -> p[1] || ' ' || p[2])) AS ngram
         FROM t WHERE len(toks) >= 2)
       SELECT ngram, CAST(count(*) AS BIGINT) AS n
       FROM bg GROUP BY ngram
       ORDER BY n DESC, ngram LIMIT 20""",
)
def corpus_top_bigrams(spark, sf_dir):
    """Corpus-level top-20 bigrams (count desc, ngram tie-break) —
    boilerplate/contamination statistics. Map-side partial agg means
    the shuffle carries distinct ngrams only."""
    from etl_mini_spark.operators.text import top_ngrams

    return top_ngrams(_t(spark, sf_dir, "documents"), "text", k=20)


@q(
    "join_full_outer",
    """SELECT COALESCE(a.c_custkey, b.o_custkey) AS custkey,
              a.c_acctbal, b.n_urgent
       FROM (SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal
             FROM customer WHERE c_acctbal > 9000) a
       FULL OUTER JOIN
            (SELECT o_custkey, count(*) AS n_urgent FROM orders
             WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) b
       ON a.c_custkey = b.o_custkey""",
)
def join_full_outer(spark, sf_dir):
    """J2 full outer: rich customers ⟗ urgent-order counts — both sides
    keep unmatched rows (high-balance customers with no urgent orders;
    urgent-order customers below the balance cut)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(
        "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_urgent"))
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"), "c_acctbal", "n_urgent"
    )


@q(
    "window_rank_suite",
    """SELECT l_orderkey, l_linenumber,
              rank()         OVER w AS rnk,
              dense_rank()   OVER w AS drnk,
              round(percent_rank() OVER w, 6) AS prnk,
              round(cume_dist()    OVER w, 6) AS cdist,
              ntile(4)       OVER w AS quartile
       FROM lineitem
       WINDOW w AS (PARTITION BY l_returnflag
                    ORDER BY round(l_extendedprice, 2) DESC, l_orderkey, l_linenumber)""",
)
def window_rank_suite(spark, sf_dir):
    """W-suite: rank / dense_rank / percent_rank / cume_dist / ntile
    under one deterministic total order per partition."""
    l = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.round("l_extendedprice", 2).desc(), "l_orderkey", "l_linenumber"
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


@q(
    "string_fns_suite",
    """SELECT p_partkey,
              upper(p_brand) AS brand_u,
              CAST(length(p_name) AS BIGINT) AS name_len,
              substr(p_name, 1, 12) AS name_prefix,
              replace(p_type, ' ', '_') AS type_snake,
              lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
              reverse(p_brand) AS brand_rev,
              CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
              CAST(levenshtein(p_brand, 'Brand#13') AS BIGINT) AS brand_dist,
              concat_ws('|', p_brand, p_type) AS brand_type
       FROM part""",
)
def string_fns_suite(spark, sf_dir):
    """F-suite: the common string-function surface (case, length,
    substring, replace, pad, reverse, find, edit distance, concat) —
    all JVM built-ins, semantics pinned against DuckDB."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr("p_name", "a").cast("long").alias("first_a"),
        F.levenshtein("p_brand", F.lit("Brand#13")).cast("long").alias("brand_dist"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


@q(
    "window_time_range_7d",
    """SELECT event_id, user_id,
              round(avg(value) OVER (
                PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW), 6)
                AS avg_7d,
              CAST(count(*) OVER (
                PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW) AS BIGINT)
                AS n_7d
       FROM events""",
)
def window_time_range_7d(spark, sf_dir):
    """W-range: trailing-7-day moving average per user — a true
    time-RANGE frame (all rows within the interval, regardless of row
    count), not a ROWS frame. Spark expresses interval ranges by
    ordering on epoch MICROseconds with a microsecond-wide rangeBetween
    — full timestamp precision, so the frame boundaries agree with an
    engine that compares timestamps exactly (unix_timestamp() would
    truncate to seconds and create frame peers the oracle doesn't
    have). Frames are tie-safe by construction: every row with the same
    ts is in the same frame, so no tie-breaker is needed."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-7 * 24 * 3600 * 1_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("avg_7d"),
        F.count("*").over(w).alias("n_7d"),
    )


@q(
    "groupwise_zscore",
    """SELECT event_id, event_type,
              round((value - avg(value) OVER (PARTITION BY event_type))
                    / stddev_samp(value) OVER (PARTITION BY event_type), 6) AS z
       FROM events""",
)
def groupwise_zscore(spark, sf_dir):
    """Group-wise standardization (z-score per event_type) — the
    feature-engineering normalization pass, done with whole-partition
    window aggregates: ONE shuffle on the group key instead of an
    aggregate + join-back two-pass plan."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    z = (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
    return e.select("event_id", "event_type", F.round(z, 6).alias("z"))


@q(
    "funnel_conversion",
    """WITH seq AS (
         SELECT user_id, ts, event_id, event_type,
                min(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase
         FROM events),
       clicks AS (
         SELECT strftime(ts, '%Y-%m-%d') AS day,
                (next_purchase IS NOT NULL AND next_purchase <= ts + INTERVAL 24 HOUR)
                  AS converted
         FROM seq WHERE event_type = 'click')
       SELECT day, count(*) AS n_clicks,
              CAST(count(*) FILTER (WHERE converted) AS BIGINT) AS n_converted,
              round(count(*) FILTER (WHERE converted)::DOUBLE / count(*), 6) AS conv_rate
       FROM clicks GROUP BY day""",
)
def funnel_conversion(spark, sf_dir):
    """Funnel analysis: click→purchase conversion within 24 h, per
    click day. The forward-looking 'next purchase after this event' is
    one min-over-following-frame window per user — no self-join, one
    shuffle on user_id, then a tiny day-level aggregate. (The backward
    twin is operators/joins.asof_join.) Deterministic frame via the
    (ts, event_id) total order in BOTH engines."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nxt = F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(w)
    clicks = (
        e.withColumn("next_purchase", nxt)
        .filter(F.col("event_type") == "click")
        .select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            (
                F.col("next_purchase").isNotNull()
                & (F.col("next_purchase") <= F.col("ts") + F.expr("INTERVAL 24 HOURS"))
            ).alias("converted"),
        )
    )
    return clicks.groupBy("day").agg(
        F.count("*").alias("n_clicks"),
        F.count_if("converted").alias("n_converted"),
        F.round(F.count_if("converted") / F.count("*"), 6).alias("conv_rate"),
    )


@q(
    "timeseries_resample_fill",
    """WITH bounds AS (SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events),
       grid AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds),
       types AS (SELECT DISTINCT event_type AS et FROM events),
       cnt AS (SELECT ts::DATE AS day, event_type, count(*) AS n,
                      round(avg(value), 6) AS avg_v
               FROM events GROUP BY 1, 2)
       SELECT strftime(g.day, '%Y-%m-%d') AS day, t.et AS event_type,
              CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
              round(last_value(c.avg_v IGNORE NULLS) OVER (
                PARTITION BY t.et ORDER BY g.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS avg_value_locf
       FROM grid g CROSS JOIN types t
       LEFT JOIN cnt c ON c.day = g.day AND c.event_type = t.et""",
)
def timeseries_resample_fill(spark, sf_dir):
    """Time-series regularization: daily grid per event_type over the
    full span, counts zero-filled and mean value LOCF-filled — the
    resample step before windowed features. Grid is days×types (tiny);
    only the initial aggregate scales with event volume."""
    from etl_mini_spark.operators.timeseries import resample_daily_fill

    return resample_daily_fill(_t(spark, sf_dir, "events"), "ts", "event_type", "value")


@q("stream_capped_sessions")  # custom stateful streaming — genuinely no SQL twin
def stream_capped_sessions(spark, sf_dir):
    """ST-custom: applyInPandasWithState capped sessionization run as a
    real stream (file source, AvailableNow) and read back. The span-cap
    rule is iterative per key (each split decision depends on the
    previous one), so there is no window-function SQL twin — the
    differential check lives in tests/test_streaming.py against a
    pure-python reference. Output restricted to gap/cap-closed sessions
    (timeout flushes depend on micro-batch boundaries)."""
    import shutil
    import uuid

    from etl_mini_spark.streaming.stateful import capped_sessions
    from etl_mini_spark.streaming.stream import read_stream_parquet, run_to_completion

    for old in _TMP.glob("capped_sessions_*"):  # drop previous runs' scratch
        shutil.rmtree(old, ignore_errors=True)
    tmp = _TMP / f"capped_sessions_{uuid.uuid4().hex[:8]}"
    src, out, ckpt = str(tmp / "src"), str(tmp / "out"), str(tmp / "ckpt")
    batch = _t(spark, sf_dir, "events").select("user_id", "ts")
    batch.write.mode("overwrite").parquet(src)
    stream = read_stream_parquet(spark, src, spark.read.parquet(src).schema)
    run_to_completion(capped_sessions(stream), checkpoint_dir=ckpt, output_path=out)
    return spark.read.parquet(out).filter(F.col("closed_by").isin("gap", "cap"))


@q("stream_capped_sessions_checksum")
def stream_capped_sessions_checksum(spark, sf_dir):
    """ST-custom pin #2: value-sensitive checksum over the deterministic
    (gap/cap-closed) session set — per closed_by: session count, total
    events, and a sum over the session epoch bounds. A regression in
    session boundaries or event counts moves these values even when the
    ROW COUNT of the detail entry stays the same; the local differential
    (tests/test_streaming.py) pins the same numbers against the
    pure-python reference."""
    closed = QUERIES["stream_capped_sessions"](spark, sf_dir)
    return (
        closed.groupBy("closed_by")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("total_events"),
            # mod-1e9 keeps the running sum < n·2e9 — a raw microsecond
            # sum crosses 2^63 within ~2700 sessions and ANSI mode
            # turns that overflow into a query failure
            F.sum(
                (F.unix_micros("session_start") + F.unix_micros("session_end"))
                % F.lit(1_000_000_000)
            ).alias("bounds_checksum_us"),
        )
        .orderBy("closed_by")
    )


@q(
    "stream_dedup_watermark",
    """SELECT DISTINCT event_id, user_id, event_type FROM events""",
)
def stream_dedup_watermark(spark, sf_dir):
    """ST5: dropDuplicatesWithinWatermark under late duplicates — every
    10th event is re-delivered 5 minutes late (inside the 1 h
    watermark horizon), the stream must emit each event_id exactly
    once. The oracle is the batch-equivalent distinct over the original
    events: streaming dedup on planted duplicates recovers it exactly.
    Only copy-invariant columns are returned (which physical copy
    survives depends on file ordering, by design of first-wins dedup)."""
    import shutil
    import uuid

    from etl_mini_spark.streaming.stream import read_stream_parquet, run_to_completion
    from etl_mini_spark.streaming.windows import streaming_dedup

    for old in _TMP.glob("stream_dedup_*"):  # drop previous runs' scratch
        shutil.rmtree(old, ignore_errors=True)
    tmp = _TMP / f"stream_dedup_{uuid.uuid4().hex[:8]}"
    src, out, ckpt = str(tmp / "src"), str(tmp / "out"), str(tmp / "ckpt")
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    late_dupes = e.filter(F.col("event_id") % 10 == 0).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 5 MINUTES")
    )
    e.unionByName(late_dupes).write.mode("overwrite").parquet(src)
    stream = read_stream_parquet(spark, src, spark.read.parquet(src).schema)
    run_to_completion(
        streaming_dedup(stream, keys=["event_id"], ts_col="ts", late_threshold="1 hour"),
        checkpoint_dir=ckpt,
        output_path=out,
    )
    return spark.read.parquet(out).select("event_id", "user_id", "event_type")


# =========================================================================
# Round-3 additions: batch sessionization + Gopher repetition filters
# =========================================================================

@q(
    "sessionize_events",
    """WITH g AS (
         SELECT user_id, event_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       s AS (SELECT user_id, ts,
                    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      AS session_idx
             FROM g)
       SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
              strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
              CAST(count(*) AS BIGINT) AS n_events
       FROM s GROUP BY user_id, session_idx""",
)
def sessionize_events(spark, sf_dir):
    """Batch sessionization (30-min gap) — flag+running-sum+aggregate in
    one user_id shuffle (operators/timeseries.py:sessionize); the
    groupBy reuses the window's hash partitioning, so no second
    exchange. Batch twin of the streaming sessionizers (ST4/ST-custom)."""
    from etl_mini_spark.operators.timeseries import sessionize

    e = _t(spark, sf_dir, "events")
    out = sessionize(e, "user_id", "ts", gap_s=1800, tiebreak_col="event_id")
    return out.select(
        "user_id",
        "session_idx",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


@q(
    "text_repetition",
    """WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS words
                  FROM documents),
            s AS (SELECT doc_id, words,
                         len(words) AS n_words,
                         len(list_distinct(words)) AS n_distinct,
                         CASE WHEN len(words) >= 2
                              THEN list_transform(range(1, len(words)),
                                                  i -> words[i] || ' ' || words[i+1])
                              ELSE [] END AS bigrams
                  FROM w),
            c AS (SELECT doc_id, u.w, count(*) AS n
                  FROM (SELECT doc_id, unnest(words) AS w FROM w) u
                  GROUP BY doc_id, u.w),
            top AS (SELECT doc_id, n FROM (
                      SELECT doc_id, n,
                             row_number() OVER (PARTITION BY doc_id
                                                ORDER BY n DESC, w) AS rn
                      FROM c) WHERE rn = 1)
       SELECT s.doc_id,
              CAST(s.n_words AS BIGINT) AS n_words,
              CAST(s.n_distinct AS BIGINT) AS n_distinct_words,
              round(1 - s.n_distinct / CAST(s.n_words AS DOUBLE), 6) AS dup_word_frac,
              round(CASE WHEN len(s.bigrams) > 0
                         THEN 1 - len(list_distinct(s.bigrams)) / CAST(len(s.bigrams) AS DOUBLE)
                         ELSE 0 END, 6) AS dup_bigram_frac,
              round(top.n / CAST(s.n_words AS DOUBLE), 6) AS top_word_frac
       FROM s JOIN top USING (doc_id)""",
)
def text_repetition(spark, sf_dir):
    """Gopher-style repetition quality filters (Rae et al. 2021 §A1.1):
    duplicate-word / duplicate-bigram / top-word fractions per document
    — the standard pre-training corpus hygiene pass for boilerplate and
    degenerate repetition (operators/text.py:repetition_metrics)."""
    d = _t(spark, sf_dir, "documents")
    return TX.repetition_metrics(d, "doc_id", "text")


# =========================================================================
# Registry ordering — the driver's CORRECTNESS gate records the FIRST 50
# entries in registry order, so that window is curated explicitly:
#
# - Round-robin across rounds: queries that already earned a driver-green
#   row in CORRECTNESS_r01.json (text_*, dedup_exact_docs, similarity_topk,
#   multimodal_decode, the scalar-function suite, …) yield their window
#   slots to queries that have never been driver-verified (the TPC-H SQL
#   suite, cube/grouping-sets, stats/percentiles, sampling, roundtrips,
#   dedup_clusters) plus the queries whose r01 rows were vacuous and are
#   now non-empty (anti join, set_except, embedding near-dups, simhash).
# - EVERY query — window and tail — is still differentially verified
#   every round by tests/test_queries_oracle.py at sf0.001 (same
#   DuckDB-oracle check the driver runs at sf0.01).
# =========================================================================

_DRIVER_WINDOW = [
    # round-3 rotation: every slot below is either (a) never driver-
    # verified before r03 — the 11 round-2 tail additions — or (b) code
    # changed this round and needs re-verification (upsert_null_update
    # is the new explicit-NULL merge path; dedup_ngram_jaccard lost its
    # O(corpus) broadcast join-back; window_time_range_7d moved to
    # microsecond frames), or (c) kept from r02 because it has no
    # double-green history yet. Double-green (r01+r02) entries yielded
    # their slots and moved to the tail.
    #
    # never driver-verified (round-2 additions)
    "http_api_extract", "text_redact_pii", "doc_chunks", "corpus_top_bigrams",
    "join_full_outer", "window_rank_suite", "string_fns_suite",
    "timeseries_resample_fill", "funnel_conversion",
    "window_time_range_7d", "groupwise_zscore",
    # changed this round → re-verify
    "upsert_null_update", "dedup_ngram_jaccard",
    # joins (kept: green in r02 only)
    "join_anti_no_orders", "join_semi_active", "join_range_followups",
    "join_asof_last_order",
    # ANSI-SQL entry point (TPC-H-style)
    "sql_q3_shipping", "sql_q5_local_volume", "sql_q10_returned",
    "sql_exists_urgent", "sql_scalar_above_avg",
    # aggregation
    "agg_rollup", "agg_cube", "agg_grouping_sets",
    "agg_stats_suite", "agg_percentiles", "agg_minmax_by", "agg_histogram",
    "groupby_date_type",
    # windows / streaming windows
    "window_topk_per_group", "window_sliding_15m",
    # ordering / sets / reshape
    "order_by_hash", "set_except",
    "pivot_type_counts", "unpivot_part_metrics", "array_math_suite",
    # functions
    "time_tz_trimode", "udf_registry_iso_parts",
    # sampling
    "sample_split_counts", "sample_deterministic", "sample_stratified_docs",
    # roundtrips
    "csv_roundtrip", "ndjson_roundtrip",
    # LLM-pipeline ops
    "dedup_minhash_lsh", "dedup_simhash", "dedup_clusters",
    "embedding_near_dups", "embedding_near_dups_lsh", "multimodal_frames",
]

_TAIL = [
    # double-green r01+r02 — yielded their r03 window slots
    "scan_checksum", "project_select", "filter_time_range", "filter_term",
    "nested_json_extract", "drop_null_required", "join_inner_revenue",
    "join_left_counts", "join_star_dims", "agg_pricing_summary",
    "window_running_total", "dedup_keep_first", "upsert_keyed",
    # driver-green in r01 (rotated out of the window) or rows-only
    "tolerant_select", "agg_distinct", "window_lag_lead",
    "topk_limit", "set_union_halves", "set_intersect", "time_derive_parts",
    "iso_normalize", "sanitize_values", "placeholder_extract",
    "constant_columns", "window_tumbling_1h", "window_session_30m",
    "dedup_exact_docs", "similarity_topk",
    "similarity_ivf", "join_salted_skew", "text_quality",
    "text_token_counts", "text_lang_id", "text_fingerprint",
    "multimodal_decode", "multimodal_resize", "multimodal_features",
    "agg_approx_distinct",
    "stream_capped_sessions",
    # round-3 additions
    "stream_capped_sessions_checksum", "stream_dedup_watermark",
    "sessionize_events", "text_repetition",
]


def _reorder_registry() -> None:
    global QUERIES, ORACLE
    ordered = _DRIVER_WINDOW + _TAIL
    assert len(_DRIVER_WINDOW) == 50, f"window is {len(_DRIVER_WINDOW)}, not 50"
    dupes = {n for n in ordered if ordered.count(n) > 1}
    assert not dupes, f"duplicate registry names: {dupes}"
    missing = set(QUERIES) - set(ordered)
    unknown = set(ordered) - set(QUERIES)
    assert not missing and not unknown, (
        f"registry/order drift: missing from order={sorted(missing)} "
        f"unknown in order={sorted(unknown)}"
    )
    QUERIES = {k: QUERIES[k] for k in ordered}
    ORACLE = {k: ORACLE[k] for k in ordered if k in ORACLE}


_reorder_registry()
