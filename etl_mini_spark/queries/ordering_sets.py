from etl_mini_spark.queries._base import *  # noqa: F401,F403
from etl_mini_spark.queries._base import _t, _TMP  # noqa: F401

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
