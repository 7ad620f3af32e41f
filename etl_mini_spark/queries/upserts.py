from etl_mini_spark.queries._base import *  # noqa: F401,F403
from etl_mini_spark.queries._base import _t, _TMP  # noqa: F401

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
