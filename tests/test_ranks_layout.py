"""Equivalence properties for the distributed rank primitives: on any
input, exact_global_rank must equal the single-partition
Window.orderBy row_number, and value_midranks must equal the
2*rank + count - 1 window idiom — the primitives exist to REPLACE
those windows, so equality on adversarial shapes (ties, negatives,
skewed buckets, tiny domains) is the whole contract."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _cases(spark):
    dense = spark.range(0, 500).select(
        (F.col("id") % 7).cast("long").alias("v"), F.col("id").alias("k")
    )
    skewed = spark.range(0, 500).select(
        F.when(F.col("id") < 450, 1).otherwise(F.col("id")).cast("long").alias("v"),
        F.col("id").alias("k"),
    )
    negative = spark.range(0, 300).select(
        (F.col("id") * 13 % 101 - 50).cast("long").alias("v"), F.col("id").alias("k")
    )
    single = spark.range(0, 5).select(F.lit(42).cast("long").alias("v"),
                                      F.col("id").alias("k"))
    return {"dense": dense, "skewed": skewed, "negative": negative, "single": single}


def test_exact_global_rank_matches_window_row_number(spark):
    from etl_mini_spark.operators.layout import exact_global_rank

    for name, df in _cases(spark).items():
        for n_parts in (1, 4, 32):
            got = {
                (r["v"], r["k"]): r["rn"]
                for r in exact_global_rank(df, ["v", "k"], n_parts=n_parts).collect()
            }
            want = {
                (r["v"], r["k"]): r["rn"]
                for r in df.withColumn(
                    "rn", F.row_number().over(Window.orderBy("v", "k"))
                ).collect()
            }
            assert got == want, (name, n_parts)


def test_value_midranks_matches_window_idiom(spark):
    from etl_mini_spark.operators.ranks import value_midranks

    for name, df in _cases(spark).items():
        got = {
            r["v"]: (r["t"], r["r2"]) for r in value_midranks(df, "v").collect()
        }
        idiom = df.select(
            "v",
            (
                2 * F.rank().over(Window.orderBy("v"))
                + F.count("*").over(Window.partitionBy("v"))
                - 1
            ).alias("r2"),
        )
        want = {
            r["v"]: (r["t"], r["r2"])
            for r in idiom.groupBy("v", "r2").agg(F.count("*").alias("t"))
            .select("v", "t", "r2").collect()
        }
        assert got == want, name


def test_value_midranks_sum_identity(spark):
    """Sum of all rows' doubled midranks must equal n*(n+1) — the
    doubled 1..n rank-sum invariant, which catches any off-by-one in
    the cumulative offsets."""
    from etl_mini_spark.operators.ranks import value_midranks

    for name, df in _cases(spark).items():
        n = df.count()
        hv = value_midranks(df, "v")
        total = hv.agg(F.sum(F.col("t") * F.col("r2"))).collect()[0][0]
        assert total == n * (n + 1), name


def test_rank_primitives_null_values_rank_first(spark):
    """Round-12 advice fix: NULL values must rank FIRST (asc nulls
    first), exactly as the Window idioms the primitives replace rank
    them — previously value_midranks parked NULLs in the LAST bucket
    and exact_global_rank crashed on a None bucket key."""
    from etl_mini_spark.operators.layout import exact_global_rank
    from etl_mini_spark.operators.ranks import value_midranks

    mixed = spark.createDataFrame(
        [(1.0, 1), (None, 2), (2.0, 3), (None, 4), (2.0, 5)], "v double, k int"
    )
    got = {r["v"]: (r["t"], r["r2"]) for r in value_midranks(mixed, "v").collect()}
    idiom = mixed.select(
        "v",
        (
            2 * F.rank().over(Window.orderBy("v"))
            + F.count("*").over(Window.partitionBy("v"))
            - 1
        ).alias("r2"),
    )
    want = {
        r["v"]: (r["t"], r["r2"])
        for r in idiom.groupBy("v", "r2").agg(F.count("*").alias("t")).collect()
    }
    assert got == want

    got_rn = {
        r["k"]: r["rn"] for r in exact_global_rank(mixed, ["v", "k"]).collect()
    }
    want_rn = {
        r["k"]: r["rn"]
        for r in mixed.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "k"))
        ).collect()
    }
    assert got_rn == want_rn

    allnull = spark.createDataFrame([(None, 1), (None, 2)], "v double, k int")
    assert {r["k"]: r["rn"] for r in
            exact_global_rank(allnull, ["v", "k"]).collect()} == {1: 1, 2: 2}
    assert [(r["t"], r["r2"]) for r in value_midranks(allnull, "v").collect()] \
        == [(2, 3)]


def test_quantile_buckets_balance_heavy_tail(spark):
    """Round-11 verdict item 3: quantile-derived cut points must keep
    a heavy-tailed (exponentially spread) value domain balanced —
    linear min/max interpolation parks ~8/9 of distinct values in
    bucket 0 on this shape; the quantile cuts must hold every bucket
    to <= 2/k of the distinct values."""
    from etl_mini_spark.operators.ranks import quantile_buckets

    n_parts = 32
    ht = spark.range(0, 5000).select(
        (F.pow(F.lit(10.0), F.col("id") % 9) + F.col("id")).alias("v")
    )
    hv = ht.groupBy("v").agg(F.count("*").alias("t"))
    bucket, cuts = quantile_buckets(hv, "v", n_parts)
    counts = [
        r["count"] for r in hv.withColumn("__b", bucket).groupBy("__b").count().collect()
    ]
    assert len(counts) >= n_parts // 2
    assert max(counts) <= 2 * sum(counts) / n_parts
