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
