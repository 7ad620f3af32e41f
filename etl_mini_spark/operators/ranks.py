"""Distributed rank statistics primitives.

Pooled-rank tests (Kruskal-Wallis, Mann-Whitney, rank-biserial ROC)
need every row's midrank over the WHOLE table. Ranking raw rows with
an unpartitioned ``Window.orderBy`` funnels the fact table into one
task; but rank statistics never need per-row identity — only the rank
of each VALUE and how many rows carry it. So the scalable shape is:

  1. one keyed agg to the value histogram (value -> count),
  2. a cumulative window over the DISTINCT-value table (bounded by the
     value domain, not the row count; for an unbounded domain, feed
     the histogram through ``layout.exact_global_rank`` instead),
  3. a broadcast join back (or, for sum-of-ranks statistics, no join
     back at all — fold the per-(group, value) counts directly).

The twice-the-midrank integer for every row carrying value v is
  r2(v) = 2*rank_min(v) + t(v) - 1 = 2*cum_before(v) + t(v) + 1
— exactly the ``2*rank() + count() over (partition by v) - 1`` idiom
the oracles use, so results are bit-identical to the windowed form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def value_midranks(df: DataFrame, value_col: str, n_parts: int = 32) -> DataFrame:
    """Histogram of ``value_col`` (numeric) with each distinct value's
    twice-the-midrank integer: (value, t, r2) where t is the value's
    row count and r2 = 2*cum_before + t + 1.

    Even the histogram's cumulative sum avoids a single-partition
    window: distinct values bucket by a fixed range function of the
    value (a pure function of the data — deterministic across plan
    re-evaluations), per-bucket totals become driver-side offsets (a
    #buckets-row gather), and the running count completes within each
    bucket's partitioned window. Exact for any bucket skew because the
    bucketing is monotone in the value."""
    hv = df.groupBy(value_col).agg(F.count("*").cast("bigint").alias("t"))
    lo_hi = hv.agg(
        F.min(value_col).cast("double").alias("lo"),
        F.max(value_col).cast("double").alias("hi"),
    ).collect()[0]
    lo, hi = lo_hi["lo"], lo_hi["hi"]
    if lo is None or hi == lo:
        bucket = F.lit(0)
    else:
        bucket = F.least(
            F.floor(
                (F.col(value_col).cast("double") - F.lit(lo))
                / F.lit(hi - lo) * F.lit(n_parts)
            ),
            F.lit(n_parts - 1),
        ).cast("int")
    hb = hv.withColumn("__b", bucket)
    btot = {
        r["__b"]: r["s"]
        for r in hb.groupBy("__b").agg(F.sum("t").alias("s")).collect()
    }
    offs, acc = [], 0
    for bk in sorted(btot):
        offs.append((bk, acc))
        acc += btot[bk]
    omap = df.sparkSession.createDataFrame(offs or [(0, 0)], "__b int, __off long")
    w = (
        Window.partitionBy("__b")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        hb.join(F.broadcast(omap), "__b")
        .select(
            value_col,
            "t",
            (
                2 * (F.coalesce(F.sum("t").over(w), F.lit(0)) + F.col("__off"))
                + F.col("t") + 1
            )
            .cast("bigint")
            .alias("r2"),
        )
    )
