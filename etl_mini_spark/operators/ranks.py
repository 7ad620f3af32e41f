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
NULL values rank FIRST (their own bucket before every non-null),
matching the window idiom's default asc-nulls-first order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def bucket_expr_from_cuts(value_col: str, cuts: list[float]) -> Column:
    """Monotone bucket expression over SORTED cut literals: the first
    cut with v < cut gives the bucket index (= count of cuts <= v). A
    chained CASE WHEN compiles through whole-stage codegen; an
    F.aggregate over a literal array runs its lambda INTERPRETED per
    element — ~n_parts evaluations per row, measured as the dominant
    cost of the bucketing passes at sf0.1. NULL maps to bucket -1 —
    strictly before every non-null bucket — so callers that rank
    bucket-by-bucket reproduce asc-nulls-first order."""
    v = F.col(value_col).cast("double")
    if cuts:
        nb = None
        for i, c in enumerate(cuts):
            cond = v < F.lit(float(c))
            nb = F.when(cond, i) if nb is None else nb.when(cond, i)
        nb = nb.otherwise(len(cuts))
    else:
        nb = F.lit(0)
    return F.when(F.col(value_col).isNull(), F.lit(-1)).otherwise(nb).cast("int")


def quantile_buckets(
    df: DataFrame, value_col: str, n_parts: int
) -> tuple[Column, list[float]]:
    """Monotone bucket expression for ``value_col`` with DATA-DERIVED
    boundaries: cut points are approx quantiles of the (non-null)
    column, so a heavy-tailed domain (revenue, zipf counts) still
    spreads across ~n_parts buckets instead of parking in bucket 0 the
    way linear min/max interpolation would. Collected once driver-side
    and embedded as literals, the expression is a constant function of
    each row — deterministic across plan re-evaluations. Correctness
    never depends on WHERE the cuts fall (any monotone bucketing is
    exact); the cuts only balance the downstream per-bucket windows.

    NULL maps to bucket -1 — strictly before every non-null bucket —
    so callers that rank bucket-by-bucket reproduce the asc-nulls-first
    order of the ``Window.orderBy`` they replace.

    Returns (bucket_column, cut_points)."""
    dt = df.schema[value_col].dataType
    if not isinstance(dt, NumericType):
        # cast("double") of a date/string/timestamp yields NULL, which
        # would silently park every row in bucket -1 and collapse the
        # downstream per-bucket windows into one partition — fail fast
        # instead of quietly losing the scaling this primitive exists for.
        raise TypeError(
            f"quantile_buckets requires a numeric column; {value_col!r} is {dt}"
        )
    nn = df.select(F.col(value_col).cast("double").alias("__v")).where(
        F.col("__v").isNotNull()
    )
    probs = [i / n_parts for i in range(1, n_parts)]
    cuts = sorted(set(nn.approxQuantile("__v", probs, 0.001))) if probs else []
    return bucket_expr_from_cuts(value_col, cuts), cuts


def value_midranks(df: DataFrame, value_col: str, n_parts: int = 32) -> DataFrame:
    """Histogram of ``value_col`` (numeric) with each distinct value's
    twice-the-midrank integer: (value, t, r2) where t is the value's
    row count and r2 = 2*cum_before + t + 1.

    Even the histogram's cumulative sum avoids a single-partition
    window: distinct values bucket by quantile-derived cut points (a
    constant function of the data — see ``quantile_buckets``),
    per-bucket totals become driver-side offsets (a #buckets-row
    gather), and the running count completes within each bucket's
    partitioned window. Exact for any bucket placement because the
    bucketing is monotone in the value; NULL values occupy bucket -1
    and therefore rank first, exactly as the
    ``2*rank() + count() over (partition by v) - 1`` window idiom
    ranks them (asc nulls first)."""
    from etl_mini_spark.session import pin

    # The histogram is referenced by THREE actions/subtrees (quantile
    # cuts, per-bucket totals, the final midrank pass) — without the
    # pin each one re-ran the full fact aggregation, so the fact table
    # was scanned three times per call (guide §3.3). Materializing the
    # value histogram once is bounded by the distinct-value domain —
    # the same premise the whole midrank shape rests on.
    hv = pin(df.groupBy(value_col).agg(F.count("*").cast("bigint").alias("t")))
    bucket, _ = quantile_buckets(hv, value_col, n_parts)
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
