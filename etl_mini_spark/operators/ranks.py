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


def value_midranks(df: DataFrame, value_col: str) -> DataFrame:
    """Histogram of ``value_col`` with each distinct value's
    twice-the-midrank integer: (value, t, r2) where t is the value's
    row count and r2 = 2*cum_before + t + 1. The only window runs over
    the distinct-value table."""
    hv = df.groupBy(value_col).agg(F.count("*").cast("bigint").alias("t"))
    w = Window.orderBy(value_col).rowsBetween(Window.unboundedPreceding, -1)
    return hv.select(
        value_col,
        "t",
        (2 * F.coalesce(F.sum("t").over(w), F.lit(0)) + F.col("t") + 1)
        .cast("bigint")
        .alias("r2"),
    )
