"""Time-series resampling — regularize an event stream onto a fixed
time grid, the step before any windowed model/feature pipeline.

No reference counterpart (the reference never aggregates numerically);
this is north-star engine surface. Shape at scale: the grid is
(days × keys) — tiny relative to the events — so the plan is one
hash-agg shuffle over the events plus a broadcast-able left join of
the grid against the aggregates; the LOCF fill is one window pass
over grid-sized data. Nothing here scales with raw event volume
except the initial aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_daily_fill(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Daily resample per key over the full [min, max] date span:
    event counts ZERO-filled on empty days, mean value LOCF-filled
    (last observation carried forward). Returns
    (day 'yyyy-MM-dd', <key>, n, avg_value_locf).

    Leading days before a key's first observation stay NULL in the
    LOCF column — carrying values backward would invent data.
    """
    day = F.to_date(ts_col)
    bounds = df.agg(F.min(day).alias("d0"), F.max(day).alias("d1"))
    grid = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    keys = df.select(F.col(key_col)).distinct()
    cnt = (
        df.groupBy(day.alias("day"), key_col)
        .agg(F.count("*").alias("n"), F.round(F.avg(value_col), 6).alias("avg_v"))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.crossJoin(keys)  # tiny × tiny: days × distinct keys
        .join(cnt, ["day", key_col], "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            key_col,
            F.coalesce("n", F.lit(0)).alias("n"),
            F.round(F.last("avg_v", ignorenulls=True).over(w), 6).alias("avg_value_locf"),
        )
    )
