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


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_s: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Batch sessionization — the gap rule as ONE window pass: flag rows
    whose gap to the previous event exceeds ``gap_s``, running-sum the
    flags into a per-key session index, aggregate per session. Returns
    (<key>, session_idx, session_start, session_end, n_events).

    Scale shape: a single shuffle on the key for the window; the
    follow-up groupBy on (key, session_idx) reuses the same hash
    partitioning (key ⊆ grouping keys), so Catalyst plans NO second
    exchange. This is the batch twin of streaming/stateful.py's
    capped_sessions gap rule (cap semantics need the stateful path —
    a running-sum can't reset on its own output).

    ``tiebreak_col`` makes same-timestamp orderings deterministic.
    """
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    gap_us = F.unix_micros(ts_col) - F.lag(F.unix_micros(ts_col)).over(w)
    new_session = (
        F.when(gap_us.isNull() | (gap_us > gap_s * 1_000_000), 1).otherwise(0)
    )
    return (
        df.withColumn("__new", new_session)
        .withColumn("session_idx", F.sum("__new").over(w).cast("long"))
        .groupBy(key_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
