"""Event-time window transformations — written against plain DataFrames
so the SAME function body serves batch tables and ``readStream``
inputs (Structured Streaming's core contract). The reference has no
true streaming (SURVEY.md §2.9) — its scroll/chunk pagination maps to
micro-batches; these are the new-build semantics the north star asks
for.

Watermarks bound state: without one, a streaming windowed aggregation
keeps every window open forever. ``late_threshold`` picks how much
event-time disorder is tolerated before a row is dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, late_threshold: str | None) -> DataFrame:
    return df.withWatermark(ts_col, late_threshold) if late_threshold and df.isStreaming else df


def tumbling_counts(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    width: str = "1 hour",
    late_threshold: str | None = "1 hour",
) -> DataFrame:
    df = _maybe_watermark(df, ts_col, late_threshold)
    return (
        df.groupBy(F.window(ts_col, width).alias("w"), *keys)
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), *keys, "n")
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    width: str = "1 hour",
    slide: str = "15 minutes",
    late_threshold: str | None = "1 hour",
) -> DataFrame:
    df = _maybe_watermark(df, ts_col, late_threshold)
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("w"), *keys)
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), *keys, "n")
    )


def sessionized(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    gap: str = "30 minutes",
    late_threshold: str | None = "1 hour",
) -> DataFrame:
    """Session windows (gap-merged). State per open session, closed by
    the watermark in streaming mode."""
    df = _maybe_watermark(df, ts_col, late_threshold)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(F.count("*").alias("n"), F.min(ts_col).alias("first_event"))
        .select(F.col("w.start").alias("session_start"), *keys, "n", "first_event")
    )


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    late_threshold: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon. Batch mode
    falls back to plain dropDuplicates (whole-input horizon)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, late_threshold).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
