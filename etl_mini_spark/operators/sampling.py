"""Deterministic sampling and dataset splitting.

The reference has no sampling surface (SURVEY.md §2.11); a
training-data pipeline cannot live without one, and the industry idiom
at scale is HASH-based selection, not random(): membership of a row in
a sample/split is a pure function of its key, so

- the same row lands in the same split on every engine, every run,
  every partitioning (Spark's ``df.sample`` is seed+partition
  dependent — useless for reproducible train/val/test splits);
- sampling is a narrow map + filter: no shuffle, fully pushdown-
  friendly, embarrassingly parallel at 100 TB;
- splits are disjoint and exhaustive by construction.

Buckets come from the first 15 hex chars of md5(key || ':' || salt)
(60 bits — bucket skew from the modulo is < 2^-40 for ≤10^6 buckets),
portable to any engine with md5 (DuckDB oracle:
``CAST(concat('0x', substr(md5(..), 1, 15)) AS BIGINT)``).

``stratified_take`` gives exactly-k-per-stratum sampling (class
balancing): rows are ranked inside each stratum by their key hash —
i.e. a uniform random-but-deterministic order — and the top k kept.
One shuffle on the strata key; k rows of state per stratum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 100_000


def hash_bucket(key: Column, salt: str = "", buckets: int = N_BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, buckets) from a key column."""
    h = F.conv(F.substring(F.md5(F.concat_ws(":", key.cast("string"), F.lit(salt))), 1, 15), 16, 10)
    return (h.cast("long") % F.lit(buckets)).alias("bucket")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "", buckets: int = N_BUCKETS
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash. Narrow op (no
    shuffle). Different salts give INDEPENDENT resamples (which overlap
    by chance); disjoint samples come from non-overlapping bucket
    ranges under ONE salt — that's what ``split_assign`` does."""
    return df.filter(hash_bucket(F.col(key_col), salt, buckets) < int(round(fraction * buckets)))


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split",
    buckets: int = N_BUCKETS,
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/'test'/...) by cumulative
    hash-bucket ranges. Disjoint + exhaustive; weights must sum to 1."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = hash_bucket(F.col(key_col), salt, buckets)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = b < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def stratified_take(
    df: DataFrame, strata_cols: list[str], k: int, key_col: str, salt: str = ""
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, deterministically
    pseudo-random: rank by md5(key||salt) inside each stratum (key as
    tie-breaker), keep rank ≤ k. The per-stratum top-k is a window on
    the strata shuffle — no global sort."""
    from pyspark.sql import Window

    h = F.md5(F.concat_ws(":", F.col(key_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(*strata_cols).orderBy(h, F.col(key_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def budget_cap(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
    budget: int,
    key_col: str,
    salt: str = "quota",
    cum_col: str = "cum_weight",
    sharded: bool = True,
) -> DataFrame:
    """Keep rows per group, in deterministic pseudo-random order, until
    the group's cumulative ``weight_col`` exceeds ``budget`` — the
    per-domain token-budget cap of corpus assembly (e.g. "at most 10B
    tokens per language, chosen reproducibly").

    Semantics: order rows within each group by (md5(key:salt), key)
    ascending; keep a row iff the running weight sum THROUGH that row is
    ≤ budget. Adds ``cum_col`` with the running sum.

    Scale shape — the reason this is not one window: a plain
    ``sum() OVER (PARTITION BY group ORDER BY hash)`` serializes each
    group into a single task, so one 30-TB language becomes one
    straggler. The prefix sum here is the classic two-pass scan:

    1. rows shard by the FIRST TWO hex chars of the same md5 (256
       shards; 32-char hex strings order lexicographically, so the
       shard prefix is consistent with the full-hash order);
    2. pass 1 aggregates per-(group, shard) subtotals — ≤256 tiny rows
       per group — and a window over those subtotal rows yields each
       shard's starting offset;
    3. pass 2 computes the within-shard running sum (window partitioned
       by (group, shard) — 256-way parallel per group) and adds the
       joined-in shard offset.

    Every stage hash-partitions on (group, shard); the only per-group
    serial work is the 256-row offset window. Weights are summed as
    integers (exact), so the budget boundary is engine-exact.

    ``sharded=False`` takes the plain one-window path instead — the two
    are row-identical (unit + hypothesis tested). Measured trade-off on
    a skewed fixture (400k rows, 80 % in one group, local[32]): naive
    1.6 s vs sharded 6.3 s — at local scale the hot group's single-task
    sort is cheap and the sharded path's extra join dominates; the
    sharded path wins only when one group's rows exceed what one task
    can sort/hold (the 30-TB-language case sharding exists for). Same
    structure as the as-of join's opt-in ``bucket_seconds``.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat_ws(":", F.col(key_col).cast("string"), F.lit(salt)))
    if not sharded:
        w = (
            Window.partitionBy(*group_cols)
            .orderBy(h, key_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return (
            df.withColumn(cum_col, F.sum(weight_col).over(w))
            .filter(F.col(cum_col) <= F.lit(budget))
        )
    d = df.withColumn("__h", h).withColumn("__shard", F.substring(F.col("__h"), 1, 2))
    sub = d.groupBy(*group_cols, "__shard").agg(F.sum(weight_col).alias("__w"))
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = sub.withColumn("__off", F.coalesce(F.sum("__w").over(w_off), F.lit(0))).drop("__w")
    w_in = (
        Window.partitionBy(*group_cols, "__shard")
        .orderBy("__h", key_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Null-safe offset join: a plain name-list join would drop rows whose
    # group key is NULL, while the sharded=False window path keeps the
    # NULL-key group — breaking the documented "row-identical" contract.
    # groupBy treats NULL as a regular group, so every (group, shard) in
    # `d` exists in `off`; eqNullSafe keeps this an equi hash join (same
    # idiom as asof_join's boundary-carry join, operators/joins.py:218).
    join_cols = [*group_cols, "__shard"]
    off_r = off
    for c in join_cols:
        off_r = off_r.withColumnRenamed(c, "__off_" + c)
    cond = None
    for c in join_cols:
        clause = d[c].eqNullSafe(off_r["__off_" + c])
        cond = clause if cond is None else (cond & clause)
    return (
        d.join(off_r, cond)
        .drop(*["__off_" + c for c in join_cols])
        .withColumn(cum_col, F.sum(weight_col).over(w_in) + F.col("__off"))
        .filter(F.col(cum_col) <= F.lit(budget))
        .drop("__h", "__shard", "__off")
    )


def mixture_sample(
    df: DataFrame, key_col: str, threshold_buckets: Column, salt: str = "", buckets: int = N_BUCKETS
) -> DataFrame:
    """Per-row mixture sampling — the domain-reweighting primitive for
    training-data mixes (per-source/per-language target rates): keep a
    row iff its key hash-bucket falls below a PER-ROW integer threshold
    (rate × buckets). The threshold is a Column so rates can come from
    any expression or joined-in weights table; integer thresholds keep
    the keep/drop boundary exactly reproducible across engines (no
    float×buckets rounding at the edge). Same scale shape as
    ``deterministic_sample``: a narrow map + filter, no shuffle."""
    return df.filter(hash_bucket(F.col(key_col), salt, buckets) < threshold_buckets)
