"""Join operators Spark lacks as single primitives.

- ``asof_join`` — nearest-earlier (backward) as-of join via the
  union-sort trick: tag left/right rows, sort within key by event time,
  carry the last-seen right row forward with ``last(..., ignorenulls)``.
  ONE shuffle on the key — no range cross-product, no per-key collect —
  so it scales to arbitrarily many rows per key (vs. the naive
  join+row_number plan which materializes |L|×|R| per key first).
- ``range_join`` — interval theta-join expressed declaratively so AQE /
  Catalyst can pick the strategy; callers provide the interval bounds.

The reference has no joins at all (SURVEY.md §2.3) — this is the
new-build surface mandated by the north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    allow_exact: bool = True,
    suffix: str = "_right",
    bucket_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_time <= left_time (or < if not allow_exact) in the same key
    group; nulls where no match (left-join semantics).

    ``tiebreak``: right column ordering ties on right_time (ascending;
    the LAST one wins) — supply a unique right id for determinism.

    ``bucket_seconds``: optional skew hardening. The plain union-sort
    partitions by key alone, so ONE celebrity key serializes its whole
    history into a single task — inherent to as-of semantics, fatal at
    100 TB. With ``bucket_seconds`` set, rows are additionally
    partitioned by a coarse time bucket of width ``bucket_seconds``
    (timestamp time columns only): each (key, bucket) sorts
    independently in parallel, and a per-(key, bucket) boundary table —
    the last right row of every bucket, cumulatively carried across
    earlier buckets — supplies the match for left rows that precede
    their bucket's first right row. Result is row-identical to the
    unbucketed path; a hot key now spans history/bucket_seconds tasks.
    """
    import pyspark.sql.types as T

    right_cols = right_cols or [c for c in right.columns if c not in on]
    key_cols = list(on)

    r_payload = F.struct(*[F.col(c) for c in right_cols]).alias("__r")
    l_payload = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    l_type = T.StructType([left.schema[c] for c in left.columns])
    r_tb = (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb")

    # Both sides carry their payload through ONE union-sort shuffle —
    # no id-tagging, no join-back (which would shuffle the left twice).
    r = right.select(
        *key_cols, F.col(right_time).alias("__t"), F.lit(0).alias("__tag"),
        r_tb, r_payload, F.lit(None).cast(l_type).alias("__l"),
    )
    l = left.select(
        *key_cols, F.col(left_time).alias("__t"), F.lit(1).alias("__tag"),
        F.lit(0).alias("__tb"), F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        l_payload,
    )

    # On equal times: right rows sort before left when allow_exact (tag 0<1),
    # after left otherwise (flip the tag).
    if not allow_exact:
        l = l.withColumn("__tag", F.lit(0))
        r = r.withColumn("__tag", F.lit(1))

    unioned = r.unionByName(l)

    if bucket_seconds is None:
        w = (
            Window.partitionBy(*key_cols)
            .orderBy("__t", "__tag", "__tb")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    else:
        unioned = unioned.withColumn(
            "__bucket", F.floor(F.unix_micros("__t") / F.lit(bucket_seconds * 1_000_000))
        )
        # stage 1: independent within-bucket running last — the hot-key
        # sort now parallelizes across buckets
        wb = (
            Window.partitionBy(*key_cols, "__bucket")
            .orderBy("__t", "__tag", "__tb")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        staged = unioned.withColumn("__in_bucket", F.last("__r", ignorenulls=True).over(wb))
        # stage 2: boundary carry-in — one row per (key, bucket): the
        # bucket's final right row (max by (t, tiebreak); struct max is
        # lexicographic and skips nulls), then the latest non-null value
        # from STRICTLY EARLIER buckets per key. O(keys × buckets) rows.
        per_bucket_last = unioned.groupBy(*key_cols, "__bucket").agg(
            F.max(
                F.when(
                    F.col("__r").isNotNull(),
                    F.struct(F.col("__t"), F.col("__tb"), F.col("__r")),
                )
            ).alias("__last_struct")
        )
        wc = (
            Window.partitionBy(*key_cols)
            .orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = per_bucket_last.select(
            *key_cols, "__bucket",
            F.last(F.col("__last_struct").getField("__r"), ignorenulls=True)
            .over(wc)
            .alias("__carry"),
        )
        # Null-safe carry join: a plain name-list join would drop rows with
        # a NULL key column or NULL time (__bucket = floor(unix_micros(NULL))
        # = NULL), breaking the "row-identical to the unbucketed path"
        # contract — the unbucketed window keeps NULL-key groups and gives
        # NULL-time left rows their (possibly null) match. groupBy treats
        # NULL as a regular group, so every (key, bucket) in `staged` exists
        # in `carry`; eqNullSafe keeps this an equi hash join.
        join_cols = key_cols + ["__bucket"]
        carry_r = carry
        for c in join_cols:
            carry_r = carry_r.withColumnRenamed(c, "__carry_" + c)
        cond = None
        for c in join_cols:
            clause = staged[c].eqNullSafe(carry_r["__carry_" + c])
            cond = clause if cond is None else (cond & clause)
        matched = (
            staged.join(carry_r, cond, "left")
            .drop(*["__carry_" + c for c in join_cols])
            .withColumn("__match", F.coalesce("__in_bucket", "__carry"))
        )
    out = matched.filter(F.col("__l").isNotNull())

    left_names = set(left.columns)
    proj = [F.col("__l").getField(c).alias(c) for c in left.columns]
    for c in right_cols:
        name = c + suffix if c in left_names else c
        proj.append(F.col("__match").getField(c).alias(name))
    return out.select(*proj)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: the left side gets a deterministic salt
    (xxhash64 of the whole row, mod ``salts``), the right side is
    replicated ``salts`` times, and the join key becomes
    (key..., salt) — a single hot key now spreads over ``salts``
    reducers instead of melting one. Result is row-identical to the
    plain join.

    Use when one side has pathological key skew AQE's skew-join split
    can't fix (e.g. a null-heavy or celebrity key). Replication
    multiplies the right side — keep it the smaller input."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salts)).cast("int")
    l = left.withColumn("__salt", salt)
    r = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    out = l.join(r, on + ["__salt"], how)
    return out.drop("__salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: list[str],
    lower: Column,
    upper: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-key + interval condition join. Expressed as a plain join so
    Catalyst keeps it a hash/sort-merge join on the equi keys with the
    range as a post-join predicate — never a cross join when equi keys
    exist. For pure range joins (no equi key), pre-bucket the range
    column into coarse bins and join on the bin to bound the blow-up."""
    cond = lower & upper
    for k in equi_keys:
        cond = (left[k] == right[k]) & cond
    return left.join(right, cond, how)
