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
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_time <= left_time (or < if not allow_exact) in the same key
    group; nulls where no match (left-join semantics).

    ``tiebreak``: right column ordering ties on right_time (ascending;
    the LAST one wins) — supply a unique right id for determinism.
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
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__t", "__tag", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
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
