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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_time <= left_time (or < if not allow_exact) in the same key
    group; nulls where no match (left-join semantics).
    ``direction="forward"`` flips the search: the EARLIEST right row
    with right_time >= left_time (or > if not allow_exact) — same
    single-shuffle union-sort plan (the running carry just runs over
    the following frame instead of the preceding one).
    ``direction="nearest"`` picks whichever side is closer in time
    (ties go backward, like pandas): still ONE sort — the backward and
    forward carries are two frame passes over the same window
    partitioning, and a µs gap comparison picks the winner. Completes
    the pandas ``merge_asof`` direction surface.

    ``tiebreak``: right column ordering ties on right_time (ascending;
    backward takes the LAST one, forward the FIRST) — supply a unique
    right id for determinism.

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

    ``tolerance_seconds``: optional max staleness (pandas
    ``merge_asof(tolerance=...)``): a match farther than this from the
    left time is nulled out — enrichment beyond the staleness bound is
    usually WORSE than no enrichment (a quote from last week is not a
    price). Applied as a post-filter on the carried match's own
    timestamp, so it composes with both the plain and bucketed paths
    unchanged. Timestamp time columns only.
    """
    import pyspark.sql.types as T

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if direction == "nearest" and not allow_exact:
        raise NotImplementedError("direction='nearest' requires allow_exact=True")
    nearest = direction == "nearest"
    back = direction != "forward"
    right_cols = right_cols or [c for c in right.columns if c not in on]
    key_cols = list(on)

    # NULL-time rows are inert, matching SQL comparison semantics
    # (t <= NULL / NULL <= t are never true): a right row with NULL
    # time carries a NULL payload (can never be picked up), and a left
    # row with NULL time gets a forced NULL match at projection. NULL
    # KEYS, by contrast, group together null-safely (window partitionBy
    # semantics, like groupBy) — documented divergence from an equi-join
    # oracle; drop NULL-key rows first if SQL equality is wanted.
    # payload carries the matched right TIME alongside the columns so a
    # tolerance bound can inspect it after the carry
    r_payload = F.when(
        F.col(right_time).isNotNull(),
        F.struct(
            F.col(right_time).alias("__mt"),
            F.struct(*[F.col(c) for c in right_cols]).alias("__p"),
        ),
    ).alias("__r")
    l_payload = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    l_type = T.StructType([left.schema[c] for c in left.columns])
    r_tb = (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb")

    # Both sides carry their payload through ONE union-sort shuffle —
    # no id-tagging, no join-back (which would shuffle the left twice).
    r = right.select(
        *key_cols, F.col(right_time).alias("__t"), F.lit(0).alias("__tag"),
        r_tb, r_payload, F.lit(None).cast(l_type).alias("__l"),
    )
    # Left rows never share a (__t, __tag) slot with right rows (tags
    # always differ), so their tiebreak is inert — but it must be TYPED
    # like the right's (a lit(0) int breaks the union when the tiebreak
    # column is a timestamp/string).
    l = left.select(
        *key_cols, F.col(left_time).alias("__t"), F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        l_payload,
    )

    # Tag ordering places equal-time right rows inside or outside the
    # left row's frame. Backward frame is (preceding, current]: rights
    # sort BEFORE left to be eligible at equal times (allow_exact) and
    # after otherwise. Forward frame is [current, following): exactly
    # the mirror.
    right_sorts_first = (back and allow_exact) or (not back and not allow_exact)
    # nearest ⇒ back=True, allow_exact=True ⇒ rights-first: an
    # equal-time right lands in the BACKWARD frame with gap 0 and wins
    # the distance comparison, so the forward frame missing it is moot.
    if not right_sorts_first:
        l = l.withColumn("__tag", F.lit(0))
        r = r.withColumn("__tag", F.lit(1))

    unioned = r.unionByName(l)

    if bucket_seconds is None:
        w = Window.partitionBy(*key_cols).orderBy("__t", "__tag", "__tb")
        if nearest:
            # ONE sort, two frame passes: the closer candidate (by µs
            # gap to the left time) wins; ties go backward, matching
            # pandas merge_asof(direction="nearest").
            wb = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            bk = F.last("__r", ignorenulls=True).over(wb)
            fw = F.first("__r", ignorenulls=True).over(wf)
            matched = unioned.withColumn("__bk", bk).withColumn("__fw", fw)
            bgap = F.unix_micros("__t") - F.unix_micros(F.col("__bk").getField("__mt"))
            fgap = F.unix_micros(F.col("__fw").getField("__mt")) - F.unix_micros("__t")
            matched = matched.withColumn(
                "__match",
                F.when(F.col("__bk").isNull(), F.col("__fw"))
                .when(F.col("__fw").isNull(), F.col("__bk"))
                .when(fgap < bgap, F.col("__fw"))
                .otherwise(F.col("__bk")),
            ).drop("__bk", "__fw")
        elif back:
            w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            matched = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        else:
            w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            matched = unioned.withColumn("__match", F.first("__r", ignorenulls=True).over(w))
    else:
        unioned = unioned.withColumn(
            "__bucket", F.floor(F.unix_micros("__t") / F.lit(bucket_seconds * 1_000_000))
        )

        def bucketed_match(df: DataFrame, back_dir: bool, out_col: str) -> DataFrame:
            """One direction's bucketed carry; adds ``out_col``.

            stage 1: independent within-bucket running carry (last-so-far
            backward, first-upcoming forward) — the hot-key sort now
            parallelizes across buckets.
            stage 2: boundary carry — one row per (key, bucket): the
            bucket's boundary right row (lexicographic struct max/min by
            (t, tiebreak), nulls skipped), then the nearest non-null
            value from STRICTLY earlier (backward) / later (forward)
            buckets per key. O(keys × buckets) rows.
            """
            pre = "__c" + out_col  # direction-unique temp-column prefix
            wb = Window.partitionBy(*key_cols, "__bucket").orderBy("__t", "__tag", "__tb")
            if back_dir:
                wb = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                in_bucket = F.last("__r", ignorenulls=True).over(wb)
            else:
                wb = wb.rowsBetween(Window.currentRow, Window.unboundedFollowing)
                in_bucket = F.first("__r", ignorenulls=True).over(wb)
            staged = df.withColumn("__in_bucket", in_bucket)
            bound_fn = F.max if back_dir else F.min
            per_bucket_bound = unioned.groupBy(*key_cols, "__bucket").agg(
                bound_fn(
                    F.when(
                        F.col("__r").isNotNull(),
                        F.struct(F.col("__t"), F.col("__tb"), F.col("__r")),
                    )
                ).alias("__bound_struct")
            )
            wc = Window.partitionBy(*key_cols).orderBy("__bucket")
            if back_dir:
                wc = wc.rowsBetween(Window.unboundedPreceding, -1)
                cross_fn = F.last(F.col("__bound_struct").getField("__r"), ignorenulls=True)
            else:
                wc = wc.rowsBetween(1, Window.unboundedFollowing)
                cross_fn = F.first(F.col("__bound_struct").getField("__r"), ignorenulls=True)
            carry = per_bucket_bound.select(
                *key_cols, "__bucket", cross_fn.over(wc).alias("__carry"),
            )
            # Null-safe carry join: a plain name-list join would drop rows
            # with a NULL key column or NULL time (__bucket =
            # floor(unix_micros(NULL)) = NULL), breaking the "row-identical
            # to the unbucketed path" contract — the unbucketed window keeps
            # NULL-key groups and gives NULL-time left rows their (possibly
            # null) match. groupBy treats NULL as a regular group, so every
            # (key, bucket) in `staged` exists in `carry`; eqNullSafe keeps
            # this an equi hash join.
            join_cols = key_cols + ["__bucket"]
            carry_r = carry
            for c in join_cols:
                carry_r = carry_r.withColumnRenamed(c, pre + c)
            cond = None
            for c in join_cols:
                clause = staged[c].eqNullSafe(carry_r[pre + c])
                cond = clause if cond is None else (cond & clause)
            return (
                staged.join(carry_r, cond, "left")
                .drop(*[pre + c for c in join_cols])
                .withColumn(out_col, F.coalesce("__in_bucket", "__carry"))
                .drop("__in_bucket", "__carry")
            )

        if nearest:
            # Two direction passes over the SAME (key, bucket)
            # partitioning, then the identical µs-gap comparison as the
            # unbucketed nearest (ties go backward). Equal-time rights
            # share the left row's bucket by construction, so the
            # backward pass still sees them at gap 0.
            m = bucketed_match(unioned, True, "__bk")
            m = bucketed_match(m, False, "__fw")
            bgap = F.unix_micros("__t") - F.unix_micros(F.col("__bk").getField("__mt"))
            fgap = F.unix_micros(F.col("__fw").getField("__mt")) - F.unix_micros("__t")
            matched = m.withColumn(
                "__match",
                F.when(F.col("__bk").isNull(), F.col("__fw"))
                .when(F.col("__fw").isNull(), F.col("__bk"))
                .when(fgap < bgap, F.col("__fw"))
                .otherwise(F.col("__bk")),
            ).drop("__bk", "__fw")
        else:
            matched = bucketed_match(unioned, back, "__match")
    out = matched.filter(F.col("__l").isNotNull()).withColumn(
        "__match", F.when(F.col("__t").isNotNull(), F.col("__match"))
    )
    if tolerance_seconds is not None:
        tol_us = int(round(tolerance_seconds * 1_000_000))
        gap = F.unix_micros("__t") - F.unix_micros(F.col("__match").getField("__mt"))
        if nearest:
            gap = F.abs(gap)
        elif not back:
            gap = -gap
        out = out.withColumn("__match", F.when(gap <= F.lit(tol_us), F.col("__match")))

    left_names = set(left.columns)
    proj = [F.col("__l").getField(c).alias(c) for c in left.columns]
    for c in right_cols:
        name = c + suffix if c in left_names else c
        proj.append(F.col("__match").getField("__p").getField(c).alias(name))
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
