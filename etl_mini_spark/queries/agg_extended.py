from etl_mini_spark.queries._base import *  # noqa: F401,F403
from etl_mini_spark.queries._base import _t, _TMP  # noqa: F401

# Extended aggregation surface (SURVEY §2.4 A4: cube / grouping sets /
# approx-distinct) and windowed/sliding/pivot shapes
# =========================================================================

@q(
    "agg_cube",
    """SELECT r_name, n_name, count(*) AS n, round(sum(c_acctbal), 2) AS sum_bal
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY CUBE (r_name, n_name)""",
)
def agg_cube(spark, sf_dir):
    """A4: cube over the joined star (all 4 grouping-set combinations)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .cube("r_name", "n_name")
        .agg(F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 2).alias("sum_bal"))
    )


@q(
    "agg_grouping_sets",
    """SELECT r_name, mktsegment, count(*) AS n
       FROM (SELECT r_name, c_mktsegment AS mktsegment
             FROM customer
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey)
       GROUP BY GROUPING SETS ((r_name), (mktsegment))""",
)
def agg_grouping_sets(spark, sf_dir):
    """A4: explicit grouping sets — per-region and per-segment totals in
    one pass (SQL surface; Spark expands to a single shuffle)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", F.col("c_mktsegment").alias("mktsegment"))
    )
    j.createOrReplaceTempView("__gs_in")
    return spark.sql(
        """SELECT r_name, mktsegment, count(*) AS n
           FROM __gs_in GROUP BY GROUPING SETS ((r_name), (mktsegment))"""
    )


@q("agg_approx_distinct")  # approximate by design — rows-only check
def agg_approx_distinct(spark, sf_dir):
    """A3 scale path: HyperLogLog++ distinct counts. At 100 TB the exact
    count-distinct shuffle is the bottleneck; HLL sketches aggregate
    map-side into a few KB per partition. rsd pinned for determinism.

    Rows-only here because Spark's HLL++ register layout is not
    engine-portable; the VALUE-checkable twin is the registered
    ``hyperloglog_md5_replay`` entry (round18_ops.py) — an
    own-implementation 64-register md5 HLL whose estimate hash-matches
    DuckDB exactly — plus the 5%-of-exact accuracy pin in tests."""
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.approx_count_distinct("event_type", rsd=0.01).alias("approx_types"),
    )


@q(
    "window_sliding_15m",
    """WITH slid AS (
         SELECT event_type,
                unnest([time_bucket(INTERVAL '15 minutes', ts) - to_minutes(15*k)
                        for k in range(0, 4)]) AS window_start
         FROM events)
       SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
              event_type, count(*) AS n
       FROM slid GROUP BY 1, 2""",
)
def window_sliding_15m(spark, sf_dir):
    """§2.9: 1-hour window sliding every 15 min (each event lands in 4
    windows). Same function body serves readStream inputs."""
    from etl_mini_spark.streaming.windows import sliding_counts

    e = _t(spark, sf_dir, "events")
    out = sliding_counts(e, "ts", ["event_type"], width="1 hour", slide="15 minutes")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
    )


@q(
    "pivot_type_counts",
    """SELECT user_id,
              CAST(count(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS click,
              CAST(count(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS view,
              CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
              CAST(count(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS signup,
              CAST(count(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS error
       FROM events GROUP BY user_id""",
)
def pivot_type_counts(spark, sf_dir):
    """Pivot: per-user event-type count matrix. Explicit value list —
    an unpinned pivot would need an extra distinct pass at scale."""
    e = _t(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c)
          for c in ["click", "view", "purchase", "signup", "error"]],
    )


@q(
    "unpivot_part_metrics",
    """SELECT p_partkey, metric, round(value, 2) AS value FROM (
         SELECT p_partkey, 'size' AS metric, p_size::DOUBLE AS value FROM part
         UNION ALL
         SELECT p_partkey, 'retailprice' AS metric, p_retailprice::DOUBLE AS value FROM part)""",
)
def unpivot_part_metrics(spark, sf_dir):
    """Unpivot (melt): wide part metrics → long (key, metric, value)."""
    p = _t(spark, sf_dir, "part")
    return p.unpivot(
        "p_partkey",
        [F.col("p_size").cast("double").alias("size"),
         F.col("p_retailprice").cast("double").alias("retailprice")],
        "metric",
        "value",
    ).select("p_partkey", "metric", F.round("value", 2).alias("value"))


@q(
    "array_math_suite",
    """SELECT vec_id,
              CAST(len(embedding) AS INT) AS dim,
              round(list_min(embedding)::DOUBLE, 6) AS vmin,
              round(list_max(embedding)::DOUBLE, 6) AS vmax,
              round(list_sum(embedding::DOUBLE[]), 6) AS vsum,
              round(sqrt(list_sum([x*x for x in embedding::DOUBLE[]])), 6) AS l2norm
       FROM embeddings""",
)
def array_math_suite(spark, sf_dir):
    """§2.7 array/math surface over array<float>: size, min/max,
    aggregate-sum, L2 norm — all JVM-side higher-order functions."""
    e = _t(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("vmin"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("vmax"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x), 6).alias("vsum"),
        F.round(F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x * x)), 6).alias("l2norm"),
    )


@q(
    "multimodal_frames",
    """SELECT doc_id, CAST(unnest(range(0, octet_length(encode(text)) % 16 + 1, 4)) AS INT) AS frame_idx
       FROM documents""",
)
def multimodal_frames(spark, sf_dir):
    """Frame sampling plumbing: one row per sampled frame (stub demuxer,
    real mapInPandas batch shape). Oracle reproduces the deterministic
    frame-count rule."""
    from etl_mini_spark.operators.multimodal import frame_sample

    d = attach_binary_payload(_t(spark, sf_dir, "documents"), "text")
    return frame_sample(d, "doc_id").select("doc_id", "frame_idx")


# Round-13: the legacy rows-only `multimodal_resize`/`multimodal_features`
# stub entries (fake kernels over string-encoded payloads) retired from
# the registry — superseded by the oracle-backed real-pixel
# multimodal_resize_real / multimodal_features_real differentials in
# round13_ops.py; the stub operators stay pytest-covered as the
# drop-in batch shape for heavy production decoders.


# =========================================================================
