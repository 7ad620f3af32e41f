from etl_mini_spark.queries._base import *  # noqa: F401,F403
from etl_mini_spark.queries._base import _t, _TMP  # noqa: F401

# Round-3 additions: batch sessionization + Gopher repetition filters
# =========================================================================

@q(
    "sessionize_events",
    """WITH g AS (
         SELECT user_id, event_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       s AS (SELECT user_id, ts,
                    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      AS session_idx
             FROM g)
       SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
              strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
              CAST(count(*) AS BIGINT) AS n_events
       FROM s GROUP BY user_id, session_idx""",
)
def sessionize_events(spark, sf_dir):
    """Batch sessionization (30-min gap) — flag+running-sum+aggregate in
    one user_id shuffle (operators/timeseries.py:sessionize); the
    groupBy reuses the window's hash partitioning, so no second
    exchange. Batch twin of the streaming sessionizers (ST4/ST-custom)."""
    from etl_mini_spark.operators.timeseries import sessionize

    e = _t(spark, sf_dir, "events")
    out = sessionize(e, "user_id", "ts", gap_s=1800, tiebreak_col="event_id")
    return out.select(
        "user_id",
        "session_idx",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


@q(
    "text_repetition",
    """WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS words
                  FROM documents),
            s AS (SELECT doc_id, words,
                         len(words) AS n_words,
                         len(list_distinct(words)) AS n_distinct,
                         CASE WHEN len(words) >= 2
                              THEN list_transform(range(1, len(words)),
                                                  i -> words[i] || ' ' || words[i+1])
                              ELSE [] END AS bigrams
                  FROM w),
            c AS (SELECT doc_id, u.w, count(*) AS n
                  FROM (SELECT doc_id, unnest(words) AS w FROM w) u
                  GROUP BY doc_id, u.w),
            top AS (SELECT doc_id, n FROM (
                      SELECT doc_id, n,
                             row_number() OVER (PARTITION BY doc_id
                                                ORDER BY n DESC, w) AS rn
                      FROM c) WHERE rn = 1)
       SELECT s.doc_id,
              CAST(s.n_words AS BIGINT) AS n_words,
              CAST(s.n_distinct AS BIGINT) AS n_distinct_words,
              round(1 - s.n_distinct / CAST(s.n_words AS DOUBLE), 6) AS dup_word_frac,
              round(CASE WHEN len(s.bigrams) > 0
                         THEN 1 - len(list_distinct(s.bigrams)) / CAST(len(s.bigrams) AS DOUBLE)
                         ELSE 0 END, 6) AS dup_bigram_frac,
              round(top.n / CAST(s.n_words AS DOUBLE), 6) AS top_word_frac
       FROM s JOIN top USING (doc_id)""",
)
def text_repetition(spark, sf_dir):
    """Gopher-style repetition quality filters (Rae et al. 2021 §A1.1):
    duplicate-word / duplicate-bigram / top-word fractions per document
    — the standard pre-training corpus hygiene pass for boilerplate and
    degenerate repetition (operators/text.py:repetition_metrics)."""
    d = _t(spark, sf_dir, "documents")
    return TX.repetition_metrics(d, "doc_id", "text")


# =========================================================================


_Q6_SQL = """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


@q("sql_q6_forecast", _Q6_SQL)
def sql_q6_forecast(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change) — the canonical
    pushdown/codegen showcase: all three predicates reach the parquet
    scan, the whole query is one scan + one partial/final agg, no
    shuffle wider than a single double."""
    from etl_mini_spark.session import register_tables

    register_tables(spark, sf_dir, ["lineitem"])
    return spark.sql(_Q6_SQL)


_Q14_SQL = """
    SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'
"""


@q("sql_q14_promo", _Q14_SQL)
def sql_q14_promo(spark, sf_dir):
    """TPC-H Q14 (promotion effect) — month-sliced fact scan joined to
    the part dim; the date filter prunes before the join and AQE
    broadcasts the dim side."""
    from etl_mini_spark.session import register_tables

    register_tables(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(_Q14_SQL)


@q(
    "agg_corr_regr",
    """SELECT l_returnflag,
              round(corr(l_extendedprice, l_quantity), 6) AS corr_price_qty,
              round(covar_samp(l_extendedprice, l_quantity), 4) AS covar_s,
              round(covar_pop(l_extendedprice, l_quantity), 4) AS covar_p,
              round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
              round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_corr_regr(spark, sf_dir):
    """Bivariate statistics per group — corr / sample+population
    covariance / least-squares slope+intercept, all JVM streaming
    aggregates (one partial+final hash agg, no second pass over the
    data)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_price_qty"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias("covar_s"),
        F.round(F.covar_pop("l_extendedprice", "l_quantity"), 4).alias("covar_p"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
    )


@q(
    "embedding_quantize",
    """WITH v AS (SELECT vec_id,
                         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                  FROM embeddings),
            s AS (SELECT vec_id, v,
                         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
                  FROM v),
            qd AS (SELECT vec_id, v, scale,
                          list_transform(v, x -> floor(x / scale + 0.5) * scale) AS dq
                   FROM s)
       SELECT vec_id, round(scale, 8) AS scale,
              round(list_max(list_transform(range(1, len(v) + 1),
                                            i -> abs(v[i] - dq[i]))), 8) AS max_abs_err,
              round(list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * dq[i]))
                    / (sqrt(list_sum(list_transform(v, x -> x * x)))
                       * sqrt(list_sum(list_transform(dq, x -> x * x)))), 6) AS cos_dq
       FROM qd""",
)
def embedding_quantize(spark, sf_dir):
    """int8 symmetric quantization of an embedding column — the storage
    form a 100 TB embedding corpus actually ships in (4× smaller than
    float32, 8× than float64). Per vector: scale = max|x|/127, q =
    floor(x/scale + 0.5) (floor-form rounding so both engines agree on
    .5 ties), then the quality report: max dequantization error and
    cosine(original, dequantized). All JVM array expressions — no
    Python, no shuffle; the same transform writes the quantized column
    in a production pipeline."""
    e = _t(spark, sf_dir, "embeddings")
    d = (
        e.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .withColumn(
            "scale", F.array_max(F.transform("v", lambda x: F.abs(x))) / 127.0
        )
        .withColumn(
            "dq",
            F.transform(
                "v", lambda x: F.floor(x / F.col("scale") + 0.5) * F.col("scale")
            ),
        )
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return d.select(
        "vec_id",
        F.round("scale", 8).alias("scale"),
        F.round(
            F.array_max(F.zip_with("v", "dq", lambda a, b: F.abs(a - b))), 8
        ).alias("max_abs_err"),
        F.round(
            dot("v", "dq") / (F.sqrt(dot("v", "v")) * F.sqrt(dot("dq", "dq"))), 6
        ).alias("cos_dq"),
    )


@q(
    "window_value_suite",
    """SELECT event_id, user_id,
              round(first_value(value) OVER w1, 6) AS first_v,
              round(last_value(value) OVER w2, 6) AS last_v,
              round(nth_value(value, 3) OVER w2, 6) AS third_v
       FROM events
       WINDOW w1 AS (PARTITION BY user_id ORDER BY ts, event_id),
              w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
)
def window_value_suite(spark, sf_dir):
    """W-suite: first_value / last_value / nth_value — last and nth over
    the FULL partition frame (the default running frame makes
    last_value degenerate to the current row, a classic window-function
    trap both engines share)."""
    e = _t(spark, sf_dir, "events")
    running = Window.partitionBy("user_id").orderBy("ts", "event_id")
    full = running.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.first("value").over(running), 6).alias("first_v"),
        F.round(F.last("value").over(full), 6).alias("last_v"),
        F.round(F.nth_value("value", 3).over(full), 6).alias("third_v"),
    )


@q(
    "outlier_trim",
    """WITH b AS (SELECT event_type,
                         quantile_cont(value, 0.01) AS lo,
                         quantile_cont(value, 0.99) AS hi
                  FROM events GROUP BY event_type)
       SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_kept,
              round(avg(e.value), 6) AS avg_trimmed,
              round(min(e.value), 6) AS min_kept, round(max(e.value), 6) AS max_kept
       FROM events e JOIN b ON e.event_type = b.event_type
       WHERE e.value >= b.lo AND e.value <= b.hi
       GROUP BY e.event_type""",
)
def outlier_trim(spark, sf_dir):
    """Percentile-based outlier trimming (the standard robust-stats
    feature-cleaning pass): exact p01/p99 per group, keep the inner
    band, report trimmed stats. The bounds table is group-cardinality-
    sized — AQE broadcasts it — and Spark's exact `percentile` uses the
    same linear interpolation as the oracle's quantile_cont."""
    e = _t(spark, sf_dir, "events")
    b = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.01)).alias("lo"),
        F.percentile("value", F.lit(0.99)).alias("hi"),
    )
    return (
        e.join(b, "event_type")
        .filter((F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi")))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(F.avg("value"), 6).alias("avg_trimmed"),
            F.round(F.min("value"), 6).alias("min_kept"),
            F.round(F.max("value"), 6).alias("max_kept"),
        )
    )


@q(
    "pipeline_corpus_filter",
    """WITH keep AS (SELECT min(doc_id) AS doc_id
                     FROM documents
                     GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))),
            dd AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
            f AS (SELECT * FROM dd WHERE n_chars >= 150),
            s AS (SELECT * FROM f
                  WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':corpus'), 1, 15)) AS BIGINT) % 100000 < 50000)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              round(avg(n_chars), 6) AS avg_chars,
              CAST(sum(doc_id) AS BIGINT) AS id_checksum
       FROM s GROUP BY lang""",
)
def pipeline_corpus_filter(spark, sf_dir):
    """End-to-end corpus-prep composition — the shape every training-
    data pipeline runs: exact dedup (keep min id) → length filter →
    deterministic 50 % hash sample → per-language audit. Composes the
    REAL operators (exact_dedup, deterministic_sample), not inline
    re-implementations, so the differential check covers their
    interaction: dedup's fingerprint shuffle, the narrow filter+sample
    maps, one audit aggregation."""
    from etl_mini_spark.operators.dedup import exact_dedup_keep
    from etl_mini_spark.operators.sampling import deterministic_sample

    d = _t(spark, sf_dir, "documents")
    # row-set form of exact dedup: same keep rule (min doc_id per
    # fingerprint), one fingerprint window instead of agg + join-back
    dd = exact_dedup_keep(d, "text", "doc_id")
    f = dd.filter(F.col("n_chars") >= 150)
    s = deterministic_sample(f, "doc_id", 0.5, salt="corpus")
    return s.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.sum("doc_id").alias("id_checksum"),
    )
