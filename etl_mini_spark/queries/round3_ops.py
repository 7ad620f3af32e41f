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
