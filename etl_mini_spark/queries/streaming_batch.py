from etl_mini_spark.queries._base import *  # noqa: F401,F403
from etl_mini_spark.queries._base import _t, _TMP  # noqa: F401

# Streaming-window batch equivalents (SURVEY §2.9: DQ-33)
# =========================================================================

@q(
    "window_tumbling_1h",
    """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
              event_type, count(*) AS n, round(sum(value), 2) AS sum_value
       FROM events GROUP BY 1, 2""",
)
def window_tumbling_1h(spark, sf_dir):
    """DQ-33: tumbling 1h window per event_type — identical groupBy
    works under readStream+watermark (streaming/windows.py)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@q(
    "window_session_30m",
    """WITH x AS (
         SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_sess
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       ), y AS (
         SELECT user_id, ts,
                sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess
         FROM x)
       SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
              count(*) AS n_events
       FROM y GROUP BY user_id, sess""",
)
def window_session_30m(spark, sf_dir):
    """DQ-33b: session windows (30-min gap) in batch via
    F.session_window — same expression streams with a watermark."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("mn"))
        .select(
            "user_id",
            F.date_format("mn", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


# =========================================================================
