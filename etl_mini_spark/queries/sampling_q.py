from etl_mini_spark.queries._base import *  # noqa: F401,F403
from etl_mini_spark.queries._base import _t, _TMP  # noqa: F401

# Deterministic sampling / dataset splits (operators/sampling.py — the
# training-data split idiom: membership is a pure function of the key,
# so it reproduces on any engine and needs no shuffle)
# =========================================================================

_BUCKET_SQL = "CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR) || ':{salt}'), 1, 15)) AS BIGINT) % 100000"


@q(
    "sample_split_counts",
    f"""WITH s AS (
         SELECT event_type, value,
                {_BUCKET_SQL.format(key='event_id', salt='split')} AS b
         FROM events)
       SELECT CASE WHEN b < 80000 THEN 'train'
                   WHEN b < 90000 THEN 'val' ELSE 'test' END AS split,
              event_type, count(*) AS n, round(sum(value), 2) AS sum_value
       FROM s GROUP BY 1, 2""",
)
def sample_split_counts(spark, sf_dir):
    """80/10/10 train/val/test split of events by event_id hash —
    disjoint, exhaustive, engine-portable; the split itself is a
    narrow map (zero shuffle), only this audit aggregation shuffles."""
    from etl_mini_spark.operators.sampling import split_assign

    e = _t(spark, sf_dir, "events")
    s = split_assign(e, "event_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return s.groupBy("split", "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


@q(
    "sample_deterministic",
    f"""SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id
       FROM events
       WHERE {_BUCKET_SQL.format(key='event_id', salt='')} < 5000""",
)
def sample_deterministic(spark, sf_dir):
    """~5% hash sample with a row-set checksum: the same rows are
    selected regardless of engine, run, or partitioning (df.sample is
    seed+partition dependent and can't promise that)."""
    from etl_mini_spark.operators.sampling import deterministic_sample

    e = _t(spark, sf_dir, "events")
    return deterministic_sample(e, "event_id", 0.05).agg(
        F.count("*").alias("n"), F.sum("event_id").alias("sum_id")
    )


@q(
    "sample_stratified_docs",
    """SELECT lang, doc_id FROM (
         SELECT lang, doc_id,
                row_number() OVER (PARTITION BY lang
                                   ORDER BY md5(CAST(doc_id AS VARCHAR) || ':'), doc_id) AS rk
         FROM documents) WHERE rk <= 20""",
)
def sample_stratified_docs(spark, sf_dir):
    """Class-balanced sampling: exactly 20 docs per language, ranked by
    key hash inside each stratum (deterministic pseudo-random order)."""
    from etl_mini_spark.operators.sampling import stratified_take

    d = _t(spark, sf_dir, "documents")
    return stratified_take(d, ["lang"], 20, "doc_id").select("lang", "doc_id")


# =========================================================================
