"""Every registry query vs. its DuckDB oracle at sf0.001 — the same
differential check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare


def _registry():
    from etl_mini_spark.queries import ORACLE, QUERIES

    return QUERIES, ORACLE


QUERIES, ORACLE = _registry()

# Exact declared output schema for each no-oracle (rows-only) entry.
# Their VALUE pins live in dedicated tests (HLL ±5% test_plans, IVF
# recall test_operators, capped-sessions differential+checksum); this
# registry-level pin makes empty output or schema drift fail loudly.
ROWS_ONLY_SCHEMAS = {
    "similarity_ivf": ["probe_id", "neighbor_id", "cosine"],
    "ann_pq_rerank": ["probe_id", "neighbor_id", "cosine"],
    "agg_approx_distinct": ["approx_users", "approx_types"],
    "stream_capped_sessions": [
        "user_id", "session_start", "session_end", "n_events", "closed_by",
    ],
    "stream_capped_sessions_checksum": [
        "closed_by", "n_sessions", "total_events", "bounds_checksum_us",
    ],
    # iterative float fixpoint — trajectory pinned by the numpy
    # differential test in test_operators.py
    "embedding_kmeans": ["cluster", "n_points", "wcss"],
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    if name in ORACLE:
        ok, msg = compare(df, ORACLE[name], SF_SMOKE)
        assert ok, f"{name}: {msg}"
    else:
        # rows-only: must produce output and exactly the declared schema —
        # a regression to empty output or a drifted schema fails here, at
        # the same place the driver's weaker rows-only check would look.
        assert name in ROWS_ONLY_SCHEMAS, (
            f"{name} has no oracle and no declared schema — add it to "
            "ROWS_ONLY_SCHEMAS or give it an oracle_sql entry"
        )
        n = df.count()
        assert n > 0, f"{name}: rows-only query produced empty output"
        assert df.columns == ROWS_ONLY_SCHEMAS[name], (
            f"{name}: schema drift {df.columns} != {ROWS_ONLY_SCHEMAS[name]}"
        )


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert "event_id" in df.columns


def test_oracle_keys_subset():
    assert set(ORACLE) <= set(QUERIES)


@pytest.mark.parametrize(
    "name",
    ["window_time_range_7d", "filter_time_range", "window_sliding_15m",
     "groupby_date_type", "time_derive_parts"],
)
def test_ntz_testdata_under_driver_default_session(spark, name):
    """CORRECTNESS_r04 regression: the driver runs queries with ITS OWN
    SparkSession (default confs — parquet NTZ inference ON) over testdata
    whose timestamps are naive µs. Query code must itself force LTZ reads
    (sources/readers.py:_force_ltz_timestamps) or instant-typed functions
    (unix_micros, window) throw DATATYPE_MISMATCH on TIMESTAMP_NTZ."""
    prior = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        df = QUERIES[name](spark, SF_SMOKE)
        assert "timestamp_ntz" not in [t for _, t in df.dtypes]
        ok, msg = compare(df, ORACLE[name], SF_SMOKE)
        assert ok, f"{name}: {msg}"
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prior)
