"""Physical-plan property tests — scale behavior asserted, not eyeballed:
pushdown reaches the scan, dims broadcast, bucketing kills the shuffle."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

TMP = Path("/root/repo/tmp/planruns")


def test_time_range_predicate_reaches_scan(spark):
    from datetime import datetime

    from etl_mini_spark.plans.explain import plan_summary
    from etl_mini_spark.sources.readers import read_parquet_ts_range

    df = read_parquet_ts_range(
        spark, f"{SF_SMOKE}/events.parquet", "ts",
        start=datetime(2024, 1, 10), end=datetime(2024, 1, 20),
    ).groupBy("event_type").count()
    s = plan_summary(df)
    ev = [sc for sc in s.scans if "events" in (sc["path"] or "")]
    assert ev and "GreaterThanOrEqual(ts" in ev[0]["pushed_filters"], s.text


def test_star_join_broadcasts_dims(spark):
    from etl_mini_spark.plans.explain import plan_summary
    from etl_mini_spark.queries import QUERIES

    s = plan_summary(QUERIES["join_star_dims"](spark, SF_SMOKE))
    assert s.joins.count("BroadcastHashJoin") >= 2, s.joins
    assert "SortMergeJoin" not in s.joins


def test_scan_prunes_columns(spark):
    from etl_mini_spark.plans.explain import plan_summary
    from etl_mini_spark.session import load_table

    df = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_extendedprice")
    s = plan_summary(df)
    schema = s.scans[0]["read_schema"]
    assert "l_orderkey" in schema and "l_comment" not in schema, schema


def test_bucketed_join_has_no_shuffle(spark):
    import shutil

    from etl_mini_spark.plans.explain import plan_summary
    from etl_mini_spark.session import load_table
    from etl_mini_spark.sources.writers import write_bucketed

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    o = load_table(spark, SF_SMOKE, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")
    write_bucketed(o, "b_orders", ["o_custkey"], num_buckets=8, sort_cols=["o_custkey"])
    write_bucketed(c, "b_customer", ["c_custkey"], num_buckets=8, sort_cols=["c_custkey"])
    # disable broadcast so the join must pick a key-distribution strategy
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        s = plan_summary(j)
        assert s.n_exchanges == 0, s.text  # bucket co-location replaces the shuffle
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
