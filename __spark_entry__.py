"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline slice (SURVEY.md §7.1);
``queries()``/``oracle_sql()`` expose the full registry from
etl_mini_spark.queries — one entry per implemented operator from
SURVEY.md §2, each with its DuckDB oracle (keys without an oracle are
genuinely non-SQL-expressible and get the rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's §3.1
    ES→PG pipeline payload re-expressed as one lazy Spark plan —
    half-open time filter → term filter → nested JSON extraction →
    derived time columns → constants → ordered keep-first dedup."""
    from pyspark.sql import functions as F

    from etl_mini_spark.functions.time_fns import derive_time_parts
    from etl_mini_spark.operators.dedup import ordered_dedup
    from etl_mini_spark.session import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    out = (
        e.filter((F.col("ts") >= "2024-01-05 00:00:00") & (F.col("ts") < "2024-01-25 00:00:00"))
        .filter(F.col("event_type") != "error")
        .withColumn("k", F.get_json_object("props", "$.k").cast("long"))
    )
    out = derive_time_parts(out, "ts")
    out = out.withColumn("source", F.lit("events_raw")).withColumn("version_", F.lit("v1"))
    out = ordered_dedup(out, ["user_id", "event_type"], ["ts", "event_id"])
    return out.select(
        "event_id", "user_id", "event_type", "k",
        "datetime_s", "time_mcs", "month_", "source", "version_",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from etl_mini_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from etl_mini_spark.queries import ORACLE

    return dict(ORACLE)
