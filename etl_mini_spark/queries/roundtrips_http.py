from etl_mini_spark.queries._base import *  # noqa: F401,F403
from etl_mini_spark.queries._base import _t, _TMP  # noqa: F401

# File-format roundtrips (SURVEY §2.1 S3/S5: DQ-2, DQ-3)
# =========================================================================



@q(
    "http_api_extract",
    """SELECT CAST(range AS BIGINT) AS id,
              'row_' || range AS name,
              round(range * 1.5, 2) AS value
       FROM range(100)""",
)
def http_api_extract(spark, sf_dir):
    """S4: template-driven HTTP-API extract (≡ reference
    simple_api_service.py:19-61) landed as a DataFrame. The transport
    is a deterministic stub (no network in the harness): it parses the
    RENDERED url — so template selection, placeholder validation and
    substitution are all on the exercised path — and synthesizes the n
    requested JSON rows. The oracle regenerates the same rows from
    DuckDB's range()."""
    from etl_mini_spark.sources.http_api import fetch_to_dataframe

    templates = {
        "export": {
            "url": "stub://export/{TABLE}?n={N}",
            "headers": {"Authorization": "Bearer {TOKEN}"},
            "method": "GET",
        }
    }

    def stub_transport(request):
        import json as _json
        from urllib.parse import parse_qs, urlparse

        assert request["headers"]["Authorization"] == "Bearer tok0"
        n = int(parse_qs(urlparse(request["url"]).query)["n"][0])
        rows = [{"id": i, "name": f"row_{i}", "value": round(i * 1.5, 2)} for i in range(n)]
        return 200, "application/json", _json.dumps(rows).encode()

    return fetch_to_dataframe(
        spark,
        templates,
        "export",
        {"TABLE": "events", "N": "100", "TOKEN": "tok0"},
        transport=stub_transport,
        schema="id long, name string, value double",
    )


@q(
    "csv_roundtrip",
    """SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price,
              CAST(min(strftime(l_shipdate, '%Y-%m-%d')) AS VARCHAR) AS min_ship
       FROM lineitem WHERE l_orderkey % 10 = 0 GROUP BY l_returnflag""",
)
def csv_roundtrip(spark, sf_dir):
    """DQ-2 (S3/F6): export→CSV→re-read with explicit schema + renames +
    coercing casts (≡ the S3 chunked CSV scan, s3_service.py:155-184),
    then checksum."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    path = str(_TMP / f"csv_roundtrip_{Path(sf_dir).name}")
    (
        l.select(
            F.col("l_orderkey").alias("Order Key"),
            F.col("l_returnflag").alias("Return Flag"),
            F.col("l_extendedprice").alias("Extended Price"),
            F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("Ship Date"),
        )
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )
    schema = T.StructType(
        [
            T.StructField("Order Key", T.LongType()),
            T.StructField("Return Flag", T.StringType()),
            T.StructField("Extended Price", T.DoubleType()),
            T.StructField("Ship Date", T.StringType()),
        ]
    )
    rename = {"Order Key": "l_orderkey", "Return Flag": "l_returnflag",
              "Extended Price": "l_extendedprice", "Ship Date": "l_shipdate"}
    back = spark.read.option("header", True).schema(schema).csv(path).withColumnsRenamed(rename)
    back = back.withColumn("l_shipdate", F.try_to_timestamp("l_shipdate"))
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.min(F.date_format("l_shipdate", "yyyy-MM-dd")).alias("min_ship"),
    )


@q(
    "ndjson_roundtrip",
    """SELECT event_type, count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id
       FROM events WHERE user_id % 5 = 0 GROUP BY event_type""",
)
def ndjson_roundtrip(spark, sf_dir):
    """DQ-3 (S5/F9): events subset → JSON-Lines → re-read → checksum."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 0)
    path = str(_TMP / f"ndjson_roundtrip_{Path(sf_dir).name}")
    e.select("event_id", "event_type", "user_id").write.mode("overwrite").json(path)
    back = spark.read.json(path)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("event_id").alias("sum_id")
    )


# =========================================================================


@q(
    "csv_malformed_tolerant",
    """SELECT CAST(count(*) AS BIGINT) AS n_clean,
              CAST(37 AS BIGINT) AS n_corrupt,
              CAST(sum(n_chars) AS BIGINT) AS sum_chars
       FROM documents WHERE doc_id % 5 = 0""",
)
def csv_malformed_tolerant(spark, sf_dir):
    """Tolerant CSV ingestion (S3/F6 hardening): a file with 37 planted
    malformed lines reads in PERMISSIVE mode with a corrupt-record
    column — clean rows flow through typed, bad rows are counted, the
    job never dies. At 100 TB a single dirty row must not kill an
    ingest; DROPMALFORMED/FAILFAST stay one option away. The oracle
    derives the clean aggregate from the source table plus the planted
    constant. Fixture generation stays distributed: the clean rows are
    written by executors via df.write.csv (headers are per-file, which
    the directory read handles); only the 37 planted malformed lines
    are appended driver-side as their own small file."""
    tmp = _TMP / f"csv_malformed_{Path(sf_dir).name}"
    (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", "n_chars")
        .write.mode("overwrite")
        .option("header", True)
        .csv(str(tmp))
    )
    with open(tmp / "zz_malformed.csv", "w") as fh:
        fh.write("doc_id,n_chars\n")
        for i in range(37):
            fh.write(f"not_a_number_{i},oops\n")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    back = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema(schema)
        .csv(str(tmp))
        .cache()  # one scan: corrupt-record column forbids split aggregation over raw
    )
    return back.agg(
        F.count(F.when(F.col("_corrupt").isNull(), 1)).alias("n_clean"),
        F.count(F.when(F.col("_corrupt").isNotNull(), 1)).alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt").isNull(), F.col("n_chars"))).alias("sum_chars"),
    )


@q(
    "parquet_schema_evolution",
    """SELECT CASE WHEN doc_id % 2 = 1 THEN lang ELSE '(absent)' END AS lang_m,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(n_chars) AS BIGINT) AS sum_chars
       FROM documents GROUP BY lang_m""",
)
def parquet_schema_evolution(spark, sf_dir):
    """Schema evolution on read: an old batch written WITHOUT the lang
    column and a new batch WITH it merge under mergeSchema — missing
    fields surface as NULL instead of failing the scan. The pattern
    every long-lived 100 TB table needs when producers add columns;
    per-file footers drive the merge, no data rewrite."""
    d = _t(spark, sf_dir, "documents")
    base = _TMP / f"schema_evo_{Path(sf_dir).name}"
    d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "n_chars").write.mode(
        "overwrite"
    ).parquet(str(base / "b1"))
    d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "n_chars", "lang").write.mode(
        "overwrite"
    ).parquet(str(base / "b2"))
    back = spark.read.option("mergeSchema", True).parquet(str(base / "b1"), str(base / "b2"))
    return back.groupBy(
        F.coalesce("lang", F.lit("(absent)")).alias("lang_m")
    ).agg(F.count("*").alias("n"), F.sum("n_chars").alias("sum_chars"))


@q(
    "xml_roundtrip",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(event_id) AS BIGINT) AS sum_id,
              round(sum(value), 2) AS sum_value
       FROM events WHERE user_id % 7 = 0 GROUP BY event_type""",
)
def xml_roundtrip(spark, sf_dir):
    """XML roundtrip (Spark 4 built-in StAX source — completes the
    format matrix alongside parquet/ORC/CSV/JSON; spark-avro's module
    jar is the one absent format). Events subset → row-tagged XML →
    re-read with an explicit schema → checksum against the source
    table. XML parsing is per-record and codegen-free, so at 100 TB
    it is an ingest-edge format: land, convert to parquet once, query
    columnar thereafter."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    path = str(_TMP / f"xml_roundtrip_{Path(sf_dir).name}")
    (
        e.select("event_id", "event_type", "value")
        .write.mode("overwrite")
        .format("xml")
        .option("rootTag", "events")
        .option("rowTag", "event")
        .save(path)
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    back = spark.read.format("xml").option("rowTag", "event").schema(schema).load(path)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("event_id").alias("sum_id"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
