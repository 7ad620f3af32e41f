"""S6 (BOM-tolerant CSV scan) + S8 (COPY/TSV sink rendering) — the
file-level parity tests the container can run without S3 or Postgres.

- BOM: the reference decodes S3 CSV bytes as utf-8-sig
  (s3_service.py:133-144); our `read_csv` must yield clean header
  names and values from a BOM-prefixed file.
- TSV: the COPY wire format (`_partition_to_tsv`) is pinned by a
  committed golden file covering tabs, newlines, CRs, SQL NULLs,
  empty strings, and nested struct/array values
  (≡ tsv_converter.py:83-94 + postgresql_service.py:166-170).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_mini_spark.sources.jdbc import _partition_to_tsv
from etl_mini_spark.sources.readers import read_csv

FIXTURES = Path(__file__).parent / "fixtures"


def test_bom_csv_header_and_values(spark):
    df = read_csv(spark, str(FIXTURES / "bom.csv"))
    assert df.columns == ["id", "name", "amount"]  # no ﻿ prefix
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert rows[0]["id"] == "1" and rows[0]["name"] == "alpha"
    assert rows[2]["amount"] is None  # trailing empty field → NULL


def test_bom_csv_with_schema_and_typemap(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    df = read_csv(spark, str(FIXTURES / "bom.csv"), schema=schema)
    got = {r["id"]: (r["name"], r["amount"]) for r in df.collect()}
    assert got == {1: ("alpha", 10.5), 2: ("beta", 20.25), 3: ("gamma", None)}


def _tsv_fixture_df(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("label", T.StringType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("k", T.StringType()),
                        T.StructField("ns", T.ArrayType(T.LongType())),
                    ]
                ),
            ),
        ]
    )
    rows = [
        (1, "plain", 1.5, {"k": "v1", "ns": [1, 2]}),
        (2, "tab\there", 2.0, {"k": "v2", "ns": []}),
        (3, "line\nbreak\rcr", None, None),
        (4, None, 0.25, {"k": None, "ns": [7]}),
        (5, "", 3.0, {"k": "empty-string-above", "ns": None}),
    ]
    return spark.createDataFrame(rows, schema)


def test_tsv_golden(spark):
    df = _tsv_fixture_df(spark)
    lines = list(_partition_to_tsv(df.collect(), df.columns))
    golden = (FIXTURES / "tsv_sink.golden.tsv").read_text()
    assert "".join(lines) == golden


def test_tsv_null_vs_empty_distinct(spark):
    df = _tsv_fixture_df(spark)
    lines = {r[0]: r for r in (l.rstrip("\n").split("\t") for l in _partition_to_tsv(df.collect(), df.columns))}
    assert lines["4"][1] == "\\N"  # SQL NULL → COPY token
    assert lines["5"][1] == ""  # empty string stays empty
    assert "\t" not in lines["2"][1] and "\n" not in lines["3"][1]
    assert lines["1"][3] == '{"k": "v1", "ns": [1, 2]}'  # nested → JSON


def test_tsv_golden_loads_into_real_sql_consumer(spark):
    """Prove the COPY wire format against a REAL SQL consumer: DuckDB's
    COPY ... FROM with the same options the reference passes to Postgres
    (FORMAT text-ish: tab delimiter, NULL token, no quoting —
    postgresql_service.py:166-170). The landed table must reproduce the
    source DataFrame's values, with NULL and empty-string kept distinct
    and nested structs landed as their JSON rendering."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE landed (id BIGINT, label VARCHAR, amount DOUBLE, payload VARCHAR)"
    )
    con.execute(
        f"""COPY landed FROM '{FIXTURES / "tsv_sink.golden.tsv"}'
            (FORMAT csv, DELIMITER '\t', HEADER false, NULL '\\N',
             QUOTE '', ESCAPE '')"""
    )
    got = con.execute("SELECT * FROM landed ORDER BY id").fetchall()
    # the source rows after the sanitizer's documented lossy steps
    # (tab/newline/CR → space inside strings; nested → JSON)
    want = [
        (1, "plain", 1.5, '{"k": "v1", "ns": [1, 2]}'),
        (2, "tab here", 2.0, '{"k": "v2", "ns": []}'),
        (3, "line break cr", None, None),
        (4, None, 0.25, '{"k": null, "ns": [7]}'),
        (5, "", 3.0, '{"k": "empty-string-above", "ns": null}'),
    ]
    assert got == want
    # NULL vs empty string must survive the trip — the reason TSV_NULL
    # is \N rather than the ambiguous ''
    n_null, n_empty = con.execute(
        "SELECT count(*) FILTER (WHERE label IS NULL),"
        "       count(*) FILTER (WHERE label = '') FROM landed"
    ).fetchone()
    assert (n_null, n_empty) == (1, 1)
    # and the JSON payload is machine-readable on the consumer side
    ks = con.execute(
        "SELECT id, json_extract_string(payload, '$.k') FROM landed "
        "WHERE payload IS NOT NULL ORDER BY id"
    ).fetchall()
    assert ks == [(1, "v1"), (2, "v2"), (4, None), (5, "empty-string-above")]


def test_write_bucketed_never_deletes_external_table_data(spark, tmp_path):
    """Overwrite-cleanup safety (r5 advice): an EXTERNAL table's data
    must survive write_bucketed(mode="overwrite") on the same name —
    DROP TABLE keeps external data by contract, and the orphan-dir
    cleanup must never fire at a location a catalog entry owns."""
    from etl_mini_spark.sources.writers import write_bucketed

    ext_loc = tmp_path / "ext_data"
    spark.range(5).selectExpr("id AS k", "id * 2 AS v").write.parquet(str(ext_loc))
    spark.sql("DROP TABLE IF EXISTS ext_prot")
    spark.sql(f"CREATE TABLE ext_prot (k BIGINT, v BIGINT) USING parquet LOCATION '{ext_loc}'")
    try:
        assert spark.table("ext_prot").count() == 5
        df = spark.range(3).selectExpr("id AS k", "id AS v")
        write_bucketed(df, "ext_prot", ["k"], num_buckets=4)
        # new managed table readable; old external files untouched on disk
        assert spark.table("ext_prot").count() == 3
        assert spark.read.parquet(str(ext_loc)).count() == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS ext_prot")


def test_write_bucketed_cleans_orphaned_warehouse_dir(spark):
    """A warehouse directory left behind by a dead session (no catalog
    entry) must be cleared so saveAsTable does not die with
    LOCATION_ALREADY_EXISTS."""
    from pathlib import Path

    from etl_mini_spark.sources.writers import write_bucketed

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    orphan = Path(wh) / "orphan_bucketed_t"
    spark.sql("DROP TABLE IF EXISTS orphan_bucketed_t")
    orphan.mkdir(parents=True, exist_ok=True)
    (orphan / "junk.parquet").write_text("not parquet")
    try:
        df = spark.range(4).selectExpr("id AS k", "id AS v")
        write_bucketed(df, "orphan_bucketed_t", ["k"], num_buckets=4)
        assert spark.table("orphan_bucketed_t").count() == 4
    finally:
        spark.sql("DROP TABLE IF EXISTS orphan_bucketed_t")


def test_binaryfile_source_feeds_multimodal_pipeline(spark, tmp_path):
    """Raw-file multimodal ingest: `binaryFile` scans a directory into
    (path, length, content) rows whose bytes round-trip exactly, and the
    content column feeds the same decode plumbing attach_binary_payload
    fabricates payloads for — closing the loop from files on disk to
    the multimodal operators without any media library."""
    import pyspark.sql.functions as F

    blobs = {f"img_{i}.bin": bytes([i] * (10 + i)) for i in range(5)}
    d = tmp_path / "media"
    d.mkdir()
    for name, data in blobs.items():
        (d / name).write_bytes(data)
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(d))
        .select(
            F.element_at(F.split("path", "/"), -1).alias("fname"),
            "length",
            "content",
        )
    )
    rows = {r["fname"]: r for r in df.collect()}
    assert set(rows) == set(blobs)
    for name, data in blobs.items():
        assert bytes(rows[name]["content"]) == data
        assert rows[name]["length"] == len(data)
    # bytes survive a DataFrame transform on the binary column
    sized = df.select("fname", F.length("content").alias("n")).collect()
    assert {r["fname"]: r["n"] for r in sized} == {k: len(v) for k, v in blobs.items()}
