"""Real-SQL-consumer leg of the relational sink (r14 verdict item 4):
the foreachPartition bulk load and the ON CONFLICT keyed upsert run
end-to-end against an actual external SQL engine (SQLite — present on
every executor), not just a TSV file rendering. The upsert test is a
cross-engine DIFFERENTIAL: SQLite's own ``ON CONFLICT DO UPDATE SET
col = excluded.col`` vs the Spark-side ``merge_upsert`` on identical
inputs, including the explicit-NULL-overwrites contract
(reference postgresql_service.py:181-239)."""

from __future__ import annotations

import sqlite3

from tests.conftest import SF_SMOKE


def _lineitem_sample(spark):
    from etl_mini_spark.session import load_table
    from pyspark.sql import functions as F

    return (
        load_table(spark, SF_SMOKE, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("qty"),
            "l_returnflag",
            # a genuinely NULL-bearing column so NULL handling is exercised
            F.when(F.col("l_linenumber") % 3 == 0, F.col("l_returnflag")).alias(
                "maybe_flag"
            ),
        )
        .limit(2000)
    )


def test_sqlite_copy_append_roundtrip_multipartition(spark, tmp_path):
    """Append path: 8 concurrent partition writers into one SQLite
    file; the table contents must equal the DataFrame row multiset
    (NULLs preserved as SQL NULL, numbers as native types)."""
    from etl_mini_spark.sources.jdbc import copy_into_sqlite

    df = _lineitem_sample(spark).repartition(8)
    db = str(tmp_path / "sink.db")
    copy_into_sqlite(df, db, "lineitem_load", batch_size=256)

    con = sqlite3.connect(db)
    try:
        got = sorted(
            con.execute(
                "SELECT l_orderkey, l_linenumber, qty, l_returnflag, maybe_flag "
                "FROM lineitem_load"
            ).fetchall()
        )
        ntype = con.execute(
            "SELECT typeof(l_orderkey), typeof(qty), typeof(maybe_flag) "
            "FROM lineitem_load WHERE maybe_flag IS NULL LIMIT 1"
        ).fetchone()
    finally:
        con.close()
    want = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["qty"], r["l_returnflag"], r["maybe_flag"])
        for r in df.collect()
    )
    assert got == want
    assert ntype == ("integer", "real", "null")  # native types, real NULL
    assert any(r[4] is None for r in got) and any(r[4] is not None for r in got)


def test_sqlite_on_conflict_upsert_differential_vs_merge_upsert(spark, tmp_path):
    """Keyed upsert: seed SQLite with a target batch, upsert a source
    batch (overlapping keys, explicit NULLs, fresh keys) through
    INSERT ... ON CONFLICT DO UPDATE, and compare the final table
    against merge_upsert(target, source) computed by Spark — two
    independent engines implementing the same reference semantics."""
    from etl_mini_spark.operators import merge_upsert
    from etl_mini_spark.sources.jdbc import copy_into_sqlite

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        ["k", "tag", "val"],
    )
    source = spark.createDataFrame(
        [
            (2, "B", None),  # explicit NULL must OVERWRITE val=20.0
            (4, None, 44.0),  # explicit NULL tag overwrites "d"
            (5, "e", 50.0),  # fresh key inserts
        ],
        "k long, tag string, val double",
    )
    db = str(tmp_path / "upsert.db")
    copy_into_sqlite(target, db, "t", key_cols=["k"])
    copy_into_sqlite(source, db, "t", key_cols=["k"])

    con = sqlite3.connect(db)
    try:
        got = sorted(con.execute("SELECT k, tag, val FROM t").fetchall())
    finally:
        con.close()
    want = sorted(
        (r["k"], r["tag"], r["val"])
        for r in merge_upsert(target, source, keys=["k"]).collect()
    )
    assert got == want
    assert (2, "B", None) in got and (4, None, 44.0) in got and (5, "e", 50.0) in got


def test_sqlite_decimal_presence_and_schema_stability(spark, tmp_path):
    """Edge cases from the round-15 self-review: DecimalType binds
    (→ REAL, matching the DDL), an all-key presence table upserts via
    DO NOTHING instead of malformed SQL, and read_sqlite's schema is
    affinity-driven — stable for empty tables and all-NULL columns."""
    import decimal

    from etl_mini_spark.sources.jdbc import copy_into_sqlite, read_sqlite

    db = str(tmp_path / "edge.db")
    dec = spark.createDataFrame([(1, decimal.Decimal("10.25"))], "k long, amt decimal(10,2)")
    copy_into_sqlite(dec, db, "d")
    con = sqlite3.connect(db)
    try:
        assert con.execute("SELECT amt, typeof(amt) FROM d").fetchone() == (10.25, "real")
    finally:
        con.close()

    pres = spark.createDataFrame([(1,), (2,)], "k long")
    copy_into_sqlite(pres, db, "p", key_cols=["k"])
    copy_into_sqlite(pres, db, "p", key_cols=["k"])  # conflict-only batch
    con = sqlite3.connect(db)
    try:
        assert con.execute("SELECT count(*) FROM p").fetchone() == (2,)
    finally:
        con.close()

    copy_into_sqlite(spark.createDataFrame([], "a long, b string"), db, "e")
    assert read_sqlite(spark, db, "e").schema.simpleString() == "struct<a:bigint,b:string>"
    copy_into_sqlite(spark.createDataFrame([(1, None)], "a long, b string"), db, "n")
    assert read_sqlite(spark, db, "n").collect()[0]["b"] is None
