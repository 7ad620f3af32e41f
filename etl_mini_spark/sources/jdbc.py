"""Relational-sink writers (reference: postgresql_service.py).

The container has no Postgres/JDBC driver, so the psycopg2 legs are
import-gated; the SAME partition fan-out / batching / NULL discipline
/ ON CONFLICT semantics run end-to-end against SQLite (a real external
SQL engine present on every executor) via ``copy_into_sqlite`` —
pytest-pinned including a cross-engine upsert differential vs
``merge_upsert`` (tests/test_sqlite_sink.py). Only the Postgres socket
write itself still needs a live database.

- ``write_jdbc_append`` ≡ the parameterized-INSERT DataFrame path
  (postgresql_service.py:241-296) via Spark's batched JDBC writer.
- ``copy_into_postgres`` ≡ the bulk COPY FROM STDIN path
  (postgresql_service.py:117-179): per-partition psycopg2
  ``copy_expert`` streaming a TSV rendering of the partition — the
  parity-speed path, since JDBC row INSERTs are ~10× slower than COPY
  for wide loads.
- keyed upsert lives in operators/upsert.py (Delta MERGE / staging
  pattern); for a JDBC target the staging table + driver-issued
  ``INSERT ... ON CONFLICT`` completes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

TSV_NULL = r"\N"  # COPY-native NULL token; distinct from the string "NULL"


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    batchsize: int = 10000,
) -> None:
    """Batched-INSERT append. numPartitions bounds concurrent
    connections — a 1000-executor cluster must not open 1000 sockets
    against one Postgres."""
    props = {"batchsize": str(batchsize), **(properties or {})}
    df.coalesce(min(df.rdd.getNumPartitions(), 16)).write.jdbc(
        url, table, mode="append", properties=props
    )


def _sanitize_tsv_value(v) -> str:
    """COPY-text rendering of one value ≡ the reference's
    ``_sanitize_value`` (tsv_converter.py:83-94): nested dict/list →
    ``json.dumps``, then tab/newline/CR collapsed to spaces. SQL NULL
    renders as the COPY NULL token (postgresql_service.py:168 uses
    NULL '' — we pin the unambiguous \\N so empty strings stay
    distinguishable from NULL)."""
    import json

    if v is None:
        return TSV_NULL
    try:  # Spark Row → plain dict before JSON encoding
        from pyspark.sql import Row

        if isinstance(v, Row):
            v = v.asDict(recursive=True)
    except ImportError:  # pragma: no cover
        pass
    if isinstance(v, (dict, list)):
        v = json.dumps(v)
    return str(v).replace("\t", " ").replace("\n", " ").replace("\r", " ")


def _partition_to_tsv(rows, columns: list[str]):
    """Render a partition as COPY-ready TSV lines (tab/newline-safe,
    NULL → \\N — the normalization the reference does at
    tsv_converter.py:83-94 + postgresql_service.py:168)."""
    for row in rows:
        yield "\t".join(_sanitize_tsv_value(row[c]) for c in columns) + "\n"


def copy_into_postgres(
    df: DataFrame,
    dsn: str,
    table: str,
    columns: list[str] | None = None,
) -> None:
    """foreachPartition + COPY FROM STDIN. Each executor partition
    opens one connection and streams its rows — no driver-side
    materialization, linear scale-out up to the DB's ingest limit."""
    cols = columns or df.columns

    def sink(rows) -> None:
        try:
            import io

            import psycopg2  # optional dependency — absent in this container
        except ImportError as e:  # pragma: no cover - env without psycopg2
            raise NotImplementedError(
                "copy_into_postgres needs psycopg2 on executors; "
                "use write_jdbc_append or the parquet sinks instead"
            ) from e
        buf = io.StringIO()
        for line in _partition_to_tsv(rows, cols):
            buf.write(line)
        buf.seek(0)
        conn = psycopg2.connect(dsn)
        try:
            with conn.cursor() as cur:
                cur.copy_expert(
                    f"COPY {table} ({', '.join(cols)}) FROM STDIN WITH (FORMAT text, NULL '\\N')",
                    buf,
                )
            conn.commit()
        finally:
            conn.close()

    df.foreachPartition(sink)


# --- in-container real-SQL-consumer leg (SQLite) ---------------------------
# The container ships no Postgres server or psycopg2, but Python's
# sqlite3 IS a real external SQL engine available on every executor —
# so the foreachPartition fan-out, batching, NULL discipline, and
# ON CONFLICT upsert semantics of the reference's relational sink
# (postgresql_service.py:117-179 COPY, :181-239 upsert) run END-TO-END
# against an actual SQL consumer, not just a file rendering. The
# connection-per-partition and bounded-concurrency shape is identical
# to what the Postgres leg would do; only the DSN differs.

import datetime as _datetime
import decimal as _decimal
import json as _json_mod

from pyspark.sql import Row as _PysparkRow

_SQLITE_TYPES = {
    "tinyint": "INTEGER", "smallint": "INTEGER", "int": "INTEGER",
    "bigint": "INTEGER", "boolean": "INTEGER",
    "float": "REAL", "double": "REAL",
    "string": "TEXT", "date": "TEXT", "timestamp": "TEXT",
    "timestamp_ntz": "TEXT", "binary": "BLOB",
}


def _sqlite_ddl(df: DataFrame, table: str, key_cols: list[str] | None) -> str:
    cols = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t.startswith("decimal"):
            sql_t = "REAL"
        else:
            sql_t = _SQLITE_TYPES.get(t, "TEXT")  # arrays/structs/maps → JSON TEXT
        cols.append(f'"{f.name}" {sql_t}')
    keys = ", ".join(f'"{c}"' for c in (key_cols or []))
    pk = f", PRIMARY KEY ({keys})" if key_cols else ""
    return f'CREATE TABLE IF NOT EXISTS "{table}" ({", ".join(cols)}{pk})'


def _dbapi_value(v):
    """DBAPI parameter rendering with the same normalization contract
    as the TSV path: None stays SQL NULL, nested Row/dict/list → JSON
    text, datetime/date → ISO text, Decimal → float (matching the
    DDL's decimal→REAL mapping; sqlite3 cannot bind Decimal),
    everything else passes through as a native DBAPI type (no string
    coercion of numbers — parameterized statements, unlike COPY text,
    keep types). Imports are module-level — this runs
    rows × cols times per partition."""
    if v is None:
        return None
    if isinstance(v, _PysparkRow):
        v = v.asDict(recursive=True)
    if isinstance(v, (dict, list)):
        return _json_mod.dumps(v)
    if isinstance(v, _decimal.Decimal):
        return float(v)
    if isinstance(v, _datetime.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _datetime.date):
        return v.isoformat()
    return v


def copy_into_sqlite(
    df: DataFrame,
    db_path: str,
    table: str,
    key_cols: list[str] | None = None,
    batch_size: int = 5000,
    max_partitions: int = 16,
) -> None:
    """foreachPartition bulk load into a real SQL engine (SQLite).

    ``key_cols=None`` → plain batched INSERT (the COPY-parity append
    path). ``key_cols`` set → ``INSERT ... ON CONFLICT (keys) DO
    UPDATE SET col = excluded.col`` — the reference's keyed-upsert
    wire semantics (postgresql_service.py:181-239), including
    EXPLICIT-NULL parity: an incoming NULL overwrites, because the
    UPDATE reads ``excluded.*`` verbatim rather than COALESCEing.

    Scale story (unchanged from the Postgres leg): one connection per
    partition, ``max_partitions`` bounds concurrent connections so a
    1000-executor cluster cannot open 1000 sockets against one
    database; rows stream through executemany batches — nothing
    materializes on the driver. SQLite serializes writers with a busy
    timeout; a server DB takes the same code with a DSN swap."""
    cols = df.columns
    ddl = _sqlite_ddl(df, table, key_cols)
    collist = ", ".join(f'"{c}"' for c in cols)
    params = ", ".join("?" for _ in cols)
    if key_cols:
        keyset = ", ".join(f'"{k}"' for k in key_cols)
        updates = ", ".join(
            f'"{c}" = excluded."{c}"' for c in cols if c not in set(key_cols)
        )
        # a pure-key/presence table has no non-key columns to update —
        # ON CONFLICT DO NOTHING is the well-formed equivalent
        action = f"DO UPDATE SET {updates}" if updates else "DO NOTHING"
        stmt = (
            f'INSERT INTO "{table}" ({collist}) VALUES ({params}) '
            f"ON CONFLICT ({keyset}) {action}"
        )
    else:
        stmt = f'INSERT INTO "{table}" ({collist}) VALUES ({params})'

    import sqlite3

    # driver-side DDL once (IF NOT EXISTS keeps executors race-free)
    con = sqlite3.connect(db_path, timeout=120)
    try:
        con.execute(ddl)
        con.commit()
    finally:
        con.close()

    def sink(rows) -> None:
        import sqlite3 as sq

        conn = sq.connect(db_path, timeout=120)
        try:
            conn.execute("PRAGMA busy_timeout = 120000")
            batch = []
            for row in rows:
                batch.append(tuple(_dbapi_value(row[c]) for c in cols))
                if len(batch) >= batch_size:
                    conn.executemany(stmt, batch)
                    conn.commit()
                    batch.clear()
            if batch:
                conn.executemany(stmt, batch)
                conn.commit()
        finally:
            conn.close()

    df.coalesce(min(df.rdd.getNumPartitions() or 1, max_partitions)).foreachPartition(sink)


def read_sqlite(spark, db_path: str, table: str, schema: str | None = None) -> DataFrame:
    """Round-trip read of a sqlite table back into a DataFrame (driver
    reads, then parallelizes) — the verification leg for tests; a
    cluster deployment would use spark.read.jdbc against the server
    DB instead. Pass ``schema`` (DDL string) for a stable result on
    empty tables or all-NULL columns; without it the sqlite column
    affinity declares the types (INTEGER→long, REAL→double,
    else string), so the schema never depends on which rows happen to
    be present."""
    import sqlite3

    con = sqlite3.connect(db_path)
    try:
        cur = con.execute(f'SELECT * FROM "{table}"')
        names = [d[0] for d in cur.description]
        data = cur.fetchall()
        decl = {
            r[1]: (r[2] or "").upper()
            for r in con.execute(f'PRAGMA table_info("{table}")')
        }
    finally:
        con.close()
    if schema is None:
        def _t(n):
            d = decl.get(n, "")
            if "INT" in d:
                return "long"
            if "REAL" in d:
                return "double"
            if "BLOB" in d:
                return "binary"
            return "string"
        schema = ", ".join(f"`{n}` {_t(n)}" for n in names)
    return spark.createDataFrame(data, schema=schema)
