"""Relational-sink writers (reference: postgresql_service.py).

The container has no Postgres/JDBC driver, so these are import-gated:
the Spark-side plumbing (partition fan-out, column mapping, batching,
NULL normalization) is real and unit-testable; only the socket write
needs a live database.

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
