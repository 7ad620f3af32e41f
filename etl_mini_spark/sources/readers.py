"""Source readers — the reference's extraction services re-expressed as
schema-explicit Spark reads.

- ``source_exists`` ≡ the existence gates (reference:
  elasticsearch_service.py:89-96, s3_service.py:79-92, and the
  warn-or-fail wiring in both standard pipelines).
- ``read_csv`` ≡ the S3 chunked CSV scan with rename/type maps
  (s3_service.py:155-184): chunks become partitions, rename maps become
  aliased selects, ``errors="coerce"`` casts become try_* functions.
  UTF-8 BOM is handled by the reader (≡ _process_csv_binary,
  s3_service.py:133-144).
- ``read_ndjson`` ≡ parse_json_lines input (data_processing.py:18-60).

Explicit schemas everywhere: schema inference is a full extra pass over
the data at 100 TB and can silently drift between runs.
"""

from __future__ import annotations

from contextlib import contextmanager
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SourceMissingError(Exception):
    """≡ the reference's fail_on_missing pipeline gate."""


def source_exists(spark: SparkSession, path: str) -> bool:
    """Driver-side existence probe — cheap, runs before any job."""
    if "://" not in path or path.startswith("file://"):
        return Path(path.removeprefix("file://")).exists()
    # Generic Hadoop FS probe for object stores / HDFS.
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def require_source(spark: SparkSession, path: str, fail_on_missing: bool = True) -> bool:
    """Existence gate: raise (fail_on_missing) or report False so the
    pipeline can skip WITHOUT advancing its checkpoint (see
    plans/checkpoint.py — reference standard_pipeline.py:20-23,73-79)."""
    if source_exists(spark, path):
        return True
    if fail_on_missing:
        raise SourceMissingError(f"source not found: {path}")
    return False


def _apply_type_map(df: DataFrame, type_map: dict[str, str]) -> DataFrame:
    """Coercing casts: unparseable values become NULL, not errors
    (≡ pd.to_datetime(..., errors='coerce') + nullable-string handling,
    s3_service.py:171-182)."""
    for col, typ in type_map.items():
        if col not in df.columns:
            continue
        if typ in ("timestamp", "datetime64[ns]"):
            df = df.withColumn(col, F.try_to_timestamp(F.col(col)))
        elif typ in ("bool", "boolean"):
            df = df.withColumn(col, F.lower(F.col(col)).cast("boolean"))
        elif typ == "str":
            # empty string → NULL (s3_service.py:179-180)
            df = df.withColumn(col, F.nullif(F.col(col).cast("string"), F.lit("")))
        else:
            df = df.withColumn(col, F.expr(f"try_cast({col} AS {typ})"))
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    rename_map: dict[str, str] | None = None,
    type_map: dict[str, str] | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV scan with rename + coercing-cast maps. The reader consumes
    UTF-8 BOM when present; partitions replace the reference's 10k-row
    chunks and Catalyst prunes/pushes into the scan."""
    reader = spark.read.option("header", header).option("encoding", "UTF-8")
    df = reader.schema(schema).csv(path) if schema is not None else reader.csv(path)
    if rename_map:
        df = df.withColumnsRenamed(rename_map)
    if type_map:
        df = _apply_type_map(df, type_map)
    return df


def read_ndjson(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """JSON-Lines reader (schema strongly recommended at scale)."""
    reader = spark.read
    return reader.schema(schema).json(path) if schema is not None else reader.json(path)


_NS_COLS_CACHE: dict[str, list[str]] = {}


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS) — Spark cannot
    read those natively (PARQUET_TYPE_ILLEGAL); we read them as long
    via the legacy conf and convert to µs timestamps ourselves."""
    if path not in _NS_COLS_CACHE:
        import pyarrow as pa
        import pyarrow.parquet as pq

        probe = Path(path.removeprefix("file://"))
        if probe.is_dir():
            parts = sorted(probe.glob("*.parquet")) or sorted(probe.rglob("*.parquet"))
            if not parts:
                _NS_COLS_CACHE[path] = []
                return _NS_COLS_CACHE[path]
            probe = parts[0]
        schema = pq.read_schema(probe)
        _NS_COLS_CACHE[path] = [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    return _NS_COLS_CACHE[path]


@contextmanager
def _force_ltz_timestamps(spark: SparkSession):
    """Read parquet TIMESTAMP(isAdjustedToUTC=false) as session-tz
    TIMESTAMP (LTZ), not TIMESTAMP_NTZ — scoped to the wrapped read.

    The driver-provided testdata stores naive µs timestamps; Spark 4's
    default ``inferTimestampNTZ`` maps those to TIMESTAMP_NTZ, which
    breaks instant-typed functions (``unix_micros``/``window``/
    watermarks) and diverges from the DuckDB oracle's naive-epoch math.
    With the session timezone pinned to UTC (session.load_table), an
    LTZ read of naive data is value-identical to the oracle.

    The conf only drives EAGER schema inference (the DataFrameReader
    resolves parquet footers at ``.parquet()`` time), so set/restore
    around the read is sound AND leaves the caller's session semantics
    untouched for subsequent non-framework ``spark.read.parquet`` calls
    (previously this helper flipped the conf permanently — NTZ data in
    the same session would silently read as LTZ afterwards)."""
    key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    try:
        prev = spark.conf.get(key, None)
    except Exception:
        prev = None
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan, tolerant of TIMESTAMP(NANOS) columns: those are
    read as long (legacy conf) and converted to µs timestamps with
    integer DIV (ns epochs overflow a double mantissa).

    NOTE: when ns columns are present, ``nanosAsLong`` stays set on the
    session — that conf is consulted at EXECUTION time (not just schema
    inference), so restoring it before the action runs would break the
    deferred scan. It is additive-safe: it only affects parquet files
    that actually contain TIMESTAMP(NANOS), which Spark cannot read at
    all without it."""
    ns_cols = _nanos_timestamp_cols(path) if "://" not in path or path.startswith("file://") else []
    if not ns_cols:
        with _force_ltz_timestamps(spark):
            return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    with _force_ltz_timestamps(spark):
        df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
    return df


def read_parquet_ts_range(
    spark: SparkSession,
    path: str,
    ts_col: str,
    start=None,
    end=None,
) -> DataFrame:
    """Half-open time-range scan ``[start, end)`` with the predicate
    PUSHED INTO the parquet scan.

    A filter applied after the ns→µs conversion wraps the column in
    ``timestamp_micros(... DIV 1000)`` — Catalyst cannot push that
    through, so every row group gets read. Here the bound is applied to
    the RAW int64 nanosecond value before conversion, so parquet
    row-group min/max statistics prune unread data — the difference
    between scanning a day and scanning 100 TB on a time-partitioned
    fact table. For regular (µs) timestamp columns the plain filter
    already pushes down and this degrades to exactly that."""
    from datetime import datetime, timezone

    def _ns(dt: datetime) -> int:
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1_000_000) * 1000

    _force_ltz_timestamps(spark)
    ns_cols = _nanos_timestamp_cols(path) if "://" not in path or path.startswith("file://") else []
    if ts_col not in ns_cols:
        df = read_parquet(spark, path)
        if start is not None:
            df = df.filter(F.col(ts_col) >= F.lit(start))
        if end is not None:
            df = df.filter(F.col(ts_col) < F.lit(end))
        return df

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if start is not None:
        df = df.filter(F.col(ts_col) >= F.lit(_ns(start)))
    if end is not None:
        df = df.filter(F.col(ts_col) < F.lit(_ns(end)))
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
    return df
