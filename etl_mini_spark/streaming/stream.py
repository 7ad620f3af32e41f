"""Structured-Streaming wiring: sources, foreachBatch sinks, and a
run-to-completion helper for incremental batch (Trigger.AvailableNow).

The reference's batch loop (extract scroll batch → transform → COPY →
repeat, internal_raw_to_dwh/standard_pipeline.py:92-113) is exactly
``readStream → foreachBatch(sink)``: micro-batches replace scroll
pages, the checkpoint dir replaces the metadata table's high-water
mark, and restart-safety comes from Spark's offset log instead of
hand-rolled window arithmetic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from etl_mini_spark.operators.upsert import upsert_parquet


def _ltz_type(dt: T.DataType) -> T.DataType:
    """Rewrite TIMESTAMP_NTZ → TIMESTAMP (LTZ) at ANY nesting depth —
    top-level fields, struct members, array elements, map keys/values.
    A top-level-only rewrite would let an NTZ event-time column nested
    inside a struct slip through and break watermarks/window()."""
    if isinstance(dt, T.TimestampNTZType):
        return T.TimestampType()
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _ltz_type(f.dataType), f.nullable, f.metadata)
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_ltz_type(dt.elementType), dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(_ltz_type(dt.keyType), _ltz_type(dt.valueType), dt.valueContainsNull)
    return dt


def read_stream_parquet(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """File-source stream over a parquet directory (new files become
    micro-batches). Schema is mandatory for streaming file sources.
    ``options`` pass through to the reader — e.g.
    ``{"maxFilesPerTrigger": "1"}`` to force one file per micro-batch
    (the lever that makes watermark ADVANCEMENT between batches, and
    therefore late-row dropping, observable on a bounded replay).

    TIMESTAMP_NTZ fields in a probed schema are rewritten to TIMESTAMP
    (LTZ) recursively (see ``_ltz_type``): naive-parquet testdata probed
    through a default-conf session yields NTZ, which watermarks/
    `window()` reject; with the session tz pinned UTC the LTZ read is
    value-identical (sources/readers.py)."""
    from etl_mini_spark.sources.readers import _force_ltz_timestamps

    with _force_ltz_timestamps(spark):
        schema = _ltz_type(schema)
        reader = spark.readStream.schema(schema)
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        return reader.parquet(path)


def read_stream_ndjson(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.readStream.schema(schema).json(path)


def foreach_batch_upsert(target_path: str, keys: list[str]) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink: keyed upsert per micro-batch. Combined with
    the streaming checkpoint this is effectively exactly-once: a
    replayed batch upserts the same keys idempotently."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_parquet(batch_df.sparkSession, target_path, batch_df, keys=keys)

    return sink


def run_to_completion(
    df: DataFrame,
    checkpoint_dir: str,
    sink: Callable[[DataFrame, int], None] | None = None,
    output_path: str | None = None,
    output_mode: str = "append",
    timeout_s: int = 300,
) -> None:
    """Process everything currently available, then stop
    (Trigger.AvailableNow) — incremental batch with streaming
    restart-safety. Either a foreachBatch ``sink`` or a parquet
    ``output_path``."""
    writer = df.writeStream.option("checkpointLocation", checkpoint_dir).trigger(availableNow=True)
    if sink is not None:
        q = writer.foreachBatch(sink).outputMode(output_mode).start()
    else:
        q = writer.format("parquet").option("path", output_path).outputMode(output_mode).start()
    try:
        q.awaitTermination(timeout_s)
    finally:
        if q.isActive:
            q.stop()
