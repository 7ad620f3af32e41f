"""Pure-stdlib Avro Object Container File writer/reader.

The container ships Spark WITHOUT the external spark-avro datasource
module (and without any Python avro package), but Avro remains part of
the declared format breadth (north-star; the reference's ecosystem
exports Avro from Kafka/connect pipelines). The Object Container File
format (Avro spec §"Object Container Files") is small enough to
implement exactly with the stdlib:

- header: magic ``Obj\\x01``, a map<string,bytes> of metadata
  (``avro.schema`` JSON + ``avro.codec``), a 16-byte sync marker;
- data blocks: zigzag-varint record count, byte length, the encoded
  records (optionally deflate-compressed: raw RFC-1951, i.e. zlib
  with wbits=-15), then the sync marker again.
- primitive encoding: zigzag varints for int/long, IEEE little-endian
  for float/double, length-prefixed UTF-8 for string/bytes, one byte
  for boolean, NOTHING for null; nullable columns are the standard
  ``["null", T]`` union (varint branch index before the value).

Supported Spark types: long, int, double, float, string, boolean,
binary, timestamp (logicalType timestamp-micros over long — an
instant), timestamp_ntz (logicalType local-timestamp-micros — a wall
clock, no zone math), date (logicalType date over int) — flat
records, which covers every driver-provided table.

Independence of the implementation is pytest-pinned DIFFERENTIALLY
against the Apache Avro *Java* library already on Spark's classpath
(avro-1.12.1.jar, reached through the py4j gateway): files written by
this codec are decoded by ``org.apache.avro.file.DataFileReader`` and
vice versa (tests/test_avro_io.py). The distributed legs are Spark
native: ``write_avro`` streams one container file per partition from
executors (TaskContext partition id names the part file);
``read_avro`` scans with binaryFile + mapInPandas, so both directions
scale with partition count, not driver memory.
"""

from __future__ import annotations

import io
import json
import re
import struct
import weakref
import zlib
from pathlib import Path

MAGIC = b"Obj\x01"

_SPARK_TO_AVRO = {
    "long": "long",
    "bigint": "long",
    "int": "int",
    "integer": "int",
    "smallint": "int",
    "tinyint": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
}


# --- binary primitives ------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def encode_long(n: int) -> bytes:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_long(buf, pos: int) -> tuple[int, int]:
    shift = z = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(z), pos
        shift += 7


def _encode_bytes(b: bytes) -> bytes:
    return encode_long(len(b)) + b


# --- schema mapping ---------------------------------------------------------


_AVRO_NAME = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def _validate_field_names(spark_schema) -> None:
    """The Avro-spec name checks shared by both write backends:
    duplicate record fields are forbidden, and names must match
    [A-Za-z_][A-Za-z0-9_]* — either way the Apache Java reader would
    reject the file, so fail at write time with one message on BOTH
    the stdlib and the JVM path (r17 advice: the JVM branch used to
    skip this and surface an opaque JVM-side error instead)."""
    names = [f.name for f in spark_schema.fields]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(
            f"avro_io: duplicate column names {dupes} — the Avro spec forbids "
            "duplicate record fields (alias the columns before write_avro)"
        )
    for f in spark_schema.fields:
        if not _AVRO_NAME.match(f.name):
            raise ValueError(
                f"avro_io: column name {f.name!r} is not a valid Avro field "
                "name ([A-Za-z_][A-Za-z0-9_]*) — alias it before write_avro"
            )


def avro_schema_for(spark_schema) -> dict:
    """Spark StructType -> Avro record schema (dict, json.dumps-able).
    Field names are validated against the Avro spec's name rule
    ([A-Za-z_][A-Za-z0-9_]*): a Spark column like ``sum(price)`` would
    otherwise produce a file the Apache Java reader rejects — alias
    such columns before writing. Duplicate column names (legal in
    Spark, e.g. after a join) are rejected too: the Avro spec forbids
    duplicate record fields, so the Java reader would reject the file
    at read time — fail fast at write time instead."""
    _validate_field_names(spark_schema)
    fields = []
    for f in spark_schema.fields:
        t = f.dataType.simpleString()
        if t in _SPARK_TO_AVRO:
            at: object = _SPARK_TO_AVRO[t]
        elif t == "timestamp":
            at = {"type": "long", "logicalType": "timestamp-micros"}
        elif t == "timestamp_ntz":
            # NTZ is a wall clock with no instant — Avro's matching
            # semantic is local-timestamp-micros, NOT timestamp-micros
            at = {"type": "long", "logicalType": "local-timestamp-micros"}
        elif t == "date":
            at = {"type": "int", "logicalType": "date"}
        else:
            raise ValueError(f"avro_io: unsupported Spark type {t!r} for field {f.name!r}")
        fields.append({"name": f.name, "type": ["null", at] if f.nullable else at})
    return {"type": "record", "name": "row", "fields": fields}


def _branch(t):
    """Unwrap the standard nullable union: ["null", T] -> T (the single
    shared helper for schema mapping, coders, and read_avro's
    instant-column detection — keep them from diverging)."""
    if isinstance(t, list):
        return next(x for x in t if x != "null")
    return t


def spark_schema_for(avro_schema: dict) -> str:
    """Avro record schema -> Spark DDL string (inverse of the above)."""
    back = {"long": "long", "int": "int", "double": "double", "float": "float",
            "string": "string", "boolean": "boolean", "bytes": "binary"}
    cols = []
    for f in avro_schema["fields"]:
        t = _branch(f["type"])
        if isinstance(t, dict):
            lt = t.get("logicalType")
            ddl = ("timestamp" if lt == "timestamp-micros"
                   else "timestamp_ntz" if lt == "local-timestamp-micros"
                   else "date" if lt == "date" else back[t["type"]])
        else:
            ddl = back[t]
        cols.append(f"`{f['name']}` {ddl}")
    return ", ".join(cols)


def _field_coders(avro_schema: dict):
    """Per-field (encode, decode) closures resolved ONCE per partition,
    not per value.

    Timestamp semantics (instant-exact on any session timezone):

    - timestamp-micros (Spark TimestampType, an instant): the pickle
      leg (foreachPartition) hands the encoder NAIVE datetimes in the
      OS-local zone (TimestampType.fromInternal uses fromtimestamp),
      so the encoder localizes naive values via .astimezone() before
      the exact-integer UTC conversion — the written long is the true
      epoch-micros instant, what external Kafka/connect consumers
      expect. The decoder returns naive UTC wall time; read_avro
      re-attaches UTC (pandas tz-aware) before handing batches to
      Arrow, so the session-zone conversion is an instant-exact
      tz_convert — never a tz_localize that could resolve a
      DST-ambiguous wall hour to the wrong instant.
    - local-timestamp-micros (Spark TimestampNTZType, a wall clock
      with no instant): encoded/decoded as naive micros verbatim —
      NTZ values reach the encoder as naive UTC-wall datetimes
      (TimestampNTZType.fromInternal), and any zone math here would
      corrupt the wall value."""
    import datetime

    EPOCH = datetime.date(1970, 1, 1)
    UTC = datetime.timezone.utc

    def coders_for(t):
        if isinstance(t, dict):
            lt = t.get("logicalType")
            if lt in ("timestamp-micros", "local-timestamp-micros"):
                # INTEGER arithmetic only: float seconds truncate 1 ulp
                # low for ~1% of microsecond values (e.g.
                # 1987-04-04T00:00:00.000001 -> ...000000)
                EPOCH_AW = datetime.datetime(1970, 1, 1, tzinfo=UTC)
                EPOCH_DT = datetime.datetime(1970, 1, 1)
                US = datetime.timedelta(microseconds=1)
                is_instant = lt == "timestamp-micros"

                def enc(v):
                    if isinstance(v, datetime.datetime):
                        if is_instant:
                            if v.tzinfo is None:
                                # inverse of fromInternal's OS-local naive
                                v = v.astimezone()
                            v = (v.astimezone(UTC) - EPOCH_AW) // US
                        else:
                            # NTZ wall clock: no zone math, ever
                            if v.tzinfo is not None:
                                v = v.replace(tzinfo=None)
                            v = (v - EPOCH_DT) // US
                    return encode_long(int(v))

                def dec(buf, pos):
                    n, pos = decode_long(buf, pos)
                    return EPOCH_DT + n * US, pos

                return enc, dec
            if lt == "date":
                def enc(v):
                    if isinstance(v, datetime.date):
                        v = (v - EPOCH).days
                    return encode_long(int(v))

                def dec(buf, pos):
                    n, pos = decode_long(buf, pos)
                    return EPOCH + datetime.timedelta(days=n), pos

                return enc, dec
            t = t["type"]
        if t in ("long", "int"):
            return (lambda v: encode_long(int(v))), decode_long
        if t == "double":
            def dec(buf, pos):
                return struct.unpack_from("<d", buf, pos)[0], pos + 8

            return (lambda v: struct.pack("<d", float(v))), dec
        if t == "float":
            def dec(buf, pos):
                return struct.unpack_from("<f", buf, pos)[0], pos + 4

            return (lambda v: struct.pack("<f", float(v))), dec
        if t == "string":
            def dec(buf, pos):
                n, pos = decode_long(buf, pos)
                return buf[pos:pos + n].decode("utf-8"), pos + n

            return (lambda v: _encode_bytes(str(v).encode("utf-8"))), dec
        if t == "bytes":
            def dec(buf, pos):
                n, pos = decode_long(buf, pos)
                return bytes(buf[pos:pos + n]), pos + n

            return (lambda v: _encode_bytes(bytes(v))), dec
        if t == "boolean":
            def dec(buf, pos):
                return bool(buf[pos]), pos + 1

            return (lambda v: b"\x01" if v else b"\x00"), dec
        raise ValueError(f"avro_io: unsupported Avro type {t!r}")

    out = []
    for f in avro_schema["fields"]:
        nullable = isinstance(f["type"], list)
        enc, dec = coders_for(_branch(f["type"]))
        out.append((f["name"], nullable, enc, dec))
    return out


# --- container file ---------------------------------------------------------


def _write_container(fh, rows, avro_schema: dict, codec: str, sync: bytes,
                     block_rows: int = 4096) -> int:
    """Stream rows (dict-like / Row) into an open binary file. Returns
    the record count."""
    meta = {
        "avro.schema": json.dumps(avro_schema).encode(),
        "avro.codec": codec.encode(),
    }
    fh.write(MAGIC)
    fh.write(encode_long(len(meta)))
    for k, v in meta.items():
        fh.write(_encode_bytes(k.encode()))
        fh.write(_encode_bytes(v))
    fh.write(encode_long(0))
    fh.write(sync)

    coders = _field_coders(avro_schema)
    n_total = 0
    buf = io.BytesIO()
    n_block = 0

    def flush():
        nonlocal n_block, buf
        if not n_block:
            return
        data = buf.getvalue()
        if codec == "deflate":
            c = zlib.compressobj(9, zlib.DEFLATED, -15)
            data = c.compress(data) + c.flush()
        fh.write(encode_long(n_block))
        fh.write(encode_long(len(data)))
        fh.write(data)
        fh.write(sync)
        buf = io.BytesIO()
        n_block = 0

    for row in rows:
        for name, nullable, enc, _dec in coders:
            v = row[name]
            if nullable:
                if v is None:
                    buf.write(encode_long(0))
                    continue
                buf.write(encode_long(1))
            elif v is None:
                raise ValueError(f"avro_io: NULL in non-nullable field {name!r}")
            buf.write(enc(v))
        n_block += 1
        n_total += 1
        if n_block >= block_rows:
            flush()
    flush()
    return n_total


def _take(data: bytes, pos: int, n: int) -> tuple[bytes, int]:
    """Bounds-checked slice: Python slicing past EOF silently truncates,
    which would hand read_avro's header-probe a short key/value instead
    of the IndexError that triggers its prefix-doubling retry."""
    end = pos + n
    if end > len(data):
        raise IndexError(
            f"avro_io: slice [{pos}:{end}) past end of {len(data)}-byte buffer"
        )
    return data[pos:end], end


def _parse_header(data: bytes) -> tuple[dict, int]:
    """Decode the container header -> (metadata map, position of the
    16-byte sync marker). Handles the spec's negative map-block counts
    (count < 0 is followed by a byte-size long, then |count| pairs).
    Every slice is bounds-checked (_take) so a truncated prefix always
    raises IndexError rather than misparsing."""
    if data[:4] != MAGIC:
        raise ValueError("avro_io: bad magic — not an Avro container file")
    pos = 4
    meta = {}
    while True:
        n, pos = decode_long(data, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _size, pos = decode_long(data, pos)  # spec: byte size follows
        for _ in range(n):
            klen, pos = decode_long(data, pos)
            kb, pos = _take(data, pos, klen)
            k = kb.decode()
            vlen, pos = decode_long(data, pos)
            meta[k], pos = _take(data, pos, vlen)
    return meta, pos


def parse_container(data: bytes):
    """Decode one container file -> (avro_schema dict, list of row
    tuples in field order). Verifies magic and every block's sync
    marker. timestamp-micros fields decode to naive UTC wall times;
    local-timestamp-micros to their naive wall value."""
    meta, pos = _parse_header(data)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = data[pos:pos + 16]
    pos += 16
    coders = _field_coders(schema)
    rows = []
    end = len(data)
    while pos < end:
        n_rec, pos = decode_long(data, pos)
        blen, pos = decode_long(data, pos)
        block = data[pos:pos + blen]
        pos += blen
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        elif codec != "null":
            raise ValueError(f"avro_io: unsupported codec {codec!r}")
        if data[pos:pos + 16] != sync:
            raise ValueError("avro_io: sync marker mismatch — corrupt block")
        pos += 16
        bpos = 0
        for _ in range(n_rec):
            vals = []
            for _name, nullable, _enc, dec in coders:
                if nullable:
                    branch, bpos = decode_long(block, bpos)
                    if branch == 0:
                        vals.append(None)
                        continue
                v, bpos = dec(block, bpos)
                vals.append(v)
            rows.append(tuple(vals))
    return schema, rows


# --- Spark-facing API -------------------------------------------------------

# session-scoped probe cache keyed on the live Python session object
# (a WeakKeyDictionary, NOT an id()-keyed dict: CPython reuses
# addresses after GC, so an id key could serve one session's probe
# result to a different session with a different classpath)
_SPARK_AVRO_PROBE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def spark_avro_available(spark) -> bool:
    """True when the JVM ``spark-avro`` data source is on the
    classpath (real clusters ship it; this container does not). The
    pure-Python codec below is a container workaround with a ~100x
    worse per-core constant (SCALE_r16: ~10.8/17.4 MB/s aggregate
    write/read on 32 cores) — at a 100 TB target the JVM reader/writer
    must take over whenever it exists, so the public entry points
    probe once per session and branch.

    Only a missing data source maps to False; any OTHER probe failure
    propagates (a broad except would let an internal-API move in a
    future Spark silently route a jar-equipped cluster onto the slow
    codec forever). Spark Connect sessions have no py4j gateway to
    probe — they return False, and the stdlib legs then only work when
    the client and the executors share a filesystem (write_avro's
    driver-side mkdir/unlink and read_avro's header glob run on the
    CLIENT); on a remote Connect cluster force ``backend='jvm'`` and
    ship the jar."""
    jss = getattr(spark, "_jsparkSession", None)
    jvm = getattr(spark, "_jvm", None)
    if jss is None or jvm is None:
        return False
    try:
        return _SPARK_AVRO_PROBE[spark]
    except (KeyError, TypeError):
        pass
    try:
        # the EXACT lookup DataFrameReader/Writer perform — a bare
        # Class.forName is wrong here: pyspark's distribution ships
        # some org.apache.spark.sql.avro classes (the from_avro/
        # to_avro function surface) without registering the data
        # source, so only the ServiceLoader-backed lookup tells the
        # truth
        jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", jss.sessionState().conf()
        )
        avail = True
    except Exception as e:
        # Py4JJavaError.__str__ does another gateway round-trip for the
        # Java stack trace and can itself raise if the connection just
        # died — fall back to the construction-time errmsg attribute so
        # the classification never masks the original error
        try:
            msg = str(e)
        except Exception:
            msg = str(getattr(e, "errmsg", ""))
        if "Failed to find data source" in msg or "DATA_SOURCE_NOT_FOUND" in msg:
            avail = False
        else:
            raise
    try:
        _SPARK_AVRO_PROBE[spark] = avail
    except TypeError:
        pass  # un-weakref-able session: probe again next call
    return avail


def _resolve_backend(spark, backend: str) -> str:
    """'auto' -> 'jvm' when spark-avro is on the classpath else
    'stdlib'; explicit 'jvm'/'stdlib' pass through (a forced 'jvm'
    without the jar fails loudly at load/save, never silently
    degrades). Factored out so the routing rule is unit-testable
    without executing either backend."""
    if backend == "auto":
        return "jvm" if spark_avro_available(spark) else "stdlib"
    if backend not in ("jvm", "stdlib"):
        raise ValueError(f"avro_io: unknown backend {backend!r}")
    return backend


def write_avro(df, path: str, codec: str = "deflate", block_rows: int = 4096,
               backend: str = "auto") -> None:
    """Distributed Avro export. With the JVM ``spark-avro`` jar on the
    classpath (backend='auto' resolves to 'jvm') this is a plain
    ``df.write.format('avro')`` — the path any real cluster should
    take. Otherwise each partition streams its rows into
    ``<path>/part-<pid>.avro`` from the executor via the pure-stdlib
    codec (no driver materialization). The stdlib sync marker is
    derived deterministically from (path, partition id) so re-runs are
    byte-stable.

    Overwrite semantics differ by backend: the JVM branch is Spark's
    ``mode('overwrite')`` (replaces the WHOLE directory, sidecar files
    included); the stdlib branch unlinks only ``*.avro`` part files.
    Treat the target as an Avro-only directory — don't co-locate other
    artifacts in it. ``block_rows`` applies only to the stdlib backend
    (the JVM writer manages its own sync-block sizing); both backends
    run the same field-name/duplicate validation first, so an invalid
    frame fails with one message either way instead of surfacing a
    JVM-side error only on clusters with the jar. The full type
    mapping stays stdlib-only — the JVM writer legitimately supports
    nested types the stdlib codec does not."""
    import hashlib

    if _resolve_backend(df.sparkSession, backend) == "jvm":
        _validate_field_names(df.schema)
        (df.write.mode("overwrite").format("avro")
           .option("compression", "uncompressed" if codec == "null" else codec)
           .save(path))
        return
    # the stdlib branch validates via avro_schema_for (same helper,
    # same messages) — no need to run the name checks twice
    schema = avro_schema_for(df.schema)
    cols = df.columns
    Path(path).mkdir(parents=True, exist_ok=True)
    # overwrite semantics: a prior run with MORE partitions must not
    # leave stale part files for read_avro's glob to double-count
    for stale in Path(path).glob("*.avro"):
        stale.unlink()

    def sink(rows):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        sync = hashlib.md5(f"{path}:{pid}".encode()).digest()
        out = Path(path) / f"part-{pid:05d}.avro"
        with open(out, "wb") as fh:
            _write_container(fh, ({c: r[c] for c in cols} for r in rows),
                             schema, codec, sync, block_rows)

    df.foreachPartition(sink)


def read_avro(spark, path: str, backend: str = "auto"):
    """Distributed Avro scan. With the JVM ``spark-avro`` jar present
    (backend='auto' resolves to 'jvm') this is a plain
    ``spark.read.format('avro')`` — both backends read each other's
    containers (the stdlib codec is spec-compliant OCF). Otherwise
    binaryFile lists + reads the container files across executors and
    mapInPandas decodes each file with the pure-Python codec; the
    schema comes from the first file's header (driver reads ~1 KB,
    not the data)."""
    import pandas as pd

    if _resolve_backend(spark, backend) == "jvm":
        # string join, NOT pathlib: Path('s3a://bucket/dir') collapses
        # the scheme's '//' and would break the exact remote-cluster
        # case this branch exists for
        return spark.read.format("avro").load(path.rstrip("/") + "/*.avro")
    files = sorted(Path(path).glob("*.avro"))
    if not files:
        raise FileNotFoundError(f"avro_io: no .avro files under {path}")
    # the header is almost always < 64 KB; double the prefix until the
    # metadata map parses (wide third-party schemas) or the file ends
    size = 65536
    fsize = files[0].stat().st_size
    while True:
        with open(files[0], "rb") as fh:
            head = fh.read(size)
        try:
            meta, _pos = _parse_header(head)
            break
        except IndexError:
            if size >= fsize:
                raise ValueError(
                    f"avro_io: unterminated header metadata in {files[0]}"
                ) from None
            size *= 2
    schema = json.loads(meta["avro.schema"])
    ddl = spark_schema_for(schema)
    names = [f["name"] for f in schema["fields"]]

    def _lt(f):
        t = _branch(f["type"])
        return t.get("logicalType") if isinstance(t, dict) else None

    # instant fields decode as naive UTC wall; re-attach UTC before
    # Arrow so the session-zone step is an instant-exact tz_convert,
    # never a tz_localize (which resolves DST-ambiguous wall hours to
    # an arbitrary side). Per-object replace(tzinfo=UTC), NOT
    # pd.to_datetime(utc=True): the datetime64[ns] path would narrow
    # the readable range to 1677..2262 and crash on instants (year
    # 2500, year 1) the µs codec round-trips losslessly. NTZ fields
    # stay naive — they ARE wall clocks.
    instant_cols = [f["name"] for f in schema["fields"]
                    if _lt(f) == "timestamp-micros"]

    def decode(batches):
        import datetime

        UTC = datetime.timezone.utc
        for pdf in batches:
            for _p, content in zip(pdf["path"], pdf["content"]):
                _schema, rows = parse_container(bytes(content))
                out = pd.DataFrame(rows, columns=names)
                for c in instant_cols:
                    out[c] = out[c].map(
                        lambda v: v.replace(tzinfo=UTC)
                        if isinstance(v, datetime.datetime) else v
                    )
                yield out

    binf = spark.read.format("binaryFile").load(path.rstrip("/") + "/*.avro")
    return binf.select("path", "content").mapInPandas(decode, schema=ddl)
