"""Differential pins for the pure-stdlib Avro container codec
(etl_mini_spark/sources/avro_io.py). The independent reference
implementation is the Apache Avro JAVA library already on Spark's
classpath (avro-1.12.1.jar, driven through the py4j gateway): files we
write must decode identically there, and files IT writes must decode
identically here — both codecs ("null" and "deflate"). The distributed
legs (foreachPartition write, binaryFile + mapInPandas read) round-trip
a multi-partition DataFrame with NULLs, unicode, timestamps, and an
empty partition."""

from __future__ import annotations

import datetime
import glob
import json
import os

import pytest


ROWS = [
    (1, "héllo wörld", 1.5, True, datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)),
    (2, None, None, False, None),
    (3, "", -0.0, True, datetime.datetime(1969, 12, 31, 23, 59, 59, 999999)),
]
DDL = "id long, name string, v double, flag boolean, ts timestamp"


def _df(spark):
    return spark.createDataFrame(ROWS, DDL)


def test_python_write_java_read_differential(spark, tmp_path):
    """Files written by the Python codec decode EXACTLY in the Apache
    Avro Java reader — both codecs. Timestamps compare as raw
    timestamp-micros longs (GenericDatumReader without logical-type
    conversions renders the underlying long)."""
    from etl_mini_spark.sources.avro_io import write_avro

    jvm = spark._jvm
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"py_{codec}")
        write_avro(_df(spark).coalesce(1), p, codec=codec)
        f = max(glob.glob(p + "/*.avro"), key=os.path.getsize)
        rdr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(f), jvm.org.apache.avro.generic.GenericDatumReader()
        )
        got = []
        while rdr.hasNext():
            got.append(json.loads(str(rdr.next())))
        rdr.close()
        def us(ts):
            # same exact-integer op sequence as the writer (no float
            # timestamp(): it can round 1µs off for some values): the
            # naive fixture literal is what Spark's pickle leg hands
            # the encoder, which localizes via .astimezone() and takes
            # integer micros from the aware UTC epoch.
            if ts is None:
                return None
            epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
            return (ts.astimezone().astimezone(datetime.timezone.utc) - epoch) \
                // datetime.timedelta(microseconds=1)
        want = [
            {"id": r[0], "name": r[1], "v": r[2], "flag": r[3], "ts": us(r[4])}
            for r in ROWS
        ]
        assert sorted(got, key=lambda d: d["id"]) == want, codec


def test_java_write_python_read_differential(spark, tmp_path):
    """Files written by the Apache Avro JAVA DataFileWriter (deflate)
    decode exactly in the Python codec via the distributed read path."""
    from etl_mini_spark.sources.avro_io import read_avro

    jvm = spark._jvm
    schema_json = json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": ["null", "string"]},
                {"name": "v", "type": ["null", "double"]},
            ],
        }
    )
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    d = tmp_path / "java_written"
    d.mkdir()
    f = jvm.java.io.File(str(d / "part-00000.avro"))
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    w.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    w.create(schema, f)
    for rid, name, v in [(10, "ä", 2.25), (11, None, None)]:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", rid)
        rec.put("name", name)
        rec.put("v", v)
        w.append(rec)
    w.close()

    back = read_avro(spark, str(d))
    assert back.schema.simpleString() == "struct<id:bigint,name:string,v:double>"
    assert sorted(tuple(r) for r in back.collect()) == [(10, "ä", 2.25), (11, None, None)]


def test_distributed_roundtrip_with_empty_partition(spark, tmp_path):
    from etl_mini_spark.sources.avro_io import read_avro, write_avro

    df = _df(spark).repartition(5)  # 3 rows over 5 partitions -> empties
    p = str(tmp_path / "dist")
    write_avro(df, p, codec="deflate")
    assert len(glob.glob(p + "/*.avro")) == 5  # one container per partition
    back = read_avro(spark, p)
    assert sorted(tuple(r) for r in back.collect()) == sorted(tuple(r) for r in df.collect())


def test_corrupt_sync_marker_raises(spark, tmp_path):
    from etl_mini_spark.sources.avro_io import parse_container, write_avro

    p = str(tmp_path / "c")
    write_avro(_df(spark).coalesce(1), p, codec="null")
    f = max(glob.glob(p + "/*.avro"), key=os.path.getsize)
    data = bytearray(open(f, "rb").read())
    data[-1] ^= 0xFF  # flip one byte of the trailing sync marker
    with pytest.raises(ValueError, match="sync marker"):
        parse_container(bytes(data))


def test_timestamp_micros_integer_exact(spark, tmp_path):
    """Float-seconds encoding truncated 1 µs low for ~1% of values
    (e.g. 1987-04-04T00:00:00.000001); the integer path must
    round-trip every microsecond exactly."""
    from etl_mini_spark.sources.avro_io import read_avro, write_avro

    cases = [
        datetime.datetime(1987, 4, 4, 0, 0, 0, 1),
        datetime.datetime(2024, 2, 29, 23, 59, 59, 999999),
        datetime.datetime(1969, 7, 20, 20, 17, 0, 1),
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(cases)], "i long, ts timestamp")
    p = str(tmp_path / "us")
    write_avro(df, p)
    got = {r["i"]: r["ts"] for r in read_avro(spark, p).collect()}
    assert got == {i: t for i, t in enumerate(cases)}


def test_write_avro_overwrites_stale_parts(spark, tmp_path):
    """A re-run with fewer partitions must not leave stale part files
    for read_avro to double-count."""
    from etl_mini_spark.sources.avro_io import read_avro, write_avro

    p = str(tmp_path / "ow")
    write_avro(_df(spark).repartition(4), p)
    write_avro(_df(spark).coalesce(1), p)
    assert len(glob.glob(p + "/*.avro")) == 1
    assert read_avro(spark, p).count() == len(ROWS)


def test_invalid_avro_field_name_raises(spark):
    """Avro's name rule is [A-Za-z_][A-Za-z0-9_]*: a column like
    'sum(price)' must fail at schema time, not produce a file the
    Apache Java reader rejects."""
    from etl_mini_spark.sources.avro_io import avro_schema_for

    bad = spark.range(1).selectExpr("sum(id)").schema
    with pytest.raises(ValueError, match="not a valid Avro field name"):
        avro_schema_for(bad)
    ok = spark.range(1).selectExpr("sum(id) AS sum_id").schema
    assert avro_schema_for(ok)["fields"][0]["name"] == "sum_id"


def test_truncated_header_prefix_always_raises_indexerror(spark, tmp_path):
    """Every proper prefix of the header must raise (IndexError ->
    read_avro's doubling retry) — never silently misparse with a
    truncated metadata slice (Python slicing past EOF is lenient)."""
    from etl_mini_spark.sources.avro_io import _parse_header, write_avro

    p = str(tmp_path / "tr")
    write_avro(_df(spark).coalesce(1), p, codec="deflate")
    f = max(glob.glob(p + "/*.avro"), key=os.path.getsize)
    data = open(f, "rb").read()
    _meta, sync_pos = _parse_header(data)
    full, _ = _parse_header(data[:sync_pos])
    assert "avro.schema" in full
    for cut in range(5, sync_pos):
        try:
            meta, _pos = _parse_header(data[:cut])
        except IndexError:
            continue  # the retry path — correct for a truncated prefix
        # a shorter prefix may legitimately parse ONLY if it yields the
        # complete, untruncated metadata map (terminator reached early
        # is impossible here, but equality is the invariant that matters)
        assert meta == full, f"misparse at prefix {cut}"


def test_timestamp_instant_preserved_on_non_utc_session(spark, tmp_path):
    """The written timestamp-micros long is the true instant (epoch
    micros), and the distributed re-read returns the identical wall
    time, under a NON-UTC session timezone (the ADVICE interop case:
    external Kafka/connect consumers read the raw long)."""
    from etl_mini_spark.sources.avro_io import parse_container, write_avro, read_avro

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # one arrow-built timestamp: 2024-06-01 12:00:00 New York wall
        df = spark.sql(
            "SELECT CAST(1 AS LONG) AS i, timestamp'2024-06-01 12:00:00' AS ts"
        )
        p = str(tmp_path / "tz")
        write_avro(df.coalesce(1), p, codec="null")
        f = max(glob.glob(p + "/*.avro"), key=os.path.getsize)
        _schema, rows = parse_container(open(f, "rb").read())
        # EDT is UTC-4: the instant is 16:00 UTC — what the raw long holds
        assert rows[0][1] == datetime.datetime(2024, 6, 1, 16, 0, 0)
        # and the distributed re-read preserves the instant: identical
        # to the original under the same collect path (collect renders
        # naive wall times in the OS zone regardless of session tz)
        assert read_avro(spark, p).collect()[0]["ts"] == df.collect()[0]["ts"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_ntz_wall_clock_roundtrip_no_zone_math(spark, tmp_path):
    """timestamp_ntz is a wall clock: it maps to Avro
    local-timestamp-micros and the raw long must be the naive wall
    micros VERBATIM — no OS/session zone may leak in (the review
    regression case: the instant-path localization corrupting NTZ)."""
    from etl_mini_spark.sources.avro_io import parse_container, read_avro, write_avro

    wall = datetime.datetime(2024, 6, 1, 12, 0, 0, 654321)
    df = spark.createDataFrame([(1, wall)], "i long, ts timestamp_ntz")
    p = str(tmp_path / "ntz")
    write_avro(df.coalesce(1), p, codec="null")
    f = max(glob.glob(p + "/*.avro"), key=os.path.getsize)
    schema, rows = parse_container(open(f, "rb").read())
    fld = next(x for x in schema["fields"][1]["type"] if x != "null")
    assert fld["logicalType"] == "local-timestamp-micros"
    assert rows[0][1] == wall  # decoded naive wall, exact
    back = read_avro(spark, p)
    assert back.schema.simpleString() == "struct<i:bigint,ts:timestamp_ntz>"
    assert back.collect()[0]["ts"] == wall
    # and the same wall value survives under a non-UTC session zone
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        assert read_avro(spark, p).collect()[0]["ts"] == wall
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_timestamp_dst_ambiguous_hour_instant_exact(spark, tmp_path):
    """Both instants of a DST fall-back wall hour must survive the
    round-trip distinctly: 2024-11-03 05:30Z and 06:30Z are BOTH
    01:30 America/New_York wall time, so a decoder that localizes a
    naive session wall time would collapse or shift one of them (the
    review finding); the tz-aware UTC read leg must not."""
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        from etl_mini_spark.sources.avro_io import parse_container, read_avro, write_avro

        from pyspark.sql import functions as F

        df = spark.sql(
            "SELECT 1 AS i, to_timestamp('2024-11-03 09:30:00 UTC') AS ts "
            "UNION ALL "
            "SELECT 2 AS i, to_timestamp('2024-11-03 10:30:00 UTC') AS ts"
        ).withColumn("us", F.unix_micros("ts"))
        want_us = {r["i"]: r["us"] for r in df.collect()}
        assert want_us[2] - want_us[1] == 3_600_000_000  # distinct instants
        p = str(tmp_path / "dst")
        write_avro(df.select("i", "ts").coalesce(1), p, codec="null")
        f = max(glob.glob(p + "/*.avro"), key=os.path.getsize)
        _schema, rows = parse_container(open(f, "rb").read())
        epoch = datetime.datetime(1970, 1, 1)
        raw = {r[0]: (r[1] - epoch) // datetime.timedelta(microseconds=1) for r in rows}
        assert raw == want_us  # written longs are the true instants
        got = {r["i"]: r["us"] for r in
               read_avro(spark, p).withColumn("us", F.unix_micros("ts")).collect()}
        assert got == want_us  # re-read instants identical, not collapsed
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_timestamp_outside_pandas_ns_range_roundtrips(spark, tmp_path):
    """Spark timestamps span years 1..9999 at µs precision; the read
    leg must not funnel them through datetime64[ns] (bounds
    1677..2262). Year-2500 and year-1600 instants round-trip exactly
    (the review regression: pd.to_datetime(utc=True) raised
    OutOfBoundsDatetime in the mapInPandas worker)."""
    from etl_mini_spark.sources.avro_io import read_avro, write_avro

    cases = [
        datetime.datetime(2500, 6, 1, 12, 0, 0, 123456),
        datetime.datetime(1600, 1, 2, 3, 4, 5, 654321),
        datetime.datetime(2024, 1, 1),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "i long, ts timestamp"
    )
    p = str(tmp_path / "far")
    write_avro(df, p, codec="null")
    got = {r["i"]: r["ts"] for r in read_avro(spark, p).collect()}
    assert got == {i: t for i, t in enumerate(cases)}


def test_duplicate_column_names_raise_at_write_time(spark):
    """The Avro spec forbids duplicate record fields; Spark allows
    duplicate column names (e.g. after a join). The schema mapper must
    fail fast at write time instead of producing a file the Java
    reader rejects at read time (r16 advice)."""
    from etl_mini_spark.sources.avro_io import avro_schema_for

    df = _df(spark).select("id", "name").join(
        _df(spark).select("id", "name"), on="id"
    )
    assert df.columns.count("name") == 2  # the hazard is real
    with pytest.raises(ValueError, match="duplicate column names.*'name'"):
        avro_schema_for(df.schema)


def test_backend_routing_prefers_jvm_when_available(spark, monkeypatch):
    """backend='auto' must resolve to the JVM spark-avro data source
    whenever the jar is on the classpath (real clusters) and to the
    stdlib codec otherwise (this container) — the pure-Python constant
    factor is a workaround, not the 100 TB path (r16 verdict)."""
    from etl_mini_spark.sources import avro_io

    # auto must follow whatever the classpath probe actually says —
    # environments that legitimately ship the spark-avro jar resolve
    # to 'jvm' (r17 advice: don't hard-assert the jar is ABSENT, that
    # is a container fact, not a routing contract)
    jar_present = avro_io.spark_avro_available(spark)
    assert avro_io._resolve_backend(spark, "auto") == (
        "jvm" if jar_present else "stdlib"
    )
    # with the jar present (simulated), auto routes to the JVM source
    monkeypatch.setattr(avro_io, "spark_avro_available", lambda s: True)
    assert avro_io._resolve_backend(spark, "auto") == "jvm"
    # explicit backends pass through regardless of availability
    assert avro_io._resolve_backend(spark, "stdlib") == "stdlib"
    assert avro_io._resolve_backend(spark, "jvm") == "jvm"
    with pytest.raises(ValueError, match="unknown backend"):
        avro_io._resolve_backend(spark, "arrow")


def test_forced_jvm_backend_fails_loudly_without_jar(spark, tmp_path):
    """A forced backend='jvm' in a jar-less environment must raise
    Spark's missing-data-source error at the action, never silently
    degrade to the stdlib codec. (Skipped where the jar legitimately
    exists — there the forced path simply works; the routing contract
    is covered unconditionally above.)"""
    from etl_mini_spark.sources.avro_io import (read_avro, spark_avro_available,
                                                write_avro)

    if spark_avro_available(spark):
        pytest.skip("spark-avro jar on classpath: forced 'jvm' is valid here")
    with pytest.raises(Exception, match="[Aa]vro"):
        write_avro(_df(spark), str(tmp_path / "j"), backend="jvm")
    with pytest.raises(Exception, match="[Aa]vro"):
        read_avro(spark, str(tmp_path / "j"), backend="jvm").collect()


def test_write_validation_parity_across_backends(spark, monkeypatch, tmp_path):
    """Both write backends must reject duplicate / non-Avro field
    names with the SAME fail-fast message (r17 advice: the JVM branch
    used to skip validation and surface a JVM-side error instead).
    The JVM branch is simulated via the backend resolver so the check
    proves the validation fires BEFORE any JVM write is attempted."""
    from pyspark.sql import functions as F

    from etl_mini_spark.sources import avro_io

    dup = _df(spark).select("id", "name").join(
        _df(spark).select("id", "name"), on="id"
    )
    bad_name = _df(spark).select(F.sum("id"))  # column named 'sum(id)'
    for backend_resolved in ("stdlib", "jvm"):
        monkeypatch.setattr(
            avro_io, "_resolve_backend", lambda s, b, _r=backend_resolved: _r
        )
        with pytest.raises(ValueError, match="duplicate column names.*'name'"):
            avro_io.write_avro(dup, str(tmp_path / "d"), backend="auto")
        with pytest.raises(ValueError, match="not a valid Avro field name"):
            avro_io.write_avro(bad_name, str(tmp_path / "b"), backend="auto")


class _FakeLookup:
    """Minimal py4j-shaped stub: fake_spark._jvm.org.apache.spark.sql
    .execution.datasources.DataSource.lookupDataSource(...) hits
    `fn`."""

    def __init__(self, fn):
        self.calls = 0
        self._fn = fn

    def __getattr__(self, name):
        if name == "lookupDataSource":
            def _call(*a):
                self.calls += 1
                return self._fn()
            return _call
        return self


class _FakeSpark:
    def __init__(self, fn):
        self._jvm = _FakeLookup(fn)
        self._jsparkSession = self  # anything non-None with sessionState()

    def sessionState(self):
        return self

    def conf(self):
        return None


def test_probe_connect_session_returns_false():
    """A session without a py4j gateway (Spark Connect) cannot be
    probed — 'auto' must fall back to the Connect-compatible stdlib
    legs instead of crashing on a missing _jsparkSession attribute."""
    from etl_mini_spark.sources.avro_io import spark_avro_available

    class _Connect:  # no _jsparkSession / _jvm at all
        pass

    assert spark_avro_available(_Connect()) is False


def test_probe_only_missing_data_source_maps_to_false():
    """Only the missing-data-source error means 'jar absent'; any
    other probe failure (internal API moved, gateway glitch) must
    propagate — a broad except would silently park a jar-equipped
    cluster on the ~100x-slower stdlib codec."""
    from etl_mini_spark.sources.avro_io import spark_avro_available

    def _missing():
        raise RuntimeError(
            "[DATA_SOURCE_NOT_FOUND] Failed to find data source: avro.")

    def _broken():
        raise RuntimeError("py4j gateway exploded")

    assert spark_avro_available(_FakeSpark(_missing)) is False
    with pytest.raises(RuntimeError, match="exploded"):
        spark_avro_available(_FakeSpark(_broken))


def test_probe_caches_per_session_object():
    """The probe runs once per live session object (WeakKeyDictionary
    — keyed on the object, not id(), so address reuse after GC cannot
    leak a stale result across sessions)."""
    from etl_mini_spark.sources.avro_io import spark_avro_available

    fake = _FakeSpark(lambda: None)  # lookup succeeds -> available
    assert spark_avro_available(fake) is True
    assert spark_avro_available(fake) is True
    assert fake._jvm.calls == 1
