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
            if ts is None:
                return None
            return int(ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
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
