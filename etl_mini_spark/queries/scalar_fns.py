from etl_mini_spark.queries._base import *  # noqa: F401,F403
from etl_mini_spark.queries._base import _t, _TMP  # noqa: F401

# Scalar functions (SURVEY §2.7: DQ-27…DQ-31) + UDF registry (DQ-32)
# =========================================================================

@q(
    "time_derive_parts",
    """SELECT event_id,
              strftime(ts, '%Y-%m-%d %H:%M:%S') AS datetime_s,
              CAST(epoch_us(ts) % 1000000 AS BIGINT) AS time_mcs,
              strftime(date_trunc('month', ts), '%Y-%m-%d') AS month_
       FROM events""",
)
def time_derive_parts(spark, sf_dir):
    """DQ-28 (F2): the flagship derived-time columns, all native."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("datetime_s"),
        (F.unix_micros("ts") % 1000000).alias("time_mcs"),
        F.date_format(F.date_trunc("month", "ts"), "yyyy-MM-dd").alias("month_"),
    )


@q(
    "iso_normalize",
    """WITH raw AS (
         SELECT event_id,
                CASE WHEN event_id % 7 = 0
                     THEN substr(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'), 1, 19)
                     ELSE substr(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'), 1, 20 + event_id % 7)
                END AS iso
         FROM events)
       SELECT event_id,
              CASE WHEN strpos(iso, '.') = 0 THEN iso || '.000000'
                   ELSE rpad(iso, 26, '0') END AS iso_norm
       FROM raw""",
)
def iso_normalize(spark, sf_dir):
    """DQ-27 (F1): ISO fractional-second normalization to 6 digits over
    a corpus with 0-6 fraction digits (rounding/clamp cases unit-tested
    in tests/test_time_fns.py)."""
    e = _t(spark, sf_dir, "events")
    full = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    d = F.col("event_id") % 7
    raw = F.when(d == 0, F.substring(full, 1, 19)).otherwise(
        full.substr(F.lit(1), (d + 20).cast("int"))
    )
    return e.select(
        "event_id", normalize_iso_col(raw).alias("iso_norm")
    )


@q(
    "time_tz_trimode",
    """WITH src AS (
         SELECT event_id,
                strftime(ts, '%Y-%m-%dT%H:%M:%S') ||
                  CASE user_id % 3 WHEN 0 THEN 'Z' WHEN 1 THEN '+02:00' ELSE '' END AS iso,
                CASE user_id % 3 WHEN 1 THEN 120 ELSE 0 END AS off_min,
                CASE user_id % 3 WHEN 0 THEN 'Z' WHEN 1 THEN '+02:00' ELSE '' END AS suffix
         FROM events),
       parsed AS (
         SELECT event_id, suffix,
                strptime(CASE WHEN suffix = '' THEN iso
                              ELSE substr(iso, 1, 19) END, '%Y-%m-%dT%H:%M:%S')
                  - to_minutes(off_min) AS utc_ts
         FROM src)
       SELECT event_id,
              strftime(utc_ts, '%Y-%m-%d %H:%M:%S') AS datetime_s,
              strftime(date_trunc('month', utc_ts), '%Y-%m-%d') AS month_,
              (suffix = 'Z') AS offset_ok
       FROM parsed""",
)
def time_tz_trimode(spark, sf_dir):
    """DQ-29 (F2): the reference's timezone-expectation tri-mode
    (time_converter.py:105-120) over an offset-bearing ISO corpus built
    deterministically from events — a third each of 'Z', '+02:00' and
    naive suffixes (user_id % 3). Warning mode attaches ``offset_ok``
    (expected offset 'Z') and the parts extraction converts every
    offset to the UTC instant, so '+02:00' rows land 2 h earlier.
    Error/ignore modes are unit-tested (tests/test_time_fns.py); the
    oracle does the offset arithmetic explicitly (strptime − offset) so
    it is independent of DuckDB's session timezone."""
    from etl_mini_spark.functions.time_fns import check_expected_offset, iso_to_parts_cols

    e = _t(spark, sf_dir, "events")
    m = F.col("user_id") % 3
    suffix = F.when(m == 0, "Z").when(m == 1, "+02:00").otherwise("")
    iso = F.concat(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"), suffix)
    df = e.select("event_id", iso.alias("iso"))
    df = check_expected_offset(df, "iso", "Z", mode="warning")
    parts = iso_to_parts_cols(F.col("iso"))
    return df.select(
        "event_id",
        parts["datetime_s"].alias("datetime_s"),
        parts["month_s"].alias("month_"),
        "offset_ok",
    )


@q(
    "sanitize_values",
    """SELECT doc_id,
              md5(regexp_replace(text || chr(9) || lang, '[' || chr(9) || chr(10) || ']', ' ', 'g')) AS clean_md5,
              (n_chars > 400) AS is_long
       FROM documents""",
)
def sanitize_values(spark, sf_dir):
    """DQ-29 (F3): tab/newline sanitization + over-length flag."""
    d = _t(spark, sf_dir, "documents")
    dirty = F.concat_ws("\t", F.col("text"), F.col("lang"))
    return d.select(
        "doc_id",
        F.md5(sanitize_scalar(dirty)).alias("clean_md5"),
        (F.col("n_chars") > 400).alias("is_long"),
    )


@q(
    "placeholder_extract",
    """SELECT doc_id,
              array_to_string(regexp_extract_all('{' || lang || '} text {' || source || '}',
                                                 '\\{(.*?)\\}', 1), ',') AS placeholders
       FROM documents""",
)
def placeholder_extract(spark, sf_dir):
    """DQ-30 (F5): `{placeholder}` extraction (string_utils.py:5-26)."""
    d = _t(spark, sf_dir, "documents")
    tmpl = F.concat(F.lit("{"), F.col("lang"), F.lit("} text {"), F.col("source"), F.lit("}"))
    return d.select(
        "doc_id",
        F.array_join(F.regexp_extract_all(tmpl, F.lit(r"\{(.*?)\}"), 1), ",").alias("placeholders"),
    )


@q(
    "constant_columns",
    """SELECT p_partkey, 's3' AS source, 'v1' AS version, round(p_retailprice, 2) AS p_retailprice
       FROM part""",
)
def constant_columns(spark, sf_dir):
    """DQ-31 (F7): constant column injection via the additional_fields
    constant mode (tsv_converter.py:149-152)."""
    p = _t(spark, sf_dir, "part")
    specs = [AdditionalField(value="s3", output_fields=["source"]),
             AdditionalField(value="v1", output_fields=["version"])]
    out = apply_additional_fields(p, specs, default_registry())
    return out.select("p_partkey", "source", "version", F.round("p_retailprice", 2).alias("p_retailprice"))


@q(
    "udf_registry_iso_parts",
    """SELECT event_id,
              strftime(ts, '%Y-%m-%d %H:%M:%S') AS dt,
              CAST(epoch_us(ts) % 1000000 AS BIGINT) AS mcs,
              strftime(date_trunc('month', ts), '%Y-%m-%d') AS mon
       FROM events""",
)
def udf_registry_iso_parts(spark, sf_dir):
    """DQ-32 (§2.8): the registered iso_to_parts function applied through
    the closed UDF registry on the *pandas_udf* path (use_native=False) —
    proving the slow path computes exactly what the native rewrite does."""
    e = _t(spark, sf_dir, "events").withColumn(
        "iso", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    )
    spec = AdditionalField(
        value="iso_to_parts",
        input_mapping={"iso": "iso"},
        output_mapping={"datetime": "dt", "microseconds": "mcs", "month": "mon"},
        use_native=False,
    )
    out = apply_additional_fields(e, [spec], default_registry())
    return out.select("event_id", "dt", "mcs", "mon")


# =========================================================================


@q(
    "higher_order_fns",
    """WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS words
                  FROM documents WHERE doc_id < 30)
       SELECT doc_id,
              CAST(len(list_filter(words, x -> length(x) > 4)) AS INT) AS n_long,
              len(list_filter(words, x -> length(x) > 8)) > 0 AS has_very_long,
              len(list_filter(words, x -> length(x) = 0)) = 0 AS all_nonempty,
              CAST(list_sum(list_transform(range(1, len(words) + 1),
                    i -> length(words[CAST(i AS INT)])
                         + length(words[CAST(len(words) + 1 - i AS INT)])))
                   AS BIGINT) AS zip_len_sum
       FROM w""",
)
def higher_order_fns(spark, sf_dir):
    """Higher-order array functions (SURVEY §2.7): filter / exists /
    forall / zip_with — the lambda surface that keeps per-row array
    logic JVM-side instead of falling back to Python UDFs. All
    codegen; no shuffle. The oracle restates exists/forall as
    filter-length predicates and zip_with as an index zip."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    words = TX.tokens(F.col("text"))
    base = d.select("doc_id", words.alias("words"))
    zipped = F.zip_with(
        "words", F.reverse(F.col("words")), lambda a, b: F.length(a) + F.length(b)
    )
    return base.select(
        "doc_id",
        F.size(F.filter("words", lambda x: F.length(x) > 4)).alias("n_long"),
        F.exists("words", lambda x: F.length(x) > 8).alias("has_very_long"),
        F.forall("words", lambda x: F.length(x) > 0).alias("all_nonempty"),
        F.aggregate(zipped, F.lit(0), lambda a, x: a + x).cast("long").alias("zip_len_sum"),
    )


@q(
    "time_trunc_suite",
    """SELECT event_id,
              strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
              strftime(date_trunc('month', ts), '%Y-%m-%d') AS month_start,
              strftime(date_trunc('quarter', ts), '%Y-%m-%d') AS quarter_start,
              strftime(CAST(ts AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus_2mo,
              strftime(last_day(CAST(ts AS DATE)), '%Y-%m-%d') AS month_end
       FROM events WHERE event_id % 100 = 0""",
)
def time_trunc_suite(spark, sf_dir):
    """Calendar bucketing (SURVEY §2.7 date functions): week / month /
    quarter truncation, month arithmetic, last-day — the functions
    behind every calendar rollup. Narrow map; renders as dates so both
    engines agree textually (week truncation is ISO-Monday in both)."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 100 == 0)
    return e.select(
        "event_id",
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week_start"),
        F.date_format(F.date_trunc("month", "ts"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_trunc("quarter", "ts"), "yyyy-MM-dd").alias("quarter_start"),
        F.date_format(F.add_months(F.to_date("ts"), 2), "yyyy-MM-dd").alias("plus_2mo"),
        F.date_format(F.last_day(F.to_date("ts")), "yyyy-MM-dd").alias("month_end"),
    )
