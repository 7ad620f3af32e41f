"""Round-5 batch 3: modern ANSI-SQL surface the engine supports via
Spark 4 — recursive CTEs, correlated LATERAL subqueries, ordered
LISTAGG, the VARIANT semi-structured type, per-expression collations,
and try_* safe arithmetic. Each runs as SQL (or the DataFrame twin
where syntax diverges) with a DuckDB oracle on identical parquet.

These land in the registry TAIL (window full this round; rotate next).
"""

from etl_mini_spark.queries._base import *  # noqa: F401,F403
from etl_mini_spark.queries._base import _t  # noqa: F401

# =========================================================================
# recursive CTE — identical string runs on both engines
# =========================================================================

_RECURSIVE_SQL = """
    WITH RECURSIVE buckets(b) AS (
        SELECT 0
      UNION ALL
        SELECT b + 1 FROM buckets WHERE b < 9
    )
    SELECT b, CAST(count(value) AS BIGINT) AS n,
           round(coalesce(sum(value), 0), 2) AS sum_value
    FROM buckets LEFT JOIN events
      ON CAST(floor(value / 35) AS BIGINT) = b AND value >= 0
    GROUP BY b
"""


@q("sql_recursive_series", _RECURSIVE_SQL)
def sql_recursive_series(spark, sf_dir):
    """Recursive CTE (Spark 4 WITH RECURSIVE): a recursively generated
    bucket series LEFT-joined to bucketed event values — zero-filled
    buckets survive, which a plain GROUP BY over the fact cannot give.
    The identical SQL string runs on DuckDB; the recursion is driver-
    tiny (10 rows) while the fact side stays distributed."""
    from etl_mini_spark.session import register_tables

    register_tables(spark, sf_dir, ["events"])
    return spark.sql(_RECURSIVE_SQL)


# =========================================================================
# correlated LATERAL subquery with per-row top-k
# =========================================================================

_LATERAL_SQL = """
    SELECT r_name, l.n_name, l.cnt FROM region, LATERAL (
        SELECT n_name, CAST(count(*) AS BIGINT) AS cnt
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        WHERE n_regionkey = r_regionkey
        GROUP BY n_name ORDER BY cnt DESC, n_name LIMIT 2) l
"""


@q("sql_lateral_topn", _LATERAL_SQL)
def sql_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery: top-2 nations by customer count per
    region. Catalyst decorrelates the lateral into a ranked join (no
    per-region re-execution) — the same rewrite the window-function
    formulation would produce, but expressed in portable ANSI LATERAL
    syntax. Fully tie-broken LIMIT → deterministic."""
    from etl_mini_spark.session import register_tables

    register_tables(spark, sf_dir, ["region", "nation", "customer"])
    return spark.sql(_LATERAL_SQL)


# =========================================================================
# ordered LISTAGG / string aggregation
# =========================================================================

_LISTAGG_ORACLE = """
    SELECT date_trunc('day', ts) AS d,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
    FROM events GROUP BY d
"""


@q("listagg_sorted", _LISTAGG_ORACLE)
def listagg_sorted(spark, sf_dir):
    """Deterministic ordered string aggregation: the distinct event
    types seen per day as a sorted CSV (Spark 4 has LISTAGG ... WITHIN
    GROUP; the DataFrame twin collect_set → array_sort → array_join is
    used here because DISTINCT+ORDER semantics are explicit and the
    collect_set stays bounded at the types-per-day cardinality, not the
    row count)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(
            F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types")
        )
    )


# =========================================================================
# VARIANT semi-structured type
# =========================================================================

_VARIANT_ORACLE = """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY k
"""


@q("variant_shred_extract", _VARIANT_ORACLE)
def variant_shred_extract(spark, sf_dir):
    """Spark 4 VARIANT: parse the JSON payload once into the binary
    semi-structured type, then typed-path extraction — at scale VARIANT
    beats repeated get_json_object because the parse happens once and
    the encoding is column-shreddable. Oracle extracts the same path
    with DuckDB's JSON functions."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k")
        )
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )


# =========================================================================
# per-expression collation
# =========================================================================

_COLLATION_ORACLE = """
    WITH v AS (SELECT lang,
                      CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END AS t
               FROM documents)
    SELECT lang, CAST(count(DISTINCT lower(t)) AS BIGINT) AS n_ci,
           CAST(count(DISTINCT t) AS BIGINT) AS n_cs
    FROM v GROUP BY lang
"""


@q("collation_distinct", _COLLATION_ORACLE)
def collation_distinct(spark, sf_dir):
    """Per-expression collation (Spark 4): case-insensitive vs binary
    distinct counts over a deterministically case-perturbed corpus
    (every 7th doc uppercased, so the two counts must differ). The
    UTF8_LCASE collation pushes case folding into the comparator —
    no lower() copy of the column materializes. Oracle folds with
    lower() (equivalent for this ASCII corpus)."""
    d = _t(spark, sf_dir, "documents")
    t = F.when(F.col("doc_id") % 7 == 0, F.upper("text")).otherwise(F.col("text"))
    return (
        d.select("lang", t.alias("t"))
        .groupBy("lang")
        .agg(
            F.countDistinct(F.expr("t COLLATE UTF8_LCASE")).alias("n_ci"),
            F.countDistinct("t").alias("n_cs"),
        )
    )


# =========================================================================
# try_* safe arithmetic (ANSI mode without the blast radius)
# =========================================================================

# Rounding is pinned as floor(x*1e6 + 0.5)/1e6 in BOTH engines:
# division by an exact power of two (66917.51 / 32 = 2091.1721875 at
# sf0.1) produces representable halves at the 6th decimal, where
# Spark's BigDecimal HALF_UP and DuckDB's half-even round apart —
# caught by the round-7 sf0.1 full-registry sweep.
_TRY_ARITH_ORACLE = """
    SELECT l_orderkey, l_linenumber,
           floor(CASE WHEN l_discount = 0 THEN NULL
                      ELSE l_extendedprice / l_discount END * 1000000 + 0.5)
             / 1000000 AS price_per_disc,
           floor(l_extendedprice / l_quantity * 1000000 + 0.5) / 1000000 AS unit_price
    FROM lineitem WHERE l_orderkey % 100 = 0
"""


@q("try_arithmetic_suite", _TRY_ARITH_ORACLE)
def try_arithmetic_suite(spark, sf_dir):
    """ANSI-mode-safe arithmetic: try_divide yields NULL on zero
    divisors instead of raising mid-job — the per-expression escape
    hatch that lets the engine keep ANSI mode ON globally (Spark 4
    default) without a single dirty row killing a 100 TB pipeline.
    Oracle states the same semantics as an explicit CASE."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)

    def r6(c):  # engine-exact HALF_UP (see the oracle comment)
        return F.floor(c * 1_000_000 + F.lit(0.5)) / 1_000_000

    return li.select(
        "l_orderkey", "l_linenumber",
        r6(F.expr("try_divide(l_extendedprice, l_discount)")).alias("price_per_disc"),
        r6(F.expr("try_divide(l_extendedprice, l_quantity)")).alias("unit_price"),
    )
