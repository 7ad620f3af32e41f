from etl_mini_spark.queries._base import *  # noqa: F401,F403
from etl_mini_spark.queries._base import _t, _TMP  # noqa: F401

# SQL surface — same engine, ANSI-SQL entry point (spark.sql); the SQL
# string compiles to the same Catalyst plans as the DataFrame API.
# =========================================================================

_Q3_SQL = """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


@q("sql_q3_shipping", _Q3_SQL)
def sql_q3_shipping(spark, sf_dir):
    """TPC-H Q3 (shipping priority) submitted as a plain SQL string —
    demonstrates the ANSI-SQL entry point over registered views."""
    from etl_mini_spark.session import register_tables

    register_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(
        _Q3_SQL.replace("strftime(o_orderdate, '%Y-%m-%d')",
                        "date_format(o_orderdate, 'yyyy-MM-dd')")
    )


# =========================================================================
