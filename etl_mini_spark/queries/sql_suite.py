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
    demonstrates the ANSI-SQL entry point over registered views. Runs
    under runtime bloom-filter pruning (session.enable_runtime_filters):
    the selective BUILDING-segment customer side seeds a bloom filter
    that drops orders/lineitem probe rows before their shuffle — only
    ever false-positives, so correctness is unaffected."""
    from etl_mini_spark.session import enable_runtime_filters, register_tables

    enable_runtime_filters(spark)
    register_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(
        _Q3_SQL.replace("strftime(o_orderdate, '%Y-%m-%d')",
                        "date_format(o_orderdate, 'yyyy-MM-dd')")
    )


# =========================================================================


_Q7_SQL = """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 year(l_shipdate) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
                 OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
            AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
         ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


@q("sql_q7_volume", _Q7_SQL)
def sql_q7_volume(spark, sf_dir):
    """TPC-H Q7 (volume shipping, nations adapted to the testdata's
    NATION_n names): a 6-way join with the nation dim joined TWICE
    under different aliases — supplier-side and customer-side — plus a
    disjunctive cross-pair predicate. Both nation sides broadcast; the
    fact flows through hash joins with the date filter pushed to the
    scan."""
    from etl_mini_spark.session import register_tables

    register_tables(spark, sf_dir, ["supplier", "lineitem", "orders", "customer", "nation"])
    return spark.sql(_Q7_SQL)


_Q13_SQL = """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@q("sql_q13_custdist", _Q13_SQL)
def sql_q13_custdist(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution, comment filter
    dropped — no o_comment column in the testdata): LEFT join so
    zero-order customers survive with c_count = 0, then a second
    aggregation over the first — the double-agg histogram shape.
    count(o_orderkey) counts non-NULL only, which is what makes the
    outer-join zeros correct."""
    from etl_mini_spark.session import register_tables

    register_tables(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_Q13_SQL)


_Q18_SQL = """
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


@q("sql_q18_large_orders", _Q18_SQL)
def sql_q18_large_orders(spark, sf_dir):
    """TPC-H Q18 (large-volume customers; threshold adapted to the
    testdata's quantity distribution — 250 ≈ p99 of per-order quantity
    sums): the IN-subquery is itself an aggregation over the fact
    table, which Catalyst plans as an aggregate + semi join before the
    main 3-way join; the final ORDER BY ... LIMIT is a
    TakeOrderedAndProject, not a global sort. Runs under runtime
    bloom-filter pruning; note Catalyst does NOT seed a bloom from the
    IN-subquery here — the creation side must carry a selective base
    filter, and this one is aggregate-defined (HAVING) — so the conf is
    a no-op for this plan today, kept for uniformity across the suite."""
    from etl_mini_spark.session import enable_runtime_filters, register_tables

    enable_runtime_filters(spark)
    register_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(
        _Q18_SQL.replace("strftime(o_orderdate, '%Y-%m-%d')",
                         "date_format(o_orderdate, 'yyyy-MM-dd')")
    )


_Q19_SQL = """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
"""


@q("sql_q19_disjunctive", _Q19_SQL)
def sql_q19_disjunctive(spark, sf_dir):
    """TPC-H Q19 (discounted revenue; ship-mode/container clauses
    dropped — columns absent from the testdata): the disjunctive
    mixed-table predicate is the optimizer test — Catalyst must derive
    the single-table implications (p_brand IN (...), p_size <= 15,
    l_quantity <= 30) and push them below the join so neither side
    scans full."""
    from etl_mini_spark.session import register_tables

    register_tables(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(_Q19_SQL)
