"""Round-10 staged tier: rank statistics, BI decompositions, corpus
laws, and source/DQ ops — authored in round 9, to be registered when
the round-9 window comes back.

Module-local PENDING_QUERIES/PENDING_ORACLE (swept by sweep_oracle.py
alongside the registry) until registration rotates them into the
driver window — the same two-step every round since 7 has used.

Parity rules as in round9_ops: integer/decimal arithmetic end-to-end,
libm terms pre-rounded at 9dp and summed as DECIMAL(28,9), ranks via
the twice-the-midrank integer (2·rank + tiecount − 1), fixed bin
edges, md5-bucket portable randomness, deterministic tie-breaks on
every rank/limit. No rank ever rides on a libm value.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mini_spark.queries._base import _t

PENDING_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
PENDING_ORACLE: dict[str, str] = {}


def pq(name: str, sql: str | None = None):
    def deco(fn):
        PENDING_QUERIES[name] = fn
        if sql is not None:
            PENDING_ORACLE[name] = sql
        return fn

    return deco


# --- Spearman rank correlation ---------------------------------------------------
# Daily (revenue, order count) pairs; both variables converted to
# twice-the-midrank integers (2·rank + ties − 1, exact under ties), and
# rho is the Pearson formula over those INTEGERS — sums stay BIGINT,
# one double finish.
_SPEARMAN_SQL = """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1),
    r AS (
      SELECT
        2 * rank() OVER (ORDER BY rev) + count(*) OVER (PARTITION BY rev) - 1 AS rx,
        2 * rank() OVER (ORDER BY cnt) + count(*) OVER (PARTITION BY cnt) - 1 AS ry
      FROM daily),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
             CAST(sum(rx * ry) AS BIGINT) AS sxy,
             CAST(sum(rx * rx) AS BIGINT) AS sxx,
             CAST(sum(ry * ry) AS BIGINT) AS syy
      FROM r)
    SELECT n,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                        * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)), 6) AS spearman_rho
    FROM s
"""


@pq("spearman_rank_corr", _SPEARMAN_SQL)
def spearman_rank_corr(spark, sf_dir):
    """Spearman rank correlation between daily revenue and daily order
    count — the monotone-association screen that ignores outliers
    Pearson chokes on. Both series become twice-the-midrank INTEGERS
    (2·rank + tiecount − 1, exact under ties), so every sufficient
    statistic is a BIGINT sum and rho is one double formula. Plan: one
    day-keyed agg (bounded rows/year), two rank windows over the tiny
    daily table, a 1-row finish — the fact scan dominates at any
    scale."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        F.count("*").cast("bigint").alias("cnt"),
    )
    r = daily.select(
        (
            2 * F.rank().over(Window.orderBy("rev"))
            + F.count("*").over(Window.partitionBy("rev"))
            - 1
        ).alias("rx"),
        (
            2 * F.rank().over(Window.orderBy("cnt"))
            + F.count("*").over(Window.partitionBy("cnt"))
            - 1
        ).alias("ry"),
    )
    s = r.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("rx").cast("bigint").alias("sx"),
        F.sum("ry").cast("bigint").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("bigint").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("bigint").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("bigint").alias("syy"),
    )
    return s.select(
        "n",
        F.round(
            (F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy"))
            / F.sqrt(
                (F.col("n") * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx"))
                * (F.col("n") * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy"))
            ),
            6,
        ).alias("spearman_rho"),
    )


# --- Mann-Whitney U with tie-corrected normal approximation ------------------------
# 2·U1 = Σ_1 mr2 − 2·n1(n1+1)/2 stays integer; the tie correction
# Σ(t³−t) is an integer sum over distinct scores; only z divides.
_MWU_SQL = """
    WITH s AS (
      SELECT value AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g
      FROM events WHERE event_type IN ('purchase', 'view')),
    r AS (
      SELECT g,
             2 * rank() OVER (ORDER BY v) + count(*) OVER (PARTITION BY v) - 1 AS mr2
      FROM s),
    ties AS (
      SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie3
      FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM s GROUP BY v)),
    agg AS (
      SELECT CAST(sum(g) AS BIGINT) AS n1,
             CAST(count(*) - sum(g) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN g = 1 THEN mr2 ELSE 0 END) AS BIGINT) AS mr2_1
      FROM r)
    SELECT n1, n2,
           round((mr2_1 - n1 * (n1 + 1)) / 2.0, 1) AS u1,
           round(((mr2_1 - n1 * (n1 + 1)) / 2.0 - n1 * n2 / 2.0)
                 / sqrt((n1 * 1.0 * n2 / 12.0)
                        * ((n1 + n2 + 1)
                           - tie3 / (1.0 * (n1 + n2) * (n1 + n2 - 1)))), 6) AS z
    FROM agg CROSS JOIN ties
"""


@pq("mann_whitney_u", _MWU_SQL)
def mann_whitney_u(spark, sf_dir):
    """Mann-Whitney U test (purchase vs view values) with the
    tie-corrected normal approximation — the nonparametric two-sample
    location test. The rank sum uses the twice-the-midrank integer, so
    2·U1 is exact BIGINT; the tie correction Σ(t³−t) is an integer sum
    over distinct values; z is the only float expression. Plan: one
    global rank (range-partitioned two-pass prefix counts at scale),
    one distinct-value agg, a 1-row finish — the same shape as
    roc_auc_exact, which is no accident (AUC = U/(n1·n2))."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type").isin("purchase", "view"))
    s = e.select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g"),
    )
    r = s.select(
        "g",
        (
            2 * F.rank().over(Window.orderBy("v"))
            + F.count("*").over(Window.partitionBy("v"))
            - 1
        ).alias("mr2"),
    )
    ties = (
        s.groupBy("v")
        .agg(F.count("*").cast("bigint").alias("t"))
        .agg(F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).cast("bigint").alias("tie3"))
    )
    agg = r.agg(
        F.sum("g").cast("bigint").alias("n1"),
        (F.count("*") - F.sum("g")).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("g") == 1, F.col("mr2")).otherwise(0)).cast("bigint").alias("mr2_1"),
    )
    u1 = (F.col("mr2_1") - F.col("n1") * (F.col("n1") + 1)) / 2.0
    n = F.col("n1") + F.col("n2")
    var = (F.col("n1") * 1.0 * F.col("n2") / 12.0) * (
        (n + 1) - F.col("tie3") / (1.0 * n * (n - 1))
    )
    return agg.crossJoin(F.broadcast(ties)).select(
        "n1",
        "n2",
        F.round(u1, 1).alias("u1"),
        F.round((u1 - F.col("n1") * F.col("n2") / 2.0) / F.sqrt(var), 6).alias("z"),
    )


# --- one-way ANOVA F ------------------------------------------------------------------
# Group sums of x and x² are DECIMAL-exact; the five between-group
# terms S_g²/n_g pre-round at 9dp and sum as DECIMAL(28,9); F is the
# final double ratio.
_ANOVA_SQL = """
    WITH base AS (
      SELECT event_type AS g, CAST(value AS DECIMAL(18,2)) AS x,
             CAST(CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))
               * CAST(value AS DECIMAL(18,2)) AS x2
      FROM events),
    per AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_g, sum(x) AS s_g, sum(x2) AS ss_g
      FROM base GROUP BY g),
    tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
             sum(s_g) AS s, sum(ss_g) AS ss,
             sum(CAST(round(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g, 9)
                      AS DECIMAL(28,9))) AS bsum
      FROM per)
    SELECT n, k,
           round(CAST(bsum AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 6) AS ssb,
           round(CAST(ss AS DOUBLE) - CAST(bsum AS DOUBLE), 6) AS ssw,
           round(((CAST(bsum AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (k - 1))
                 / ((CAST(ss AS DOUBLE) - CAST(bsum AS DOUBLE)) / (n - k)), 6) AS f_stat
    FROM tot
"""


@pq("anova_oneway_f", _ANOVA_SQL)
def anova_oneway_f(spark, sf_dir):
    """One-way ANOVA F statistic of value across the five event types —
    the does-the-group-matter omnibus test. Per-group Σx and Σx² are
    DECIMAL-exact; the k between-group terms S_g²/n_g pre-round at 9dp
    and accumulate as DECIMAL(28,9); SSB/SSW/F are formed with the
    identical double expressions on both engines. Plan: one hash-agg to
    k rows, then scalar algebra — scan-bound at 100 TB."""
    e = _t(spark, sf_dir, "events")
    base = e.select(
        F.col("event_type").alias("g"),
        F.col("value").cast("decimal(18,2)").alias("x"),
        (
            F.col("value").cast("decimal(18,2)").cast("decimal(38,4)")
            * F.col("value").cast("decimal(18,2)")
        ).alias("x2"),
    )
    per = base.groupBy("g").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum("x").alias("s_g"),
        F.sum("x2").alias("ss_g"),
    )
    tot = per.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.sum(
            F.round(
                F.col("s_g").cast("double") * F.col("s_g").cast("double") / F.col("n_g"), 9
            ).cast("decimal(28,9)")
        ).alias("bsum"),
    )
    ssb = F.col("bsum").cast("double") - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    ssw = F.col("ss").cast("double") - F.col("bsum").cast("double")
    return tot.select(
        "n",
        "k",
        F.round(ssb, 6).alias("ssb"),
        F.round(ssw, 6).alias("ssw"),
        F.round((ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 6).alias("f_stat"),
    )


# --- Durbin-Watson statistic ------------------------------------------------------------
# Over the observed daily revenue series: DW = ΣΔ²/Σe², where the mean
# cancels in the differences, so the numerator is a DECIMAL sum of
# exact squared deltas and the denominator is (nΣx²−(Σx)²)/n from
# exact decimals — ONE double division total.
_DW_SQL = """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
      FROM orders GROUP BY 1),
    lagd AS (
      SELECT x, lag(x) OVER (ORDER BY d) AS xp FROM daily),
    num AS (
      SELECT sum(CAST(x - xp AS DECIMAL(38,4)) * (x - xp)) AS sdd
      FROM lagd WHERE xp IS NOT NULL),
    den AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
             sum(CAST(x AS DECIMAL(38,4)) * x) AS sxx
      FROM daily)
    SELECT n,
           round(CAST(sdd AS DOUBLE) * n
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS dw
    FROM num CROSS JOIN den
"""


@pq("durbin_watson_autocorr", _DW_SQL)
def durbin_watson_autocorr(spark, sf_dir):
    """Durbin-Watson statistic of the observed daily revenue series
    (DW ≈ 2 means no lag-1 autocorrelation; < 2 positive) — the
    regression-residual serial-correlation check, computed on deviations
    from the mean. The mean CANCELS in the first differences, so the
    numerator ΣΔ² is a pure decimal sum of exact squared deltas, the
    denominator Σe² = (nΣx² − (Σx)²)/n comes from exact decimals, and
    the whole statistic is one double division. Plan: one day agg, one
    lag window over the tiny daily series, two scalar aggregates."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x")
    )
    lagd = daily.select("x", F.lag("x").over(Window.orderBy("d")).alias("xp"))
    num = lagd.filter(F.col("xp").isNotNull()).agg(
        F.sum((F.col("x") - F.col("xp")).cast("decimal(38,4)") * (F.col("x") - F.col("xp"))).alias("sdd")
    )
    den = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,4)") * F.col("x")).alias("sxx"),
    )
    return num.crossJoin(F.broadcast(den)).select(
        "n",
        F.round(
            F.col("sdd").cast("double") * F.col("n")
            / (
                F.col("n") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            ),
            6,
        ).alias("dw"),
    )


# --- weekday seasonality strength (eta-squared) -----------------------------------------
# Variance in daily revenue explained by ISO weekday: eta² = SSB/SST,
# same decimal discipline as ANOVA but reported as the forecaster's
# "seasonality strength" scalar alongside per-group spread.
_ETA_SQL = """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, isodow(o_orderdate) AS dow,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
      FROM orders GROUP BY 1, 2),
    per AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS n_g,
             sum(x) AS s_g,
             sum(CAST(x AS DECIMAL(38,4)) * x) AS ss_g
      FROM daily GROUP BY dow),
    tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n, sum(s_g) AS s, sum(ss_g) AS ss,
             sum(CAST(round(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g, 9)
                      AS DECIMAL(28,9))) AS bsum
      FROM per)
    SELECT n,
           round((CAST(bsum AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                 / (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n), 6)
             AS eta_sq
    FROM tot
"""


@pq("seasonal_strength_eta", _ETA_SQL)
def seasonal_strength_eta(spark, sf_dir):
    """Seasonality strength: the share of daily-revenue variance
    explained by ISO weekday (eta² = SSB/SST) — the scalar a
    forecasting pipeline checks before bothering with a weekly
    component. Same decimal-exact sufficient statistics as the ANOVA
    entry (Σx, Σx² decimal; the 7 between-group terms 9dp-rounded into
    a DECIMAL(28,9) sum); eta² is one double ratio. Plan: day agg →
    7-row agg → scalar."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("d"), (F.weekday("o_orderdate") + 1).alias("dow")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
    per = daily.groupBy("dow").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum("x").alias("s_g"),
        F.sum(F.col("x").cast("decimal(38,4)") * F.col("x")).alias("ss_g"),
    )
    tot = per.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.sum(
            F.round(
                F.col("s_g").cast("double") * F.col("s_g").cast("double") / F.col("n_g"), 9
            ).cast("decimal(28,9)")
        ).alias("bsum"),
    )
    sst = F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    ssb = F.col("bsum").cast("double") - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    return tot.select("n", F.round(ssb / sst, 6).alias("eta_sq"))
