"""Round-12 staged tier: agreement/effect-size/changepoint statistics
(Friedman, Cochran's Q, McNemar, Fleiss' kappa, Cliff's delta,
Jonckheere-Terpstra, Pettitt, Grubbs, Chow), a technical-indicator
family of sequential recursions (Wilder RSI, MACD, stochastic %K/%D,
OBV, Croston, damped Holt, Hurst R/S), SPC charts, and SQL-surface
parity ops (equi-depth NTILE histogram, quantile_disc convention,
UNPIVOT INCLUDE NULLS, calendar-edge date arithmetic, SCD6, MERGE
clause semantics, banker's rounding) plus corpus amplification and a
cursor-paginated HTTP source — authored in round 11, to be registered
when the round-11 window comes back.

Module-local PENDING_QUERIES/PENDING_ORACLE (swept by sweep_oracle.py
alongside the registry) until registration rotates them into the
driver window — the same two-step every round since 7 has used.

Parity rules as in round9/10/11_ops (FIXTURES.md §C): integer/decimal
arithmetic end-to-end (money as exact BIGINT cents; sums of squares
as DECIMAL(38,0)/HUGEINT wide integers past the 2^63 cliff), libm
terms pre-rounded at 9dp and summed as DECIMAL(28,9), ranks via
twice-the-midrank integers, fixed bin edges, md5-bucket portable
randomness, deterministic tie-breaks on every rank/limit,
floor(x*10^k + 0.5)/10^k HALF_UP for display rounding. Sequential
recursions (RSI/MACD/Croston/damped Holt) follow the holt_linear_trend
discipline: exact-integer (or 2dp pre-rounded) seeds and the IDENTICAL
IEEE expression sequence on both engines, so trajectories agree
bit-for-bit. No rank ever rides on a libm value.
"""

from __future__ import annotations

from collections.abc import Callable

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


def _pin(col, k: int = 6):
    """floor(x*10^k + 0.5)/10^k — the repo's HALF_UP display rounding,
    identical IEEE op sequence on both engines (FIXTURES.md §C)."""
    scale = 10 ** k
    return F.floor(col * scale + F.lit(0.5)) / scale


def _daily_cents(spark, sf_dir, table="events", value="value", datecol="ts"):
    """Daily total of `value` in exact BIGINT cents — the shared series
    every daily-statistic entry in this tier starts from."""
    t = _t(spark, sf_dir, table)
    return t.groupBy(F.date_format(datecol, "yyyy-MM-dd").alias("d")).agg(
        F.sum((F.col(value).cast("decimal(18,2)") * 100).cast("long"))
        .cast("bigint").alias("c")
    )


# the matching oracle-side CTE (events daily revenue cents)
_DAILY_SQL = """
      SELECT strftime(ts, '%Y-%m-%d') AS d,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS c
      FROM events GROUP BY 1
"""


# --- Friedman test over day blocks ---------------------------------------------------------
# Blocks = days, treatments = the 5 event types, response = daily
# revenue cents (zero-filled day x type grid so every block is
# complete). Within-block ranks become twice-the-midrank INTEGERS, so
# the per-treatment rank sums and their squares stay BIGINT; the
# statistic Q = 12/(n k (k+1)) SUM R_j^2 - 3 n (k+1) collapses to
# 3*SUM(R2_j^2)/(n k (k+1)) - 3 n (k+1) on the doubled ranks — one
# fixed double expression over exact integers (no tie correction by
# construction: both engines use the same midranks).
_FRIEDMAN_SQL = f"""
    WITH cells AS (
      SELECT strftime(ts, '%Y-%m-%d') AS d, event_type AS et,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    days AS (SELECT DISTINCT d FROM cells),
    types AS (SELECT DISTINCT event_type AS et FROM events),
    grid AS (
      SELECT days.d, types.et, coalesce(cells.c, 0) AS c
      FROM days CROSS JOIN types
      LEFT JOIN cells ON cells.d = days.d AND cells.et = types.et),
    r AS (
      SELECT d, et,
             2 * rank() OVER (PARTITION BY d ORDER BY c)
               + count(*) OVER (PARTITION BY d, c) - 1 AS r2
      FROM grid),
    rj AS (SELECT et, CAST(sum(r2) AS BIGINT) AS r2j FROM r GROUP BY et),
    s AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(r2j * r2j) AS BIGINT) AS sr2 FROM rj),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM days)
    SELECT rj.et, rj.r2j, n.n, s.k,
           floor((3.0 * s.sr2 / (n.n * s.k * (s.k + 1)) - 3.0 * n.n * (s.k + 1))
                 * 1000000 + 0.5) / 1000000 AS q_stat
    FROM rj CROSS JOIN s CROSS JOIN n
    ORDER BY rj.et
"""


@pq("friedman_test_blocks", _FRIEDMAN_SQL)
def friedman_test_blocks(spark, sf_dir):
    """Friedman rank test: do the 5 event types differ in daily revenue
    when each day is its own block? Within-day ranks are
    twice-the-midrank integers over the zero-filled day x type grid, so
    the per-type rank sums — and Q itself — derive from BIGINT sums
    with one double finish. Plan: one day x type agg (calendar-bounded
    grid at any fact scale), one in-block rank window, a k-row finish."""
    e = _t(spark, sf_dir, "events")
    cells = e.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("d"), F.col("event_type").alias("et")
    ).agg(
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
        .cast("bigint").alias("c")
    )
    days = cells.select("d").distinct()
    types = e.select(F.col("event_type").alias("et")).distinct()
    grid = (
        days.crossJoin(types)
        .join(cells, ["d", "et"], "left")
        .select("d", "et", F.coalesce("c", F.lit(0)).alias("c"))
    )
    r2 = (
        2 * F.rank().over(Window.partitionBy("d").orderBy("c"))
        + F.count("*").over(Window.partitionBy("d", "c"))
        - 1
    )
    rj = grid.select("et", r2.alias("r2")).groupBy("et").agg(
        F.sum("r2").cast("bigint").alias("r2j")
    )
    s = rj.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum(F.col("r2j") * F.col("r2j")).cast("bigint").alias("sr2"),
    )
    n = days.agg(F.count("*").cast("bigint").alias("n"))
    q = (
        3.0 * F.col("sr2") / (F.col("n") * F.col("k") * (F.col("k") + 1))
        - 3.0 * F.col("n") * (F.col("k") + 1)
    )
    return (
        rj.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(n))
        .select("et", "r2j", "n", "k", _pin(q).alias("q_stat"))
        .orderBy("et")
    )


# --- Cochran's Q over three binary raters --------------------------------------------------
# Three deterministic document "raters" (length > 350 chars, contains
# 'spark', contains 'join' AND 'merge'); Q = (k-1)(k*SUM G_j^2 -
# (SUM G_j)^2) / (k*SUM L_i - SUM L_i^2) is a ratio of BIGINTs — the
# repeated-measures test that the three screens pass different
# document subsets.
_COCHRAN_SQL = """
    WITH r AS (
      SELECT CASE WHEN length(text) > 350 THEN 1 ELSE 0 END AS a,
             CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS b,
             CASE WHEN text LIKE '%join%' AND text LIKE '%merge%' THEN 1 ELSE 0 END AS cc
      FROM documents),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a) AS BIGINT) AS g1, CAST(sum(b) AS BIGINT) AS g2,
             CAST(sum(cc) AS BIGINT) AS g3,
             CAST(sum(a + b + cc) AS BIGINT) AS sl,
             CAST(sum((a + b + cc) * (a + b + cc)) AS BIGINT) AS sl2
      FROM r)
    SELECT n, g1, g2, g3,
           floor(2.0 * (3 * (g1 * g1 + g2 * g2 + g3 * g3)
                        - (g1 + g2 + g3) * (g1 + g2 + g3))
                 / (3 * sl - sl2) * 1000000 + 0.5) / 1000000 AS q_stat
    FROM s
"""


@pq("cochran_q_raters", _COCHRAN_SQL)
def cochran_q_raters(spark, sf_dir):
    """Cochran's Q for k=3 matched binary raters over the document
    corpus — the screen-agreement test (do three quality filters pass
    the same documents?). Rater totals G_j and per-document sums L_i
    are exact integers; Q = (k-1)(k SUM G^2 - (SUM G)^2)/(k SUM L -
    SUM L^2) is one division. Plan: one corpus scan, a 1-row finish."""
    d = _t(spark, sf_dir, "documents")
    r = d.select(
        F.when(F.length("text") > 350, 1).otherwise(0).alias("a"),
        F.when(F.col("text").contains("spark"), 1).otherwise(0).alias("b"),
        F.when(
            F.col("text").contains("join") & F.col("text").contains("merge"), 1
        ).otherwise(0).alias("cc"),
    )
    li = (F.col("a") + F.col("b") + F.col("cc"))
    s = r.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("a").cast("bigint").alias("g1"),
        F.sum("b").cast("bigint").alias("g2"),
        F.sum("cc").cast("bigint").alias("g3"),
        F.sum(li).cast("bigint").alias("sl"),
        F.sum(li * li).cast("bigint").alias("sl2"),
    )
    g1, g2, g3 = F.col("g1"), F.col("g2"), F.col("g3")
    q = (
        2.0 * (3 * (g1 * g1 + g2 * g2 + g3 * g3) - (g1 + g2 + g3) * (g1 + g2 + g3))
        / (3 * F.col("sl") - F.col("sl2"))
    )
    return s.select("n", "g1", "g2", "g3", _pin(q).alias("q_stat"))


# --- McNemar's test on two paired raters ---------------------------------------------------
# Paired binary screens (contains 'join' vs contains 'merge'); the
# test statistic uses only the DISCORDANT cells b01/b10 — exact
# integers, chi2 = (b01-b10)^2/(b01+b10) plus the continuity-corrected
# variant.
_MCNEMAR_SQL = """
    WITH r AS (
      SELECT CASE WHEN text LIKE '%join%' THEN 1 ELSE 0 END AS a,
             CASE WHEN text LIKE '%merge%' THEN 1 ELSE 0 END AS b
      FROM documents),
    s AS (
      SELECT CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b01,
             CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b10,
             CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
             CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00
      FROM r)
    SELECT b01, b10, n11, n00,
           floor(1.0 * (b01 - b10) * (b01 - b10) / (b01 + b10) * 1000000 + 0.5)
             / 1000000 AS chi2,
           floor(1.0 * (abs(b01 - b10) - 1) * (abs(b01 - b10) - 1) / (b01 + b10)
                 * 1000000 + 0.5) / 1000000 AS chi2_cc
    FROM s
"""


@pq("mcnemar_paired_rules", _MCNEMAR_SQL)
def mcnemar_paired_rules(spark, sf_dir):
    """McNemar's test for two paired binary screens on the same
    documents: only the discordant counts b01/b10 matter, and both the
    plain and continuity-corrected chi-square are single divisions of
    exact integers. Plan: one corpus scan, a 1-row finish."""
    d = _t(spark, sf_dir, "documents")
    r = d.select(
        F.when(F.col("text").contains("join"), 1).otherwise(0).alias("a"),
        F.when(F.col("text").contains("merge"), 1).otherwise(0).alias("b"),
    )
    s = r.agg(
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint").alias("b01"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint").alias("b10"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint").alias("n11"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint").alias("n00"),
    )
    diff = F.col("b01") - F.col("b10")
    tot = F.col("b01") + F.col("b10")
    adiff = F.abs(diff) - 1
    return s.select(
        "b01", "b10", "n11", "n00",
        _pin(1.0 * diff * diff / tot).alias("chi2"),
        _pin(1.0 * adiff * adiff / tot).alias("chi2_cc"),
    )


# --- Fleiss' kappa over three raters x three categories -------------------------------------
# Three deterministic length-band raters with DIFFERENT cutpoints
# assign each document to {0=short,1=medium,2=long}; n_ij (votes per
# doc per category) are integers 0..3, so P-bar and P_e are exact
# integer ratios: P-bar = (SUM n_ij^2 - N k)/(N k (k-1)),
# P_e = SUM_j C_j^2 / (N k)^2, kappa = (P-bar - P_e)/(1 - P_e).
_FLEISS_SQL = """
    WITH v AS (
      SELECT
        CASE WHEN length(text) < 300 THEN 0 WHEN length(text) < 500 THEN 1 ELSE 2 END AS c1,
        CASE WHEN length(text) < 320 THEN 0 WHEN length(text) < 520 THEN 1 ELSE 2 END AS c2,
        CASE WHEN length(text) < 280 THEN 0 WHEN length(text) < 480 THEN 1 ELSE 2 END AS c3
      FROM documents),
    nij AS (
      SELECT
        (CASE WHEN c1 = 0 THEN 1 ELSE 0 END + CASE WHEN c2 = 0 THEN 1 ELSE 0 END
         + CASE WHEN c3 = 0 THEN 1 ELSE 0 END) AS n0,
        (CASE WHEN c1 = 1 THEN 1 ELSE 0 END + CASE WHEN c2 = 1 THEN 1 ELSE 0 END
         + CASE WHEN c3 = 1 THEN 1 ELSE 0 END) AS n1,
        (CASE WHEN c1 = 2 THEN 1 ELSE 0 END + CASE WHEN c2 = 2 THEN 1 ELSE 0 END
         + CASE WHEN c3 = 2 THEN 1 ELSE 0 END) AS n2
      FROM v),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n0 * n0 + n1 * n1 + n2 * n2) AS BIGINT) AS snsq,
             CAST(sum(n0) AS BIGINT) AS c0, CAST(sum(n1) AS BIGINT) AS c1t,
             CAST(sum(n2) AS BIGINT) AS c2t
      FROM nij)
    SELECT n, c0, c1t, c2t,
           floor(((1.0 * (snsq - n * 3) / (n * 3 * 2))
                  - (1.0 * (c0 * c0 + c1t * c1t + c2t * c2t) / ((n * 3) * (n * 3))))
                 / (1.0 - 1.0 * (c0 * c0 + c1t * c1t + c2t * c2t) / ((n * 3) * (n * 3)))
                 * 1000000 + 0.5) / 1000000 AS kappa
    FROM s
"""


@pq("fleiss_kappa_multi", _FLEISS_SQL)
def fleiss_kappa_multi(spark, sf_dir):
    """Fleiss' kappa for three deterministic length-band raters over
    three categories — multi-rater chance-corrected agreement. All
    vote-count statistics (SUM n_ij^2, category column totals) are
    BIGINTs; kappa is one fixed double expression over those exact
    integer ratios. Plan: one corpus scan, a 1-row finish."""
    d = _t(spark, sf_dir, "documents")
    ln = F.length("text")

    def band(lo, hi):
        return F.when(ln < lo, 0).when(ln < hi, 1).otherwise(2)

    v = d.select(band(300, 500).alias("c1"), band(320, 520).alias("c2"),
                 band(280, 480).alias("c3"))
    def votes(cat):
        return sum(
            F.when(F.col(c) == cat, 1).otherwise(0) for c in ("c1", "c2", "c3")
        )

    nij = v.select(votes(0).alias("n0"), votes(1).alias("n1"), votes(2).alias("n2"))
    s = nij.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(
            F.col("n0") * F.col("n0") + F.col("n1") * F.col("n1")
            + F.col("n2") * F.col("n2")
        ).cast("bigint").alias("snsq"),
        F.sum("n0").cast("bigint").alias("c0"),
        F.sum("n1").cast("bigint").alias("c1t"),
        F.sum("n2").cast("bigint").alias("c2t"),
    )
    n = F.col("n")
    csq = F.col("c0") * F.col("c0") + F.col("c1t") * F.col("c1t") + F.col("c2t") * F.col("c2t")
    pbar = 1.0 * (F.col("snsq") - n * 3) / (n * 3 * 2)
    pe = 1.0 * csq / ((n * 3) * (n * 3))
    return s.select(
        "n", "c0", "c1t", "c2t", _pin((pbar - pe) / (1.0 - pe)).alias("kappa")
    )


# --- Cliff's delta between purchase and click days ------------------------------------------
# Nonparametric effect size: over all (purchase-day, click-day) cent
# pairs, delta = (#(x>y) - #(x<y)) / (n1*n2). The pair table is
# calendar^2 (bounded at any fact scale because both sides aggregate
# to days first); every statistic is a BIGINT.
_CLIFFS_SQL = """
    WITH dp AS (
      SELECT strftime(ts, '%Y-%m-%d') AS d,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    dc AS (
      SELECT strftime(ts, '%Y-%m-%d') AS d,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS c
      FROM events WHERE event_type = 'click' GROUP BY 1),
    s AS (
      SELECT CAST(sum(CASE WHEN p.c > q.c THEN 1 WHEN p.c < q.c THEN -1 ELSE 0 END)
               AS BIGINT) AS net,
             CAST(count(*) AS BIGINT) AS np
      FROM dp p CROSS JOIN dc q),
    n1 AS (SELECT CAST(count(*) AS BIGINT) AS n1 FROM dp),
    n2 AS (SELECT CAST(count(*) AS BIGINT) AS n2 FROM dc)
    SELECT n1.n1, n2.n2, s.net,
           floor(1.0 * s.net / s.np * 1000000 + 0.5) / 1000000 AS delta
    FROM s CROSS JOIN n1 CROSS JOIN n2
"""


@pq("cliffs_delta_effect", _CLIFFS_SQL)
def cliffs_delta_effect(spark, sf_dir):
    """Cliff's delta effect size between purchase-day and click-day
    revenue distributions: the signed dominance count over the bounded
    day x day pair grid divided by n1*n2 — all BIGINTs, one division.
    Plan: two day aggs, a calendar^2 cross of TINY aggregated tables
    (the fact table is scanned twice and never self-joined), 1-row
    finish."""
    e = _t(spark, sf_dir, "events")

    def daily(et):
        return (
            e.filter(F.col("event_type") == et)
            .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("d"))
            .agg(
                F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
                .cast("bigint").alias("c")
            )
        )

    dp, dc = daily("purchase"), daily("click")
    s = dp.crossJoin(dc.select(F.col("c").alias("c2"))).agg(
        F.sum(
            F.when(F.col("c") > F.col("c2"), 1)
            .when(F.col("c") < F.col("c2"), -1)
            .otherwise(0)
        ).cast("bigint").alias("net"),
        F.count("*").cast("bigint").alias("np"),
    )
    n1 = dp.agg(F.count("*").cast("bigint").alias("n1"))
    n2 = dc.agg(F.count("*").cast("bigint").alias("n2"))
    return (
        s.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select("n1", "n2", "net", _pin(1.0 * F.col("net") / F.col("np")).alias("delta"))
    )


# --- Jonckheere-Terpstra ordered-alternative trend test --------------------------------------
# Ordered groups = the 5 order priorities (1-URGENT < ... < 5-LOW),
# observations = MONTHLY order counts per priority (bounded grid at
# any fact scale). J is accumulated DOUBLED (2*#(x<y) + #(x=y)) so
# ties stay integer; the null mean and variance (no tie correction —
# same convention both engines) are integer formulas, z is one fixed
# double expression.
_JT_SQL = """
    WITH m AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
             strftime(o_orderdate, '%Y-%m') AS ym,
             CAST(count(*) AS BIGINT) AS v
      FROM orders GROUP BY 1, 2),
    j AS (
      SELECT CAST(sum(CASE WHEN a.v < b.v THEN 2 WHEN a.v = b.v THEN 1 ELSE 0 END)
               AS BIGINT) AS j2
      FROM m a JOIN m b ON a.g < b.g),
    sizes AS (SELECT g, CAST(count(*) AS BIGINT) AS ng FROM m GROUP BY g),
    s AS (
      SELECT CAST(sum(ng) AS BIGINT) AS n,
             CAST(sum(ng * ng) AS BIGINT) AS sn2,
             CAST(sum(ng * ng * (2 * ng + 3)) AS BIGINT) AS sv
      FROM sizes)
    SELECT s.n, j.j2,
           floor((j.j2 - 1.0 * (s.n * s.n - s.sn2) / 2)
                 / (2.0 * sqrt((1.0 * s.n * s.n * (2 * s.n + 3) - s.sv) / 72.0))
                 * 1000000 + 0.5) / 1000000 AS z
    FROM j CROSS JOIN s
"""


@pq("jonckheere_terpstra_trend", _JT_SQL)
def jonckheere_terpstra_trend(spark, sf_dir):
    """Jonckheere-Terpstra test for an ordered trend in monthly order
    volume across the 5 priorities. The doubled statistic J2 counts
    2 per strict dominance + 1 per tie over cross-group month pairs
    (a bounded grid — months x priorities, never the fact table), and
    z = (J2 - 2E[J]) / (2 sqrt(Var)) is one fixed expression over
    integer sums. Plan: one month x priority agg, a tiny grid
    self-join, 1-row finish."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    ).agg(F.count("*").cast("bigint").alias("v"))
    a = m.alias("a")
    b = m.select(F.col("g").alias("g2"), F.col("v").alias("v2")).alias("b")
    j = (
        a.join(b, F.col("a.g") < F.col("g2"))
        .agg(
            F.sum(
                F.when(F.col("a.v") < F.col("v2"), 2)
                .when(F.col("a.v") == F.col("v2"), 1)
                .otherwise(0)
            ).cast("bigint").alias("j2")
        )
    )
    sizes = m.groupBy("g").agg(F.count("*").cast("bigint").alias("ng"))
    s = sizes.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.sum(F.col("ng") * F.col("ng")).cast("bigint").alias("sn2"),
        F.sum(F.col("ng") * F.col("ng") * (2 * F.col("ng") + 3)).cast("bigint").alias("sv"),
    )
    n = F.col("n")
    z = (
        (F.col("j2") - 1.0 * (n * n - F.col("sn2")) / 2)
        / (2.0 * F.sqrt((1.0 * n * n * (2 * n + 3) - F.col("sv")) / 72.0))
    )
    return j.crossJoin(F.broadcast(s)).select("n", "j2", _pin(z).alias("z"))


# --- Pettitt changepoint on daily revenue -----------------------------------------------------
# U_t = SUM_{i<=t<j} sgn(x_j - x_i) over the bounded day-pair table
# (calendar^2); the changepoint is the earliest day maximizing |U_t|.
# Everything is integer: sgn sums, max, argmax with day tie-break.
_PETTITT_SQL = f"""
    WITH daily AS ({_DAILY_SQL}),
    idx AS (SELECT d, c, row_number() OVER (ORDER BY d) AS rn FROM daily),
    pairs AS (
      SELECT a.rn AS i, b.rn AS j,
             CAST(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END
               AS BIGINT) AS s
      FROM idx a JOIN idx b ON a.rn < b.rn),
    u AS (
      SELECT t.rn, t.d, CAST(coalesce(sum(p.s), 0) AS BIGINT) AS ut
      FROM idx t LEFT JOIN pairs p ON p.i <= t.rn AND p.j > t.rn
      GROUP BY t.rn, t.d),
    best AS (
      SELECT rn, d, ut, row_number() OVER (ORDER BY abs(ut) DESC, d) AS pick
      FROM u)
    SELECT d AS change_d, CAST(abs(ut) AS BIGINT) AS k_stat, ut
    FROM best WHERE pick = 1
"""


@pq("pettitt_changepoint", _PETTITT_SQL)
def pettitt_changepoint(spark, sf_dir):
    """Pettitt's nonparametric changepoint: the split day t maximizing
    |U_t|, U_t the signed rank-dominance sum between the before/after
    halves. Computed over the bounded day-pair grid (the fact table
    aggregates to days first), so every value is a BIGINT and the
    argmax is integer with an earliest-day tie-break. Plan: one day
    agg, a calendar^2 pair join on TINY tables, one rank pick."""
    daily = _daily_cents(spark, sf_dir)
    idx = daily.select("d", "c", F.row_number().over(Window.orderBy("d")).alias("rn"))
    a = idx.select(F.col("rn").alias("i"), F.col("c").alias("ci"))
    b = idx.select(F.col("rn").alias("j"), F.col("c").alias("cj"))
    pairs = a.join(b, F.col("i") < F.col("j")).select(
        "i", "j",
        F.when(F.col("cj") > F.col("ci"), 1)
        .when(F.col("cj") < F.col("ci"), -1)
        .otherwise(0).cast("bigint").alias("s"),
    )
    u = (
        idx.join(pairs, (F.col("i") <= F.col("rn")) & (F.col("j") > F.col("rn")), "left")
        .groupBy("rn", "d")
        .agg(F.coalesce(F.sum("s"), F.lit(0)).cast("bigint").alias("ut"))
    )
    best = u.withColumn(
        "pick", F.row_number().over(Window.orderBy(F.abs("ut").desc(), "d"))
    )
    return best.filter("pick = 1").select(
        F.col("d").alias("change_d"),
        F.abs("ut").cast("bigint").alias("k_stat"),
        "ut",
    )


# --- Grubbs' max-outlier test on daily revenue ------------------------------------------------
# The candidate day is picked by the INTEGER deviation |n*x_i - S|
# (same ordering as |x_i - mean|, no libm in the rank — the repo
# convention), with earliest-day tie-break; G = (dev/n)/s is computed
# once for the winner from exact integer sums (sum of squares held
# wide: DECIMAL(38,0)/HUGEINT past the 2^63 cliff).
_GRUBBS_SQL = f"""
    WITH daily AS ({_DAILY_SQL}),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS sc,
             sum(CAST(c AS HUGEINT) * c) AS ssq
      FROM daily),
    dev AS (
      SELECT d.d, d.c, CAST(abs(s.n * d.c - s.sc) AS BIGINT) AS dv, s.n, s.sc, s.ssq,
             row_number() OVER (ORDER BY abs(s.n * d.c - s.sc) DESC, d.d) AS pick
      FROM daily d CROSS JOIN s)
    SELECT d AS outlier_d, CAST(c AS DOUBLE) / 100.0 AS revenue, n,
           floor((1.0 * dv / n)
                 / sqrt((1.0 * n * ssq - 1.0 * sc * sc) / (1.0 * n * (n - 1)))
                 * 1000000 + 0.5) / 1000000 AS g_stat
    FROM dev WHERE pick = 1
"""


@pq("grubbs_max_outlier", _GRUBBS_SQL)
def grubbs_max_outlier(spark, sf_dir):
    """Grubbs' test for the single most extreme day: the candidate is
    ranked by the integer deviation |n*x_i - S| (equivalent ordering to
    |x_i - mean| with no libm in the rank), then G = |x - mean|/s is
    one fixed expression over exact integer sums, the sum of squares
    wide (DECIMAL(38,0)/HUGEINT). Plan: one day agg, one broadcast of
    the 1-row moments, one rank pick."""
    daily = _daily_cents(spark, sf_dir)
    s = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sc"),
        F.sum(F.col("c").cast("decimal(19,0)") * F.col("c").cast("decimal(19,0)"))
        .alias("ssq"),
    )
    dev = daily.crossJoin(F.broadcast(s)).withColumn(
        "dv", F.abs(F.col("n") * F.col("c") - F.col("sc")).cast("bigint")
    ).withColumn(
        "pick", F.row_number().over(Window.orderBy(F.col("dv").desc(), "d"))
    )
    n, sc, ssq = F.col("n"), F.col("sc"), F.col("ssq")
    g = (1.0 * F.col("dv") / n) / F.sqrt(
        (1.0 * n * ssq - 1.0 * sc * sc) / (1.0 * n * (n - 1))
    )
    return dev.filter("pick = 1").select(
        F.col("d").alias("outlier_d"),
        (F.col("c").cast("double") / 100.0).alias("revenue"),
        "n",
        _pin(g).alias("g_stat"),
    )


# --- Chow test for a structural break at mid-series -------------------------------------------
# Daily revenue regressed on the day index, split at the FIXED
# midpoint nb = n DIV 2. Segment SSEs come from centered sums built
# out of exact integers (Syy wide), combined pooled = seg1 + seg2 raw
# sums (all additive), and F is one fixed double expression — the
# same integer-sums regression discipline as rolling_regression_slope.
_CHOW_SQL = f"""
    WITH daily AS ({_DAILY_SQL}),
    idx AS (SELECT c, row_number() OVER (ORDER BY d) AS rn FROM daily),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(count(*) / 2 AS BIGINT) AS nb FROM idx),
    seg AS (
      SELECT CASE WHEN i.rn <= nn.nb THEN 1 ELSE 2 END AS sg,
             CAST(count(*) AS BIGINT) AS m,
             CAST(sum(i.rn) AS BIGINT) AS sx, CAST(sum(i.c) AS BIGINT) AS sy,
             CAST(sum(i.rn * i.rn) AS BIGINT) AS sxx,
             CAST(sum(i.rn * i.c) AS BIGINT) AS sxy,
             sum(CAST(i.c AS HUGEINT) * i.c) AS syy
      FROM idx i CROSS JOIN nn GROUP BY 1),
    sse AS (
      SELECT sg, m,
             ((1.0 * m * syy - 1.0 * sy * sy)
              - (1.0 * m * sxy - 1.0 * sx * sy) * (1.0 * m * sxy - 1.0 * sx * sy)
                / (1.0 * m * sxx - 1.0 * sx * sx)) / m AS e
      FROM seg),
    pooled AS (
      SELECT CAST(sum(m) AS BIGINT) AS m,
             CAST(sum(sx) AS BIGINT) AS sx, CAST(sum(sy) AS BIGINT) AS sy,
             CAST(sum(sxx) AS BIGINT) AS sxx, CAST(sum(sxy) AS BIGINT) AS sxy,
             sum(syy) AS syy
      FROM seg),
    psse AS (
      SELECT m,
             ((1.0 * m * syy - 1.0 * sy * sy)
              - (1.0 * m * sxy - 1.0 * sx * sy) * (1.0 * m * sxy - 1.0 * sx * sy)
                / (1.0 * m * sxx - 1.0 * sx * sx)) / m AS e
      FROM pooled),
    parts AS (
      SELECT max(CASE WHEN sg = 1 THEN e END) AS e1,
             max(CASE WHEN sg = 2 THEN e END) AS e2
      FROM sse)
    SELECT nn.n, nn.nb,
           floor(((psse.e - parts.e1 - parts.e2) / 2.0)
                 / ((parts.e1 + parts.e2) / (nn.n - 4.0)) * 1000000 + 0.5)
             / 1000000 AS f_stat
    FROM psse CROSS JOIN parts CROSS JOIN nn
"""


@pq("chow_structural_break", _CHOW_SQL)
def chow_structural_break(spark, sf_dir):
    """Chow test: does the daily-revenue-vs-time regression break at
    the series midpoint? Segment and pooled SSEs derive from exact
    integer sums (Syy wide), pooled sums are the ADDITIVE combination
    of the segment sums (no second scan), and F is one fixed double
    expression. Plan: one day agg, one 2-group aggregate over the tiny
    indexed series, scalar algebra."""
    daily = _daily_cents(spark, sf_dir)
    idx = daily.select("c", F.row_number().over(Window.orderBy("d")).alias("rn"))
    nn = idx.agg(
        F.count("*").cast("bigint").alias("n"),
        (F.count("*") / 2).cast("bigint").alias("nb"),
    )
    seg = (
        idx.crossJoin(F.broadcast(nn))
        .groupBy(F.when(F.col("rn") <= F.col("nb"), 1).otherwise(2).alias("sg"))
        .agg(
            F.count("*").cast("bigint").alias("m"),
            F.sum("rn").cast("bigint").alias("sx"),
            F.sum("c").cast("bigint").alias("sy"),
            F.sum(F.col("rn") * F.col("rn")).cast("bigint").alias("sxx"),
            F.sum(F.col("rn") * F.col("c")).cast("bigint").alias("sxy"),
            F.sum(F.col("c").cast("decimal(19,0)") * F.col("c").cast("decimal(19,0)"))
            .alias("syy"),
        )
    )

    def sse_expr():
        m, sx, sy = F.col("m"), F.col("sx"), F.col("sy")
        sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
        sxyc = 1.0 * m * sxy - 1.0 * sx * sy
        return ((1.0 * m * syy - 1.0 * sy * sy) - sxyc * sxyc
                / (1.0 * m * sxx - 1.0 * sx * sx)) / m

    sse = seg.select("sg", sse_expr().alias("e"))
    pooled = seg.agg(
        F.sum("m").cast("bigint").alias("m"),
        F.sum("sx").cast("bigint").alias("sx"),
        F.sum("sy").cast("bigint").alias("sy"),
        F.sum("sxx").cast("bigint").alias("sxx"),
        F.sum("sxy").cast("bigint").alias("sxy"),
        F.sum("syy").alias("syy"),
    )
    psse = pooled.select(sse_expr().alias("e"))
    parts = sse.agg(
        F.max(F.when(F.col("sg") == 1, F.col("e"))).alias("e1"),
        F.max(F.when(F.col("sg") == 2, F.col("e"))).alias("e2"),
    )
    f = ((F.col("e") - F.col("e1") - F.col("e2")) / 2.0) / (
        (F.col("e1") + F.col("e2")) / (F.col("n") - 4.0)
    )
    return (
        psse.crossJoin(F.broadcast(parts))
        .crossJoin(F.broadcast(nn))
        .select("n", "nb", _pin(f).alias("f_stat"))
    )


# --- Theil inequality index over customer revenue ----------------------------------------------
# T = SUM (x_i/X) ln(n x_i / X) over customers with orders. Each ln
# argument is an exact-integer ratio (n*x_i BIGINT / X BIGINT), the
# term is pre-rounded at 9dp and summed as DECIMAL(28,9) — the repo's
# order-free libm-sum rule.
_THEIL_SQL = """
    WITH cust AS (
      SELECT o_custkey,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS BIGINT) AS x
      FROM orders GROUP BY 1),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS xt FROM cust),
    terms AS (
      SELECT CAST(floor((1.0 * c.x / s.xt) * ln(1.0 * s.n * c.x / s.xt)
                        * 1000000000 + 0.5) AS DECIMAL(28,9)) / 1000000000 AS t9,
             s.n, s.xt
      FROM cust c CROSS JOIN s)
    SELECT max(n) AS n, CAST(max(xt) AS BIGINT) AS total_cents,
           floor(CAST(sum(t9) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS theil
    FROM terms
"""


@pq("theil_inequality_index", _THEIL_SQL)
def theil_inequality_index(spark, sf_dir):
    """Theil's T inequality index of customer revenue concentration —
    the entropy-based complement of the registered Gini/Lorenz and
    Herfindahl screens. Each term's ln argument is an exact integer
    ratio; terms pre-round at 9dp and sum as DECIMAL(28,9) (order-free
    exact), one double finish. Plan: one customer agg, one broadcast
    1-row total, one decimal sum."""
    o = _t(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .cast("bigint").alias("x")
    )
    s = cust.agg(
        F.count("*").cast("bigint").alias("n"), F.sum("x").cast("bigint").alias("xt")
    )
    term = (1.0 * F.col("x") / F.col("xt")) * F.log(
        1.0 * F.col("n") * F.col("x") / F.col("xt")
    )
    t9 = (
        F.floor(term * 1_000_000_000 + F.lit(0.5)).cast("decimal(28,9)")
        / 1_000_000_000
    )
    return (
        cust.crossJoin(F.broadcast(s))
        .select(t9.alias("t9"), "n", "xt")
        .agg(
            F.max("n").alias("n"),
            F.max("xt").cast("bigint").alias("total_cents"),
            _pin(F.sum("t9").cast("double")).alias("theil"),
        )
    )


# --- XmR (individuals + moving range) control chart --------------------------------------------
# Shewhart individuals chart on daily revenue: moving ranges
# |c_t - c_{t-1}| are integers, the center line and the 2.66*MR-bar
# control limits are fixed double expressions over integer sums, and
# each day's out-of-control flags compare the SAME doubles on both
# engines.
_XMR_SQL = f"""
    WITH daily AS ({_DAILY_SQL}),
    mr AS (
      SELECT d, c,
             abs(c - lag(c) OVER (ORDER BY d)) AS mrv
      FROM daily),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(mrv) AS BIGINT) AS smr,
             CAST(count(mrv) AS BIGINT) AS nmr
      FROM mr)
    SELECT mr.d, CAST(mr.c AS DOUBLE) / 100.0 AS revenue,
           floor((1.0 * s.sc / s.n / 100.0) * 10000 + 0.5) / 10000 AS center,
           floor((1.0 * s.sc / s.n + 2.66 * (1.0 * s.smr / s.nmr)) / 100.0
                 * 10000 + 0.5) / 10000 AS ucl,
           floor((1.0 * s.sc / s.n - 2.66 * (1.0 * s.smr / s.nmr)) / 100.0
                 * 10000 + 0.5) / 10000 AS lcl,
           CAST(mr.c AS DOUBLE) > 1.0 * s.sc / s.n + 2.66 * (1.0 * s.smr / s.nmr)
             AS above_ucl,
           CAST(mr.c AS DOUBLE) < 1.0 * s.sc / s.n - 2.66 * (1.0 * s.smr / s.nmr)
             AS below_lcl
    FROM mr CROSS JOIN s
    ORDER BY mr.d
"""


@pq("xmr_control_chart", _XMR_SQL)
def xmr_control_chart(spark, sf_dir):
    """XmR (individuals / moving-range) control chart on daily revenue:
    MR values are exact integer cent differences, the center and
    2.66*MR-bar limits are fixed expressions over integer sums, and the
    out-of-control booleans compare raw doubles computed identically on
    both engines (the bollinger breach discipline). Plan: one day agg,
    one lag window, one broadcast 1-row moment join."""
    daily = _daily_cents(spark, sf_dir)
    mr = daily.select(
        "d", "c", F.abs(F.col("c") - F.lag("c").over(Window.orderBy("d"))).alias("mrv")
    )
    s = mr.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sc"),
        F.sum("mrv").cast("bigint").alias("smr"),
        F.count("mrv").cast("bigint").alias("nmr"),
    )
    mean = 1.0 * F.col("sc") / F.col("n")
    mrbar = 1.0 * F.col("smr") / F.col("nmr")
    ucl, lcl = mean + 2.66 * mrbar, mean - 2.66 * mrbar
    return (
        mr.crossJoin(F.broadcast(s))
        .select(
            "d",
            (F.col("c").cast("double") / 100.0).alias("revenue"),
            _pin(mean / 100.0, 4).alias("center"),
            _pin(ucl / 100.0, 4).alias("ucl"),
            _pin(lcl / 100.0, 4).alias("lcl"),
            (F.col("c").cast("double") > ucl).alias("above_ucl"),
            (F.col("c").cast("double") < lcl).alias("below_lcl"),
        )
        .orderBy("d")
    )


# --- record-breaking days (running-max streaks) -------------------------------------------------
# All-time-high bookkeeping: a day is a record when its revenue
# strictly exceeds every prior day's. Running max and the record
# ordinal are integer window aggregates — no floats anywhere.
_RECORD_SQL = f"""
    WITH daily AS ({_DAILY_SQL}),
    r AS (
      SELECT d, c,
             max(c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM daily),
    flags AS (
      SELECT d, c, (prev_max IS NULL OR c > prev_max) AS is_record FROM r)
    SELECT d, CAST(c AS DOUBLE) / 100.0 AS revenue,
           CAST(sum(CASE WHEN is_record THEN 1 ELSE 0 END)
                OVER (ORDER BY d) AS BIGINT) AS record_no
    FROM flags WHERE is_record
    ORDER BY d
"""


@pq("record_breaking_days", _RECORD_SQL)
def record_breaking_days(spark, sf_dir):
    """Days that set a new all-time revenue high, with their record
    ordinal — the running-max streak audit. Strictly integer window
    logic (prev-row running max + a counted flag). Plan: one day agg
    and two ordered windows over the calendar-bounded series."""
    daily = _daily_cents(spark, sf_dir)
    w_prev = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    r = daily.select("d", "c", F.max("c").over(w_prev).alias("prev_max"))
    flags = r.select(
        "d", "c",
        (F.col("prev_max").isNull() | (F.col("c") > F.col("prev_max"))).alias("is_record"),
    )
    return (
        flags.withColumn(
            "record_no",
            F.sum(F.when(F.col("is_record"), 1).otherwise(0))
            .over(Window.orderBy("d")).cast("bigint"),
        )
        .filter("is_record")
        .select("d", (F.col("c").cast("double") / 100.0).alias("revenue"), "record_no")
        .orderBy("d")
    )


# --- Wilder RSI (14-day) on daily revenue -------------------------------------------------------
# Gains/losses are exact integer cent diffs; the seed averages are one
# division each; the Wilder recursion ag' = (ag*13 + g)/14 is the
# IDENTICAL IEEE sequence on both engines (holt discipline), so RSI
# matches bit-for-bit before the display pin.
_RSI_SQL = f"""
    WITH RECURSIVE daily AS ({_DAILY_SQL}),
    ser AS (SELECT d, c, row_number() OVER (ORDER BY d) AS i FROM daily),
    dd AS (
      SELECT s2.i, s2.d,
             CAST(greatest(s2.c - s1.c, 0) AS BIGINT) AS g,
             CAST(greatest(s1.c - s2.c, 0) AS BIGINT) AS l
      FROM ser s1 JOIN ser s2 ON s2.i = s1.i + 1),
    seed AS (
      SELECT CAST(15 AS BIGINT) AS i,
             sum(g) / 14.0 AS ag, sum(l) / 14.0 AS al
      FROM dd WHERE i <= 15),
    rec AS (
      SELECT i, ag, al FROM seed
      UNION ALL
      SELECT r.i + 1,
             (r.ag * 13.0 + dd.g) / 14.0,
             (r.al * 13.0 + dd.l) / 14.0
      FROM rec r JOIN dd ON dd.i = r.i + 1)
    SELECT ser.d,
           floor(CASE WHEN rec.al = 0.0 THEN 100.0
                      ELSE 100.0 - 100.0 / (1.0 + rec.ag / rec.al) END
                 * 1000000 + 0.5) / 1000000 AS rsi,
           floor(rec.ag / 100.0 * 1000000 + 0.5) / 1000000 AS avg_gain,
           floor(rec.al / 100.0 * 1000000 + 0.5) / 1000000 AS avg_loss
    FROM rec JOIN ser ON ser.i = rec.i
    ORDER BY ser.d
"""


@pq("rsi_wilder_14", _RSI_SQL)
def rsi_wilder_14(spark, sf_dir):
    """Wilder's 14-day RSI on daily revenue: integer cent gains/losses,
    seed averages over the first 14 diffs, then the smoothing recursion
    (ag*13 + g)/14 — a sequential state update no window frame
    expresses, run as one Arrow pass over the calendar-bounded series
    and replayed by the oracle as a recursive CTE with the identical
    IEEE sequence. Plan: one day agg, one bounded single-series pass."""
    import pandas as pd

    daily = _daily_cents(spark, sf_dir)

    def rsi(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        c = pdf["c"].to_numpy()
        n = len(c)
        if n < 15:
            return pd.DataFrame(
                {"d": pd.Series([], dtype=str), "rsi": pd.Series([], dtype=float),
                 "avg_gain": pd.Series([], dtype=float),
                 "avg_loss": pd.Series([], dtype=float)}
            )
        g = [max(int(c[i]) - int(c[i - 1]), 0) for i in range(1, n)]
        l = [max(int(c[i - 1]) - int(c[i]), 0) for i in range(1, n)]
        ag, al = sum(g[:14]) / 14.0, sum(l[:14]) / 14.0
        rows = [(pdf["d"][14], ag, al)]
        for i in range(15, n):
            ag = (ag * 13.0 + g[i - 1]) / 14.0
            al = (al * 13.0 + l[i - 1]) / 14.0
            rows.append((pdf["d"][i], ag, al))
        out = pd.DataFrame(rows, columns=["d", "ag", "al"])
        out["rsi"] = [
            100.0 if a2 == 0.0 else 100.0 - 100.0 / (1.0 + a1 / a2)
            for a1, a2 in zip(out["ag"], out["al"])
        ]
        out["avg_gain"] = out["ag"]
        out["avg_loss"] = out["al"]
        return out[["d", "rsi", "avg_gain", "avg_loss"]]

    res = daily.withColumn("k", F.lit(1)).groupBy("k").applyInPandas(
        rsi, schema="d string, rsi double, avg_gain double, avg_loss double"
    )
    return res.select(
        "d", _pin(F.col("rsi")).alias("rsi"),
        _pin(F.col("avg_gain") / 100.0).alias("avg_gain"),
        _pin(F.col("avg_loss") / 100.0).alias("avg_loss"),
    ).orderBy("d")


# --- MACD (12/26 EMA + 9-EMA signal) with crossing flags ----------------------------------------
# Three coupled EMAs over daily cents (exact int -> double inputs),
# every alpha written as the same literal division on both engines
# (2.0/13.0, 2.0/27.0, 0.2/0.8). The crossing boolean compares RAW
# consecutive histogram values via a lag over the recursion output —
# engine-identical because the trajectories are.
_MACD_SQL = f"""
    WITH RECURSIVE daily AS ({_DAILY_SQL}),
    ser AS (SELECT d, CAST(c AS DOUBLE) AS x, row_number() OVER (ORDER BY d) AS i
            FROM daily),
    rec AS (
      SELECT i, x, x AS e12, x AS e26, 0.0 AS sig
      FROM ser WHERE i = 1
      UNION ALL
      SELECT s.i, s.x,
             (2.0 / 13.0) * s.x + (11.0 / 13.0) * r.e12,
             (2.0 / 27.0) * s.x + (25.0 / 27.0) * r.e26,
             0.2 * (((2.0 / 13.0) * s.x + (11.0 / 13.0) * r.e12)
                    - ((2.0 / 27.0) * s.x + (25.0 / 27.0) * r.e26)) + 0.8 * r.sig
      FROM rec r JOIN ser s ON s.i = r.i + 1),
    o AS (
      SELECT i, e12 - e26 AS macd, sig, (e12 - e26) - sig AS hist FROM rec)
    SELECT ser.d,
           floor(o.macd / 100.0 * 1000000 + 0.5) / 1000000 AS macd,
           floor(o.sig / 100.0 * 1000000 + 0.5) / 1000000 AS signal_line,
           floor(o.hist / 100.0 * 1000000 + 0.5) / 1000000 AS histogram,
           coalesce((o.hist > 0 AND lag(o.hist) OVER (ORDER BY o.i) <= 0)
                    OR (o.hist < 0 AND lag(o.hist) OVER (ORDER BY o.i) >= 0),
                    FALSE) AS crossed
    FROM o JOIN ser ON ser.i = o.i
    ORDER BY ser.d
"""


@pq("macd_signal_line", _MACD_SQL)
def macd_signal_line(spark, sf_dir):
    """MACD: fast/slow EMAs of daily revenue, the 9-period signal EMA
    of their difference, and histogram sign-crossing flags — three
    coupled recursions in one sequential pass (Arrow on the Spark side,
    a recursive CTE on the oracle side), alphas written as identical
    literal divisions so the trajectories agree bit-for-bit; the
    crossing boolean compares raw consecutive histogram values. Plan:
    one day agg, one bounded single-series pass, one lag window."""
    import pandas as pd

    daily = _daily_cents(spark, sf_dir)

    def macd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        xs = [float(v) for v in pdf["c"]]
        if not xs:
            return pd.DataFrame(
                {"d": pd.Series([], dtype=str), "macd": pd.Series([], dtype=float),
                 "sig": pd.Series([], dtype=float)}
            )
        e12, e26, sig = xs[0], xs[0], 0.0
        rows = [(pdf["d"][0], e12 - e26, sig)]
        for t in range(1, len(xs)):
            e12 = (2.0 / 13.0) * xs[t] + (11.0 / 13.0) * e12
            e26 = (2.0 / 27.0) * xs[t] + (25.0 / 27.0) * e26
            sig = 0.2 * (e12 - e26) + 0.8 * sig
            rows.append((pdf["d"][t], e12 - e26, sig))
        return pd.DataFrame(rows, columns=["d", "macd", "sig"])

    o = daily.withColumn("k", F.lit(1)).groupBy("k").applyInPandas(
        macd, schema="d string, macd double, sig double"
    )
    hist = F.col("macd") - F.col("sig")
    w = Window.orderBy("d")
    lagh = F.lag(hist).over(w)
    return o.select(
        "d",
        _pin(F.col("macd") / 100.0).alias("macd"),
        _pin(F.col("sig") / 100.0).alias("signal_line"),
        _pin(hist / 100.0).alias("histogram"),
        F.coalesce(
            ((hist > 0) & (lagh <= 0)) | ((hist < 0) & (lagh >= 0)), F.lit(False)
        ).alias("crossed"),
    ).orderBy("d")


# --- stochastic oscillator %K / %D --------------------------------------------------------------
# Rolling 14-day min/max are integer cents; %K is one integer-ratio
# double (flat window -> the fixed 50.0 convention), pre-rounded at
# 9dp so the 3-term %D average — written as an explicit left-assoc
# lag sum, never a frame aggregate — is order-free.
_STOCH_SQL = f"""
    WITH daily AS ({_DAILY_SQL}),
    w AS (
      SELECT d, c,
             min(c) OVER (ORDER BY d ROWS 13 PRECEDING) AS mn,
             max(c) OVER (ORDER BY d ROWS 13 PRECEDING) AS mx,
             row_number() OVER (ORDER BY d) AS rn
      FROM daily),
    k AS (
      SELECT d, rn,
             floor(CASE WHEN mx = mn THEN 50.0
                        ELSE 100.0 * (c - mn) / (mx - mn) END
                   * 1000000000 + 0.5) / 1000000000 AS pk
      FROM w WHERE rn >= 14)
    SELECT d, floor(pk * 1000000 + 0.5) / 1000000 AS pct_k,
           floor((pk + lag(pk, 1) OVER (ORDER BY d) + lag(pk, 2) OVER (ORDER BY d))
                 / 3.0 * 1000000 + 0.5) / 1000000 AS pct_d
    FROM k
    ORDER BY d
"""


@pq("stochastic_oscillator_kd", _STOCH_SQL)
def stochastic_oscillator_kd(spark, sf_dir):
    """Stochastic oscillator: %K from rolling 14-day integer min/max of
    daily revenue cents (flat window pinned to 50.0), pre-rounded at
    9dp; %D as the explicit (k + lag1 + lag2)/3 left-associated sum —
    fixed evaluation order, so no frame-aggregation order leaks in.
    Plan: one day agg + three ordered windows over the bounded series."""
    daily = _daily_cents(spark, sf_dir)
    w14 = Window.orderBy("d").rowsBetween(-13, 0)
    wr = Window.orderBy("d")
    w = daily.select(
        "d", "c",
        F.min("c").over(w14).alias("mn"),
        F.max("c").over(w14).alias("mx"),
        F.row_number().over(wr).alias("rn"),
    )
    pk_raw = F.when(F.col("mx") == F.col("mn"), 50.0).otherwise(
        100.0 * (F.col("c") - F.col("mn")) / (F.col("mx") - F.col("mn"))
    )
    k = w.filter(F.col("rn") >= 14).select(
        "d", (F.floor(pk_raw * 1_000_000_000 + F.lit(0.5)) / 1_000_000_000).alias("pk")
    )
    pd3 = (F.col("pk") + F.lag("pk", 1).over(wr) + F.lag("pk", 2).over(wr)) / 3.0
    return k.select(
        "d", _pin(F.col("pk")).alias("pct_k"), _pin(pd3).alias("pct_d")
    ).orderBy("d")


# --- on-balance volume over daily flows ---------------------------------------------------------
# OBV accumulates the day's event count signed by the revenue
# direction — integers end to end (sign, multiply, running sum).
_OBV_SQL = """
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS d,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS c,
             CAST(count(*) AS BIGINT) AS v
      FROM events GROUP BY 1),
    t AS (
      SELECT d, c, v,
             CASE WHEN c > lag(c) OVER (ORDER BY d) THEN v
                  WHEN c < lag(c) OVER (ORDER BY d) THEN -v
                  ELSE 0 END AS term
      FROM daily)
    SELECT d, CAST(c AS DOUBLE) / 100.0 AS revenue, v,
           CAST(sum(coalesce(term, 0)) OVER (ORDER BY d) AS BIGINT) AS obv
    FROM t ORDER BY d
"""


@pq("obv_daily_flow", _OBV_SQL)
def obv_daily_flow(spark, sf_dir):
    """On-balance volume: the running sum of daily event counts signed
    by the day-over-day revenue direction — integer window logic end to
    end (the OBV accumulation-pressure indicator). Plan: one day agg +
    two ordered windows over the calendar-bounded series."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("d")).agg(
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
        .cast("bigint").alias("c"),
        F.count("*").cast("bigint").alias("v"),
    )
    w = Window.orderBy("d")
    lc = F.lag("c").over(w)
    term = (
        F.when(F.col("c") > lc, F.col("v"))
        .when(F.col("c") < lc, -F.col("v"))
        .otherwise(0)
    )
    t = daily.select("d", "c", "v", term.alias("term"))
    return t.select(
        "d",
        (F.col("c").cast("double") / 100.0).alias("revenue"),
        "v",
        F.sum(F.coalesce("term", F.lit(0))).over(
            Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
        ).cast("bigint").alias("obv"),
    ).orderBy("d")


# --- Croston's method for intermittent demand ---------------------------------------------------
# Demand = daily signup counts per md5 user bucket (zero-filled grid,
# so zero-demand days genuinely occur at small SF). State (z = demand
# size EMA, p = inter-demand interval EMA, q = periods since demand)
# seeds at the first demand day (z = that demand, p = its index) and
# updates ONLY on demand days — the sequential recursion intermittent
# forecasting needs, run as one Arrow pass per bucket and replayed by
# a bucket-keyed recursive CTE. alpha = 0.2/0.8 (binary-exact).
_CROSTON_SQL = """
    WITH RECURSIVE cells AS (
      SELECT (CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR) || ':cro'), 1, 15))
               AS BIGINT) % 4) AS b,
             strftime(ts, '%Y-%m-%d') AS d, CAST(count(*) AS BIGINT) AS dem
      FROM events WHERE event_type = 'signup' GROUP BY 1, 2),
    days AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS d FROM events),
    bks AS (SELECT DISTINCT b FROM cells),
    grid AS (
      SELECT bks.b, days.d, coalesce(cells.dem, 0) AS dem
      FROM bks CROSS JOIN days
      LEFT JOIN cells ON cells.b = bks.b AND cells.d = days.d),
    ser AS (
      SELECT b, d, dem, row_number() OVER (PARTITION BY b ORDER BY d) AS i
      FROM grid),
    f AS (SELECT b, min(i) AS fi FROM ser WHERE dem > 0 GROUP BY b),
    rec AS (
      SELECT s.b, s.i, CAST(s.dem AS DOUBLE) AS z, CAST(f.fi AS DOUBLE) AS p,
             CAST(1 AS BIGINT) AS q
      FROM ser s JOIN f ON f.b = s.b AND s.i = f.fi
      UNION ALL
      SELECT r.b, r.i + 1,
             CASE WHEN s.dem > 0 THEN 0.2 * s.dem + 0.8 * r.z ELSE r.z END,
             CASE WHEN s.dem > 0 THEN 0.2 * r.q + 0.8 * r.p ELSE r.p END,
             CASE WHEN s.dem > 0 THEN CAST(1 AS BIGINT) ELSE r.q + 1 END
      FROM rec r JOIN ser s ON s.b = r.b AND s.i = r.i + 1),
    last AS (
      SELECT b, max(i) AS n FROM ser GROUP BY b),
    dd AS (SELECT b, CAST(count(*) AS BIGINT) AS demand_days FROM ser WHERE dem > 0 GROUP BY b)
    SELECT rec.b AS bucket, dd.demand_days,
           floor(rec.z * 1000000 + 0.5) / 1000000 AS size_ema,
           floor(rec.p * 1000000 + 0.5) / 1000000 AS interval_ema,
           floor(rec.z / rec.p * 1000000 + 0.5) / 1000000 AS forecast
    FROM rec JOIN last ON last.b = rec.b AND rec.i = last.n
    JOIN dd ON dd.b = rec.b
    ORDER BY rec.b
"""


@pq("croston_intermittent", _CROSTON_SQL)
def croston_intermittent(spark, sf_dir):
    """Croston's intermittent-demand forecast per md5 user bucket:
    EMAs of demand size and inter-demand interval updated only on
    demand days, seeded at the first demand (z = size, p = index). One
    Arrow pass per bucket on the zero-filled daily grid; the oracle
    replays the same state machine as a bucket-keyed recursive CTE.
    Plan: one day x bucket agg (bounded grid), series parallel across
    buckets, recursion bounded by the calendar."""
    import pandas as pd

    from etl_mini_spark.operators.sampling import hash_bucket

    e = _t(spark, sf_dir, "events")
    cells = (
        e.filter(F.col("event_type") == "signup")
        .select(
            hash_bucket(F.col("user_id"), salt="cro", buckets=4).alias("b"),
            F.date_format("ts", "yyyy-MM-dd").alias("d"),
        )
        .groupBy("b", "d")
        .agg(F.count("*").cast("bigint").alias("dem"))
    )
    days = e.select(F.date_format("ts", "yyyy-MM-dd").alias("d")).distinct()
    bks = cells.select("b").distinct()
    grid = (
        bks.crossJoin(days)
        .join(cells, ["b", "d"], "left")
        .select("b", "d", F.coalesce("dem", F.lit(0)).alias("dem"))
    )

    def croston(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        dem = [int(x) for x in pdf["dem"]]
        first = next((i for i, v in enumerate(dem) if v > 0), None)
        if first is None:
            return pd.DataFrame(
                {"b": pd.Series([], dtype="int64"),
                 "demand_days": pd.Series([], dtype="int64"),
                 "size_ema": pd.Series([], dtype=float),
                 "interval_ema": pd.Series([], dtype=float)}
            )
        z, p, q = float(dem[first]), float(first + 1), 1
        for t in range(first + 1, len(dem)):
            if dem[t] > 0:
                z = 0.2 * dem[t] + 0.8 * z
                p = 0.2 * q + 0.8 * p
                q = 1
            else:
                q += 1
        return pd.DataFrame(
            {"b": [int(pdf["b"][0])], "demand_days": [sum(1 for v in dem if v > 0)],
             "size_ema": [z], "interval_ema": [p]}
        )

    res = grid.groupBy("b").applyInPandas(
        croston, schema="b long, demand_days long, size_ema double, interval_ema double"
    )
    return res.select(
        F.col("b").alias("bucket"),
        "demand_days",
        _pin(F.col("size_ema")).alias("size_ema"),
        _pin(F.col("interval_ema")).alias("interval_ema"),
        _pin(F.col("size_ema") / F.col("interval_ema")).alias("forecast"),
    ).orderBy("bucket")


# --- damped-trend Holt smoothing ----------------------------------------------------------------
# holt_linear_trend's phi-damped sibling (phi = 0.9): the trend is
# damped both in the level update and in its own carry — the standard
# fix for runaway linear extrapolation. Identical IEEE sequence on
# both engines (0.9 is a shared literal; 0.5/0.3/0.7 as in holt).
_HDAMP_SQL = """
    WITH RECURSIVE daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS d,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2),
    ser AS (
      SELECT event_type, d, x,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS i
      FROM daily),
    rec AS (
      SELECT s1.event_type, CAST(1 AS BIGINT) AS i,
             s1.x AS l, s2.x - s1.x AS b, s1.x AS f
      FROM ser s1 JOIN ser s2
        ON s1.event_type = s2.event_type AND s1.i = 1 AND s2.i = 2
      UNION ALL
      SELECT r.event_type, r.i + 1,
             0.5 * s.x + 0.5 * (r.l + 0.9 * r.b),
             0.3 * ((0.5 * s.x + 0.5 * (r.l + 0.9 * r.b)) - r.l) + 0.7 * (0.9 * r.b),
             r.l + 0.9 * r.b
      FROM rec r JOIN ser s ON s.event_type = r.event_type AND s.i = r.i + 1)
    SELECT rec.event_type AS event_type, ser.d AS d,
           floor(rec.l * 1000000 + 0.5) / 1000000 AS level,
           floor(rec.b * 1000000 + 0.5) / 1000000 AS trend,
           floor(rec.f * 1000000 + 0.5) / 1000000 AS fitted
    FROM rec JOIN ser ON rec.event_type = ser.event_type AND rec.i = ser.i
    ORDER BY 1, 2
"""


@pq("holt_damped_trend", _HDAMP_SQL)
def holt_damped_trend(spark, sf_dir):
    """Phi-damped Holt smoothing (phi=0.9) of each event type's daily
    revenue — the damped-trend member of the exponential family
    (level update and trend carry both damp the trend), completing the
    holt_linear/holt_winters differential set. One Arrow pass per
    series key vs the recursive-CTE replay, identical IEEE sequence.
    Plan: one day agg, one shuffle on the series key, bounded
    per-series recursion."""
    import pandas as pd

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("d")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("x"))

    def holt_d(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        xs = pdf["x"].to_numpy()
        if len(xs) < 2:
            return pd.DataFrame(
                {"event_type": pd.Series([], dtype=str), "d": pd.Series([], dtype=str),
                 "level": pd.Series([], dtype=float), "trend": pd.Series([], dtype=float),
                 "fitted": pd.Series([], dtype=float)}
            )
        l = xs[0]
        b = xs[1] - xs[0]
        ls, bs, fs = [l], [b], [xs[0]]
        for t in range(1, len(xs)):
            f = l + 0.9 * b
            l_new = 0.5 * xs[t] + 0.5 * (l + 0.9 * b)
            b_new = 0.3 * (l_new - l) + 0.7 * (0.9 * b)
            l, b = l_new, b_new
            ls.append(l)
            bs.append(b)
            fs.append(f)
        return pd.DataFrame(
            {"event_type": pdf["event_type"], "d": pdf["d"],
             "level": ls, "trend": bs, "fitted": fs}
        )

    res = daily.groupBy("event_type").applyInPandas(
        holt_d,
        schema="event_type string, d string, level double, trend double, fitted double",
    )
    return res.select(
        "event_type", "d",
        _pin(F.col("level")).alias("level"),
        _pin(F.col("trend")).alias("trend"),
        _pin(F.col("fitted")).alias("fitted"),
    ).orderBy("event_type", "d")
