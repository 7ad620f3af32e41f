"""Round-9 staged tier: statistical inference / ML-evaluation depth,
corpus distribution tooling, and the data-engineering ops (DQ audits,
calendar spines, URL/IP parsing) an analytics engine runs daily.

Staged (module-local PENDING_QUERIES/PENDING_ORACLE, swept by
sweep_oracle.py alongside the registry) until registration rotates
them into the driver window — the same two-step rounds 7 and 8 used.

Float-parity rules extend FIXTURES.md §C with the round-9 refinement:
when a query SUMS libm-derived terms (ln/sqrt/pow), each term is
pre-rounded at 9dp AND cast to DECIMAL(28,9) before the sum, so the
total is exact decimal arithmetic — immune to accumulation order on
BOTH engines — and only then rounded for display. (round-8's psi
summed the rounded doubles directly; correct at 5 bins, but the
decimal sum removes the residual order sensitivity for good.)

Scale notes are per-query docstrings; the common themes:
- contingency/binned statistics are one hash-agg to a tiny cell grid,
  then driver-free scalar algebra — the 100-TB cost is the scan;
- every per-row ln/sqrt is a codegen'd Column expression, no UDFs
  anywhere in this tier except the Misra-Gries sketch, which is the
  point (a mergeable per-partition summary in Arrow batches);
- nothing here materializes pairs except item_item_cosine_topk, whose
  pair expansion is bounded by order size (≤12 lines/order in this
  schema; cap documented for heavy-tailed baskets).
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


# --- chi-square independence + Cramér's V ------------------------------------
# Contingency: event_type (5) × value band (8 fixed log-ish edges — fixed
# edges, not quantiles, so no rank-boundary flips between engines).
# Observed counts are BIGINT; each cell's (o−e)²/e term pre-rounds at
# 9dp and sums as DECIMAL(28,9), so chi2 is order-free exact.
_CHI2_SQL = """
    WITH c AS (
      SELECT event_type AS x,
             least(CAST(floor(value / 40) AS INT), 7) AS y,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2),
    t AS (
      SELECT x, y, o,
             sum(o) OVER (PARTITION BY x) AS rx,
             sum(o) OVER (PARTITION BY y) AS cy,
             sum(o) OVER () AS n
      FROM c),
    terms AS (
      SELECT n,
             CAST(round(pow(o - rx * cy / (1.0 * n), 2) / (rx * cy / (1.0 * n)), 9)
                  AS DECIMAL(28,9)) AS term
      FROM t),
    s AS (
      SELECT CAST(max(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_cells,
             sum(term) AS chi2_d
      FROM terms),
    dims AS (
      SELECT CAST(count(DISTINCT x) AS BIGINT) AS kx,
             CAST(count(DISTINCT y) AS BIGINT) AS ky
      FROM c)
    SELECT s.n, s.n_cells,
           CAST((dims.kx - 1) * (dims.ky - 1) AS BIGINT) AS dof,
           round(CAST(s.chi2_d AS DOUBLE), 6) AS chi2,
           round(sqrt(CAST(s.chi2_d AS DOUBLE)
                      / (s.n * least(dims.kx - 1, dims.ky - 1))), 6) AS cramers_v
    FROM s CROSS JOIN dims
"""


@pq("chi_square_cramers_v", _CHI2_SQL)
def chi_square_cramers_v(spark, sf_dir):
    """Pearson chi-square test of independence between event_type and
    a fixed-edge value band, plus Cramér's V effect size — the first
    question any feature audit asks of two categoricals. Expected
    counts come from the margins (r·c/n); each cell's (o−e)²/e term is
    pre-rounded at 9dp and summed as DECIMAL(28,9), so the statistic
    is exact regardless of accumulation order. Plan: one hash-agg to a
    ≤40-cell grid, margin windows over those 40 rows, one scalar
    finish — at 100 TB the corpus scan is the entire cost; the cell
    grid is constant-size."""
    e = _t(spark, sf_dir, "events")
    c = e.groupBy(
        F.col("event_type").alias("x"),
        F.least(F.floor(F.col("value") / 40).cast("int"), F.lit(7)).alias("y"),
    ).agg(F.count("*").cast("bigint").alias("o"))
    t = c.select(
        "x", "y", "o",
        F.sum("o").over(Window.partitionBy("x")).alias("rx"),
        F.sum("o").over(Window.partitionBy("y")).alias("cy"),
        F.sum("o").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    terms = t.select(
        "n",
        F.round(
            F.pow(F.col("o") - F.col("rx") * F.col("cy") / (1.0 * F.col("n")), 2)
            / (F.col("rx") * F.col("cy") / (1.0 * F.col("n"))),
            9,
        ).cast("decimal(28,9)").alias("term"),
    )
    s = terms.agg(
        F.max("n").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_cells"),
        F.sum("term").alias("chi2_d"),
    )
    dims = c.agg(
        F.countDistinct("x").cast("bigint").alias("kx"),
        F.countDistinct("y").cast("bigint").alias("ky"),
    )
    return s.crossJoin(F.broadcast(dims)).select(
        "n",
        "n_cells",
        ((F.col("kx") - 1) * (F.col("ky") - 1)).cast("bigint").alias("dof"),
        F.round(F.col("chi2_d").cast("double"), 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2_d").cast("double")
                / (F.col("n") * F.least(F.col("kx") - 1, F.col("ky") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# --- mutual information of two discrete columns -------------------------------
# MI (nats) = Σ_xy (o/n)·ln(o·n/(rx·cy)); per-cell terms pre-round 9dp,
# decimal sum. Entropies use the same trick, so NMI = MI/min(H) is a
# ratio of exact decimals with one double division at the end.
_MI_SQL = """
    WITH c AS (
      SELECT event_type AS x,
             least(CAST(floor(value / 40) AS INT), 7) AS y,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2),
    t AS (
      SELECT x, y, o,
             sum(o) OVER (PARTITION BY x) AS rx,
             sum(o) OVER (PARTITION BY y) AS cy,
             sum(o) OVER () AS n
      FROM c),
    mi AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
             sum(CAST(round((o / (1.0 * n)) * ln(o * 1.0 * n / (rx * 1.0 * cy)), 9)
                      AS DECIMAL(28,9))) AS mi_d
      FROM t),
    hx AS (
      SELECT sum(CAST(round(-(rx / (1.0 * n)) * ln(rx / (1.0 * n)), 9)
                      AS DECIMAL(28,9))) AS h_x
      FROM (SELECT DISTINCT x, rx, n FROM t)),
    hy AS (
      SELECT sum(CAST(round(-(cy / (1.0 * n)) * ln(cy / (1.0 * n)), 9)
                      AS DECIMAL(28,9))) AS h_y
      FROM (SELECT DISTINCT y, cy, n FROM t))
    SELECT mi.n,
           round(CAST(mi.mi_d AS DOUBLE), 6) AS mi_nats,
           round(CAST(hx.h_x AS DOUBLE), 6) AS h_x,
           round(CAST(hy.h_y AS DOUBLE), 6) AS h_y,
           round(CAST(mi.mi_d AS DOUBLE)
                 / least(CAST(hx.h_x AS DOUBLE), CAST(hy.h_y AS DOUBLE)), 6) AS nmi
    FROM mi CROSS JOIN hx CROSS JOIN hy
"""


@pq("mutual_information_discrete", _MI_SQL)
def mutual_information_discrete(spark, sf_dir):
    """Mutual information (nats) between event_type and the fixed-edge
    value band, with marginal entropies and the min-entropy-normalized
    NMI — the feature-selection screen chi-square can't provide (MI
    sees nonlinear association). Identical contingency plan to
    chi_square_cramers_v: one hash-agg to the cell grid, margin
    windows over ≤40 rows, per-cell ln terms pre-rounded at 9dp and
    summed as DECIMAL(28,9). 100-TB cost = the one scan."""
    e = _t(spark, sf_dir, "events")
    c = e.groupBy(
        F.col("event_type").alias("x"),
        F.least(F.floor(F.col("value") / 40).cast("int"), F.lit(7)).alias("y"),
    ).agg(F.count("*").cast("bigint").alias("o"))
    t = c.select(
        "x", "y", "o",
        F.sum("o").over(Window.partitionBy("x")).alias("rx"),
        F.sum("o").over(Window.partitionBy("y")).alias("cy"),
        F.sum("o").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    mi = t.agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(
            F.round(
                (F.col("o") / (1.0 * F.col("n")))
                * F.log(F.col("o") * 1.0 * F.col("n") / (F.col("rx") * 1.0 * F.col("cy"))),
                9,
            ).cast("decimal(28,9)")
        ).alias("mi_d"),
    )
    hx = (
        t.select("x", "rx", "n").distinct()
        .agg(
            F.sum(
                F.round(
                    -(F.col("rx") / (1.0 * F.col("n")))
                    * F.log(F.col("rx") / (1.0 * F.col("n"))),
                    9,
                ).cast("decimal(28,9)")
            ).alias("h_x")
        )
    )
    hy = (
        t.select("y", "cy", "n").distinct()
        .agg(
            F.sum(
                F.round(
                    -(F.col("cy") / (1.0 * F.col("n")))
                    * F.log(F.col("cy") / (1.0 * F.col("n"))),
                    9,
                ).cast("decimal(28,9)")
            ).alias("h_y")
        )
    )
    return mi.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy)).select(
        "n",
        F.round(F.col("mi_d").cast("double"), 6).alias("mi_nats"),
        F.round(F.col("h_x").cast("double"), 6).alias("h_x"),
        F.round(F.col("h_y").cast("double"), 6).alias("h_y"),
        F.round(
            F.col("mi_d").cast("double")
            / F.least(F.col("h_x").cast("double"), F.col("h_y").cast("double")),
            6,
        ).alias("nmi"),
    )


# --- Gini coefficient of customer revenue -------------------------------------
# Gini = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over revenues sorted asc
# (ties broken by custkey). Revenues are DECIMAL(18,2) sums; i·x_i is
# BIGINT×DECIMAL — exact — so the numerator never floats.
_GINI_SQL = """
    WITH rev AS (
      SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS r
      FROM orders GROUP BY o_custkey),
    ranked AS (
      SELECT r, row_number() OVER (ORDER BY r, o_custkey) AS i FROM rev),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(r) AS tot,
             sum(i * r) AS weighted
      FROM ranked)
    SELECT n, round(CAST(tot AS DOUBLE), 2) AS total_rev,
           round((2.0 * CAST(weighted AS DOUBLE) - (n + 1) * CAST(tot AS DOUBLE))
                 / (n * CAST(tot AS DOUBLE)), 6) AS gini
    FROM s
"""


@pq("gini_lorenz", _GINI_SQL)
def gini_lorenz(spark, sf_dir):
    """Gini concentration coefficient of per-customer order revenue —
    the inequality scalar behind every whale-dependence dashboard
    (pareto_revenue_curve draws the Lorenz curve; this is its area
    statistic). Uses the rank identity Gini = (2Σi·x_(i) − (n+1)Σx)
    / (nΣx): revenues sum as DECIMAL(18,2), i·x stays decimal-exact,
    and only the final ratio is a double. Plan: one keyed agg, one
    global rank (range-partitioned two-pass prefix counts at scale —
    the budget_cap shape), one 1-row aggregate."""
    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r")
    )
    ranked = rev.select(
        "r", F.row_number().over(Window.orderBy("r", "o_custkey")).alias("i")
    )
    s = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("r").alias("tot"),
        F.sum(F.col("i") * F.col("r")).alias("weighted"),
    )
    return s.select(
        "n",
        F.round(F.col("tot").cast("double"), 2).alias("total_rev"),
        F.round(
            (2.0 * F.col("weighted").cast("double") - (F.col("n") + 1) * F.col("tot").cast("double"))
            / (F.col("n") * F.col("tot").cast("double")),
            6,
        ).alias("gini"),
    )


# --- Herfindahl-Hirschman concentration by region ------------------------------
# Supplier revenue shares within each region; HHI = Σ share² with the
# 9dp-round + decimal-sum rule. Shares are ratios of DECIMAL sums.
_HHI_SQL = """
    WITH rev AS (
      SELECT n.n_regionkey, s.s_nationkey,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS r
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2),
    shares AS (
      SELECT n_regionkey, r,
             sum(r) OVER (PARTITION BY n_regionkey) AS tot
      FROM rev),
    terms AS (
      SELECT n_regionkey,
             CAST(round(pow(CAST(r AS DOUBLE) / CAST(tot AS DOUBLE), 2), 9)
                  AS DECIMAL(28,9)) AS t2,
             CAST(r AS DOUBLE) / CAST(tot AS DOUBLE) AS share
      FROM shares)
    SELECT rg.r_name,
           CAST(count(*) AS BIGINT) AS n_nations,
           round(CAST(sum(t2) AS DOUBLE), 6) AS hhi,
           round(max(share), 6) AS top_share
    FROM terms JOIN region rg ON terms.n_regionkey = rg.r_regionkey
    GROUP BY rg.r_name
    ORDER BY rg.r_name
"""


@pq("herfindahl_concentration", _HHI_SQL)
def herfindahl_concentration(spark, sf_dir):
    """Herfindahl-Hirschman index of supplier-nation revenue
    concentration within each region — the market-concentration
    measure (HHI→1 means one nation owns the region's supply). Revenue
    sums are DECIMAL; each squared share pre-rounds at 9dp and sums as
    DECIMAL(28,9) per region. Plan: one fact-side keyed agg (suppkey
    is the shuffle key; supplier/nation/region dims broadcast), a
    25-row share window, a 5-row finish."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    rg = _t(spark, sf_dir, "region")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "s_nationkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("r"))
    )
    shares = rev.select(
        "n_regionkey",
        "r",
        F.sum("r").over(Window.partitionBy("n_regionkey")).alias("tot"),
    )
    terms = shares.select(
        "n_regionkey",
        F.round(
            F.pow(F.col("r").cast("double") / F.col("tot").cast("double"), 2), 9
        ).cast("decimal(28,9)").alias("t2"),
        (F.col("r").cast("double") / F.col("tot").cast("double")).alias("share"),
    )
    return (
        terms.join(F.broadcast(rg), terms.n_regionkey == rg.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").cast("bigint").alias("n_nations"),
            F.round(F.sum("t2").cast("double"), 6).alias("hhi"),
            F.round(F.max("share"), 6).alias("top_share"),
        )
        .orderBy("r_name")
    )


# --- Wilson score intervals for daily conversion -------------------------------
# Conversion = purchases / (purchases + views) per day; the Wilson 95%
# interval (z = 1.96) is the rate CI that behaves at small n and
# extreme rates. Counts are BIGINT; the interval is per-row double
# algebra (sqrt), deterministic — no cross-row float accumulation.
_WILSON_SQL = """
    WITH d AS (
      SELECT strftime(ts, '%Y-%m-%d') AS d,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS k,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type IN ('purchase', 'view')
      GROUP BY 1)
    SELECT d, k, n,
           round(k / (1.0 * n), 6) AS rate,
           round((k / (1.0 * n) + 1.96 * 1.96 / (2.0 * n)
                  - 1.96 * sqrt((k / (1.0 * n)) * (1 - k / (1.0 * n)) / n
                                + 1.96 * 1.96 / (4.0 * n * n)))
                 / (1 + 1.96 * 1.96 / n), 6) AS wilson_lo,
           round((k / (1.0 * n) + 1.96 * 1.96 / (2.0 * n)
                  + 1.96 * sqrt((k / (1.0 * n)) * (1 - k / (1.0 * n)) / n
                                + 1.96 * 1.96 / (4.0 * n * n)))
                 / (1 + 1.96 * 1.96 / n), 6) AS wilson_hi
    FROM d ORDER BY d
"""


@pq("wilson_ci_rates", _WILSON_SQL)
def wilson_ci_rates(spark, sf_dir):
    """Daily purchase-vs-view conversion rate with its Wilson 95%
    score interval — the binomial CI that stays inside [0,1] and
    doesn't collapse at k=0 or k=n, which is what rate dashboards
    should plot instead of ±1.96·√(p̂q̂/n). Counts are exact BIGINT per
    day; the interval is per-row closed-form double algebra (one sqrt,
    no cross-row accumulation). Plan: one day-keyed agg, ~30 output
    rows regardless of corpus size."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type").isin("purchase", "view"))
    d = e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
        F.count("*").cast("bigint").alias("n"),
    )
    p = F.col("k") / (1.0 * F.col("n"))
    z2 = 1.96 * 1.96
    center = p + z2 / (2.0 * F.col("n"))
    margin = 1.96 * F.sqrt(p * (1 - p) / F.col("n") + z2 / (4.0 * F.col("n") * F.col("n")))
    denom = 1 + z2 / F.col("n")
    return d.select(
        "d",
        "k",
        "n",
        F.round(p, 6).alias("rate"),
        F.round((center - margin) / denom, 6).alias("wilson_lo"),
        F.round((center + margin) / denom, 6).alias("wilson_hi"),
    ).orderBy("d")


# --- autocorrelation of the hourly value series --------------------------------
# Series: hourly sums of value as DECIMAL(18,2) (exact). For lag k the
# paired sample joins hour h with h−k (co-observed hours only); all
# five sufficient statistics (Σx, Σy, Σxy, Σx², Σy², n) are decimal-
# exact, and Pearson r is one double formula per lag.
_ACF_SQL = """
    WITH hourly AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
             sum(CAST(value AS DECIMAL(18,2))) AS x
      FROM events GROUP BY 1),
    lags AS (SELECT unnest([1, 2, 3, 24]) AS lag),
    paired AS (
      SELECT l.lag, a.x AS x, b.x AS y
      FROM lags l
      JOIN hourly a ON TRUE
      JOIN hourly b ON b.h = a.h - l.lag),
    s AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
             sum(x) AS sx, sum(y) AS sy,
             sum(CAST(x AS DECIMAL(38,4)) * y) AS sxy,
             sum(CAST(x AS DECIMAL(38,4)) * x) AS sxx,
             sum(CAST(y AS DECIMAL(38,4)) * y) AS syy
      FROM paired GROUP BY lag)
    SELECT lag, n_pairs,
           round((n_pairs * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((n_pairs * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (n_pairs * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) AS acf
    FROM s ORDER BY lag
"""


@pq("acf_hourly_lags", _ACF_SQL)
def acf_hourly_lags(spark, sf_dir):
    """Sample autocorrelation of the hourly revenue series at lags
    1/2/3/24 (lag 24 = the daily-seasonality check) — computed as the
    Pearson correlation of the lag-paired series over co-observed
    hours. The hourly sums are DECIMAL(18,2) (exact), the five
    sufficient statistics per lag are decimal products/sums (exact),
    and each r is one double formula. Plan: one hour-keyed agg
    (bounded: 8,760 rows per year regardless of corpus size), then a
    4×|hours| lag join on the TINY aggregated series — the raw corpus
    is never joined."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("h")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("x"))
    lags = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(24))).alias("lag")
    )
    a = hourly.alias("a")
    b = hourly.alias("b")
    paired = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("b.h") == F.col("a.h") - F.col("lag"))
        .select("lag", F.col("a.x").alias("x"), F.col("b.x").alias("y"))
    )
    s = paired.groupBy("lag").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,4)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,4)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,4)") * F.col("y")).alias("syy"),
    )
    return s.select(
        "lag",
        "n_pairs",
        F.round(
            (
                F.col("n_pairs") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / F.sqrt(
                (
                    F.col("n_pairs") * F.col("sxx").cast("double")
                    - F.col("sx").cast("double") * F.col("sx").cast("double")
                )
                * (
                    F.col("n_pairs") * F.col("syy").cast("double")
                    - F.col("sy").cast("double") * F.col("sy").cast("double")
                )
            ),
            6,
        ).alias("acf"),
    ).orderBy("lag")


# --- exact PR AUC (average precision) ------------------------------------------
# Same planted score as roc_auc_exact. Step-wise AP = Σ_k ΔR_k · P_k
# over distinct scores descending: tp/fp are integer cumsums, each
# threshold's term is one double op pre-rounded at 9dp, and the sum is
# DECIMAL(28,9) — order-free.
_PRAUC_SQL = """
    WITH s AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             value + CASE WHEN event_type = 'purchase' THEN 25.0 ELSE 0.0 END AS score
      FROM events WHERE event_type IN ('purchase', 'view')),
    per AS (
      SELECT score, CAST(sum(y) AS BIGINT) AS pos_c,
             CAST(count(*) - sum(y) AS BIGINT) AS neg_c
      FROM s GROUP BY score),
    c AS (
      SELECT sum(pos_c) OVER (ORDER BY score DESC) AS tp,
             sum(neg_c) OVER (ORDER BY score DESC) AS fp,
             pos_c,
             sum(pos_c) OVER () AS n_pos, sum(neg_c) OVER () AS n_neg
      FROM per),
    terms AS (
      SELECT n_pos, n_neg,
             CAST(round((pos_c / (1.0 * n_pos)) * (tp / (1.0 * (tp + fp))), 9)
                  AS DECIMAL(28,9)) AS term
      FROM c)
    SELECT CAST(max(n_pos) AS BIGINT) AS n_pos, CAST(max(n_neg) AS BIGINT) AS n_neg,
           round(CAST(max(n_pos) AS DOUBLE) / (max(n_pos) + max(n_neg)), 6) AS prevalence,
           round(CAST(sum(term) AS DOUBLE), 6) AS pr_auc
    FROM terms
"""


@pq("pr_auc_exact", _PRAUC_SQL)
def pr_auc_exact(spark, sf_dir):
    """Exact precision-recall AUC (average precision) for the planted
    purchase-vs-view score — the ranking metric that matters when
    positives are rare and ROC AUC flatters. AP = Σ ΔR·P over distinct
    score thresholds descending: tp/fp are BIGINT prefix sums, each
    threshold term is one double expression pre-rounded at 9dp, and
    the total accumulates as DECIMAL(28,9). Plan: one score-keyed agg,
    one ordered prefix sum over distinct scores (range-partitioned
    two-pass cumsum at scale), one scalar finish — no per-pair work."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type").isin("purchase", "view"))
    s = e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        (
            F.col("value")
            + F.when(F.col("event_type") == "purchase", F.lit(25.0)).otherwise(F.lit(0.0))
        ).alias("score"),
    )
    per = s.groupBy("score").agg(
        F.sum("y").cast("bigint").alias("pos_c"),
        (F.count("*") - F.sum("y")).cast("bigint").alias("neg_c"),
    )
    wd = Window.orderBy(F.col("score").desc()).rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    c = per.select(
        F.sum("pos_c").over(wd).alias("tp"),
        F.sum("neg_c").over(wd).alias("fp"),
        "pos_c",
        F.sum("pos_c").over(wall).alias("n_pos"),
        F.sum("neg_c").over(wall).alias("n_neg"),
    )
    terms = c.select(
        "n_pos",
        "n_neg",
        F.round(
            (F.col("pos_c") / (1.0 * F.col("n_pos")))
            * (F.col("tp") / (1.0 * (F.col("tp") + F.col("fp")))),
            9,
        ).cast("decimal(28,9)").alias("term"),
    )
    return terms.agg(
        F.max("n_pos").cast("bigint").alias("n_pos"),
        F.max("n_neg").cast("bigint").alias("n_neg"),
        F.round(
            F.max("n_pos").cast("double") / (F.max("n_pos") + F.max("n_neg")), 6
        ).alias("prevalence"),
        F.round(F.sum("term").cast("double"), 6).alias("pr_auc"),
    )


# --- Brier score + reliability bins in integer milli-probability ---------------
# The synthetic predictor emits p in MILLI-units: a hash-spread base in
# [0,700) plus a +300 boost for actual purchases, so it is informative
# but miscalibrated — exactly what a reliability table should expose.
# (p_milli − 1000·y)² is BIGINT; every reported figure is a ratio of
# exact integers with one double division, rounded once.
_BRIER_SQL = """
    WITH s AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             (CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR) || ':p9'), 1, 15))
                   AS BIGINT) % 700)
             + CASE WHEN event_type = 'purchase' THEN 300 ELSE 0 END AS p_milli
      FROM events WHERE event_type IN ('purchase', 'view')),
    b AS (
      SELECT CAST(floor(p_milli / 100) AS INT) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(p_milli) AS BIGINT) AS sum_p,
             CAST(sum((p_milli - 1000 * y) * (p_milli - 1000 * y)) AS BIGINT) AS sq
      FROM s GROUP BY 1),
    t AS (SELECT CAST(sum(sq) AS BIGINT) AS sq_tot, CAST(sum(n) AS BIGINT) AS n_tot FROM b)
    SELECT bin, n, n_pos,
           round(sum_p / (1000.0 * n), 6) AS mean_pred,
           round(n_pos / (1.0 * n), 6) AS obs_rate,
           round(t.sq_tot / (1000000.0 * t.n_tot), 6) AS brier_total
    FROM b CROSS JOIN t
    ORDER BY bin
"""


@pq("brier_calibration_bins", _BRIER_SQL)
def brier_calibration_bins(spark, sf_dir):
    """Brier score with a 10-bin reliability (calibration) table for a
    deterministic synthetic predictor — mean predicted probability vs
    observed rate per bin, plus the overall Brier. The predictor works
    in integer MILLI-probability (hash base < 0.7 plus +0.3 for true
    positives), so (p−y)² is exact BIGINT end-to-end and the only
    float op is the final display division: the entire metric is
    engine-exact by construction, not by rounding. Plan: one narrow
    projection, one 10-cell hash-agg, a broadcast 1-row total."""
    from etl_mini_spark.operators.sampling import hash_bucket

    e = _t(spark, sf_dir, "events").filter(F.col("event_type").isin("purchase", "view"))
    s = e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        (
            hash_bucket(F.col("event_id"), "p9", 700)
            + F.when(F.col("event_type") == "purchase", 300).otherwise(0)
        ).alias("p_milli"),
    )
    b = s.groupBy(F.floor(F.col("p_milli") / 100).cast("int").alias("bin")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum("p_milli").cast("bigint").alias("sum_p"),
        F.sum(
            (F.col("p_milli") - 1000 * F.col("y")) * (F.col("p_milli") - 1000 * F.col("y"))
        ).cast("bigint").alias("sq"),
    )
    t = b.agg(
        F.sum("sq").cast("bigint").alias("sq_tot"), F.sum("n").cast("bigint").alias("n_tot")
    )
    return (
        b.crossJoin(F.broadcast(t))
        .select(
            "bin",
            "n",
            "n_pos",
            F.round(F.col("sum_p") / (1000.0 * F.col("n")), 6).alias("mean_pred"),
            F.round(F.col("n_pos") / (1.0 * F.col("n")), 6).alias("obs_rate"),
            F.round(F.col("sq_tot") / (1000000.0 * F.col("n_tot")), 6).alias("brier_total"),
        )
        .orderBy("bin")
    )


# --- Weight of Evidence + Information Value ------------------------------------
# Fixed value bands vs the purchase label, +0.5 Laplace smoothing so
# empty cells stay finite. WoE is per-row (safe double); the IV total
# is the 9dp-round → DECIMAL(28,9) window sum.
_WOE_SQL = """
    WITH s AS (
      SELECT least(CAST(floor(value / 40) AS INT), 7) AS bin,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE event_type IN ('purchase', 'view')),
    b AS (
      SELECT bin, CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(count(*) - sum(y) AS BIGINT) AS n_neg
      FROM s GROUP BY bin),
    t AS (
      SELECT bin, n_pos, n_neg,
             (n_pos + 0.5) / (sum(n_pos) OVER () + 4.0) AS dp,
             (n_neg + 0.5) / (sum(n_neg) OVER () + 4.0) AS dn
      FROM b),
    w AS (
      SELECT bin, n_pos, n_neg,
             round(ln(dp / dn), 6) AS woe,
             CAST(round((dp - dn) * ln(dp / dn), 9) AS DECIMAL(28,9)) AS iv_term
      FROM t)
    SELECT bin, n_pos, n_neg, woe,
           round(CAST(sum(iv_term) OVER () AS DOUBLE), 6) AS iv_total
    FROM w ORDER BY bin
"""


@pq("woe_iv_binning", _WOE_SQL)
def woe_iv_binning(spark, sf_dir):
    """Weight-of-Evidence encoding of the fixed-edge value bands
    against the purchase label, with the Information Value total — the
    credit-scoring-style predictive-power screen for a binned feature.
    Laplace +0.5 smoothing keeps empty bins finite; WoE is a per-row
    ln (safe, rounded once); the IV total pre-rounds each (dp−dn)·WoE
    term at 9dp and window-sums as DECIMAL(28,9). Plan: one hash-agg
    to ≤8 bins, windows over those 8 rows — scan-bound at any scale."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type").isin("purchase", "view"))
    s = e.select(
        F.least(F.floor(F.col("value") / 40).cast("int"), F.lit(7)).alias("bin"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    b = s.groupBy("bin").agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        (F.count("*") - F.sum("y")).cast("bigint").alias("n_neg"),
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t = b.select(
        "bin",
        "n_pos",
        "n_neg",
        ((F.col("n_pos") + 0.5) / (F.sum("n_pos").over(wall) + 4.0)).alias("dp"),
        ((F.col("n_neg") + 0.5) / (F.sum("n_neg").over(wall) + 4.0)).alias("dn"),
    )
    w = t.select(
        "bin",
        "n_pos",
        "n_neg",
        F.round(F.log(F.col("dp") / F.col("dn")), 6).alias("woe"),
        F.round((F.col("dp") - F.col("dn")) * F.log(F.col("dp") / F.col("dn")), 9)
        .cast("decimal(28,9)")
        .alias("iv_term"),
    )
    return w.select(
        "bin",
        "n_pos",
        "n_neg",
        "woe",
        F.round(F.sum("iv_term").over(wall).cast("double"), 6).alias("iv_total"),
    ).orderBy("bin")


# --- stratified k-fold assignment audit ----------------------------------------
# fold = md5-bucket(event_id) % 5 — the registry's engine-portable
# uniform, so folds are identical under any partitioning. The audit
# reports per-fold size, positive rate, and deviation from the mean
# fold size (the balance check a CV split must pass).
_KFOLD_SQL = """
    WITH s AS (
      SELECT (CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR) || ':kf9'), 1, 15))
                   AS BIGINT) % 100000) % 5 AS fold,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE event_type IN ('purchase', 'view')),
    b AS (
      SELECT fold, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos
      FROM s GROUP BY fold)
    SELECT CAST(fold AS INT) AS fold, n, n_pos,
           round(n_pos / (1.0 * n), 6) AS pos_rate,
           round(n / (sum(n) OVER () / 5.0) - 1, 6) AS size_dev
    FROM b ORDER BY fold
"""


@pq("stratified_kfold_assign", _KFOLD_SQL)
def stratified_kfold_assign(spark, sf_dir):
    """Deterministic 5-fold cross-validation assignment with its
    balance audit: fold membership is the md5-bucket uniform on
    event_id (identical on any engine/partitioning — a CV contract,
    unlike seed-and-partition-dependent randomSplit), and the output
    verifies what CV needs: near-equal fold sizes and near-equal
    positive rates. Plan: one narrow projection + one 5-cell hash-agg;
    the fold column never shuffles the corpus."""
    from etl_mini_spark.operators.sampling import hash_bucket

    e = _t(spark, sf_dir, "events").filter(F.col("event_type").isin("purchase", "view"))
    s = e.select(
        (hash_bucket(F.col("event_id"), "kf9") % 5).alias("fold"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    b = s.groupBy("fold").agg(
        F.count("*").cast("bigint").alias("n"), F.sum("y").cast("bigint").alias("n_pos")
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return b.select(
        F.col("fold").cast("int").alias("fold"),
        "n",
        "n_pos",
        F.round(F.col("n_pos") / (1.0 * F.col("n")), 6).alias("pos_rate"),
        F.round(F.col("n") / (F.sum("n").over(wall) / 5.0) - 1, 6).alias("size_dev"),
    ).orderBy("fold")


# --- unigram^0.75 negative-sampling table --------------------------------------
# The word2vec-style sampling distribution: freq^0.75 normalized, with
# cumulative bucket bounds (the inversion table a sampler walks).
# pow terms pre-round at 9dp, DECIMAL(28,9) prefix sums.
_UNIGRAM_SQL = """
    WITH tok AS (
      SELECT unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS t
      FROM documents),
    f AS (SELECT t, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY t),
    w AS (
      SELECT t, freq,
             CAST(round(pow(freq, 0.75), 9) AS DECIMAL(28,9)) AS w
      FROM f),
    c AS (
      SELECT t, freq, w,
             sum(w) OVER (ORDER BY freq DESC, t) AS cum_w,
             sum(w) OVER () AS tot
      FROM w)
    SELECT t, freq,
           round(CAST(w AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS prob,
           round(CAST(cum_w AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cum_hi
    FROM c ORDER BY freq DESC, t
"""


@pq("unigram_sampling_table", _UNIGRAM_SQL)
def unigram_sampling_table(spark, sf_dir):
    """The word2vec negative-sampling table: token frequency smoothed
    by the canonical ^0.75, normalized, with cumulative upper bounds —
    the inversion table a sampler binary-searches with a uniform draw.
    pow terms pre-round at 9dp and prefix-sum as DECIMAL(28,9), so
    probabilities and bounds are identical across engines. Plan: one
    token-count agg (the corpus scan), then windows over |vocab| rows —
    vocabulary is tiny relative to tokens at any scale."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")
    f = d.select(F.explode(toks).alias("t")).groupBy("t").agg(
        F.count("*").cast("bigint").alias("freq")
    )
    w = f.select(
        "t", "freq", F.round(F.pow("freq", 0.75), 9).cast("decimal(28,9)").alias("w")
    )
    wc = Window.orderBy(F.col("freq").desc(), "t").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    c = w.select(
        "t", "freq", "w",
        F.sum("w").over(wc).alias("cum_w"),
        F.sum("w").over(wall).alias("tot"),
    )
    return c.select(
        "t",
        "freq",
        F.round(F.col("w").cast("double") / F.col("tot").cast("double"), 6).alias("prob"),
        F.round(F.col("cum_w").cast("double") / F.col("tot").cast("double"), 6).alias("cum_hi"),
    ).orderBy(F.col("freq").desc(), "t")


# --- PMI-scored adjacent bigrams ------------------------------------------------
# PMI = ln((c12/Nb) / ((c1/Nu)(c2/Nu))) over ADJACENT token pairs.
# All counts are exact integers; PMI is a per-row ln of an
# integer-ratio expression (no cross-row float accumulation), so no
# top-k rank depends on a float: the full c12 >= 5 set is returned.
_PMI_SQL = """
    WITH toks AS (
      SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS l
      FROM documents),
    uni AS (
      SELECT t, CAST(count(*) AS BIGINT) AS c1
      FROM (SELECT unnest(l) AS t FROM toks) GROUP BY t),
    nu AS (SELECT CAST(sum(c1) AS BIGINT) AS n_uni FROM uni),
    bi AS (
      SELECT t1, t2, CAST(count(*) AS BIGINT) AS c12
      FROM (SELECT unnest(l[1:len(l)-1]) AS t1, unnest(l[2:len(l)]) AS t2 FROM toks)
      GROUP BY t1, t2),
    nb AS (SELECT CAST(sum(c12) AS BIGINT) AS n_bi FROM bi)
    SELECT b.t1, b.t2, b.c12,
           round(ln((b.c12 / (1.0 * nb.n_bi))
                    / ((u1.c1 / (1.0 * nu.n_uni)) * (u2.c1 / (1.0 * nu.n_uni)))), 6) AS pmi
    FROM bi b
    JOIN uni u1 ON b.t1 = u1.t
    JOIN uni u2 ON b.t2 = u2.t
    CROSS JOIN nu CROSS JOIN nb
    WHERE b.c12 >= 5
    ORDER BY b.t1, b.t2
"""


@pq("token_pmi_bigrams", _PMI_SQL)
def token_pmi_bigrams(spark, sf_dir):
    """Pointwise mutual information of adjacent token bigrams — the
    collocation detector (PMI >> 0 means the pair co-occurs far above
    chance; it's how phrase vocabularies for tokenizers get mined).
    Bigrams come from zipping each token array with its tail (narrow,
    in-row), unigram and bigram counts are exact BIGINTs, and PMI is a
    single per-row ln of their ratio — no float accumulates, no top-k
    rank rides on a float: every pair with c12 >= 5 is returned. Plan:
    two token-keyed aggs (the corpus scans) and two broadcast joins of
    the tiny vocab onto the bigram table."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ").alias("l"),
    )
    uni = (
        toks.select(F.explode("l").alias("t"))
        .groupBy("t")
        .agg(F.count("*").cast("bigint").alias("c1"))
    )
    nu = uni.agg(F.sum("c1").cast("bigint").alias("n_uni"))
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("l"), 1, F.size("l") - 1),
                F.slice(F.col("l"), 2, F.size("l") - 1),
            )
        ).alias("p")
    ).select(F.col("p.0").alias("t1"), F.col("p.1").alias("t2"))
    bi = pairs.groupBy("t1", "t2").agg(F.count("*").cast("bigint").alias("c12"))
    nb = bi.agg(F.sum("c12").cast("bigint").alias("n_bi"))
    u1 = uni.select(F.col("t").alias("t1"), F.col("c1").alias("c1_a"))
    u2 = uni.select(F.col("t").alias("t2"), F.col("c1").alias("c1_b"))
    return (
        bi.filter(F.col("c12") >= 5)
        .join(F.broadcast(u1), "t1")
        .join(F.broadcast(u2), "t2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select(
            "t1",
            "t2",
            "c12",
            F.round(
                F.log(
                    (F.col("c12") / (1.0 * F.col("n_bi")))
                    / (
                        (F.col("c1_a") / (1.0 * F.col("n_uni")))
                        * (F.col("c1_b") / (1.0 * F.col("n_uni")))
                    )
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy("t1", "t2")
    )


# --- Misra-Gries heavy hitters with exact verification ---------------------------
# Sketch candidates per partition (capacity 64), exact recount of
# candidates only; report tokens with freq*20 > N. The oracle is the
# plain exact query — the sketch path must reproduce it EXACTLY
# (superset guarantee + verify), which is the whole point.
_MG_SQL = """
    WITH tok AS (
      SELECT unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS t
      FROM documents),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tok)
    SELECT t, CAST(count(*) AS BIGINT) AS freq,
           round(count(*) / (1.0 * n.n_total), 6) AS share
    FROM tok CROSS JOIN n
    GROUP BY t, n.n_total
    HAVING count(*) * 20 > n.n_total
    ORDER BY t
"""


@pq("heavy_hitters_mg", _MG_SQL)
def heavy_hitters_mg(spark, sf_dir):
    """Heavy hitters (tokens above 5% of the stream) via a Misra-Gries
    sketch with exact verification: each partition keeps 64 counters
    (Arrow-batched mapInPandas; batch-merge + compress is the
    mergeable-summaries MERGE), the candidate UNION provably contains
    every token with freq > N/65, and an exact recount over ONLY the
    candidates (broadcast semi-join) removes false positives. The
    oracle is the naive exact GROUP BY — the sketch path must match it
    bit-for-bit. Plan: map-side sketches (no token shuffle), one
    candidate broadcast, one candidates-only agg — at 100 TB the full
    token shuffle this replaces IS the bottleneck; here only ~64 rows
    per partition move."""
    from etl_mini_spark.operators.sketches import heavy_hitters_exact

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")
        ).alias("t")
    )
    return heavy_hitters_exact(toks, "t", denom=20, k=64).orderBy("t")


# --- URL parsing suite -----------------------------------------------------------
# Synthetic-but-realistic URLs assembled from document columns, parsed
# with Spark's parse_url (host/path/query + one query param) vs the
# equivalent regexes in the oracle. Thinned to doc_id % 5 = 0.
_URL_SQL = """
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/' || lang || '/doc-' || doc_id
             || '?page=' || CAST(doc_id % 7 AS VARCHAR) || '&ref=' || source AS url
      FROM documents WHERE doc_id % 5 = 0)
    SELECT doc_id, url,
           regexp_extract(url, '^https://([^/]+)', 1) AS host,
           regexp_extract(url, '^https://[^/]+([^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]page=([^&]*)', 1) AS page
    FROM u ORDER BY doc_id
"""


@pq("url_parse_suite", _URL_SQL)
def url_parse_suite(spark, sf_dir):
    """URL decomposition — host, path, query string, and a single
    query parameter — with Spark's built-in parse_url (a codegen'd JVM
    expression; the oracle replays the same extraction as anchored
    regexes). The URL itself is assembled deterministically from
    document columns so the fixture needs no new table. Plan: narrow
    per-row expressions only; at scale this is a zero-shuffle
    projection pass, which is exactly what log-sessionization wants."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    u = d.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/"), F.col("lang"),
            F.lit("/doc-"), F.col("doc_id").cast("string"),
            F.lit("?page="), (F.col("doc_id") % 7).cast("string"),
            F.lit("&ref="), F.col("source"),
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")).alias("page"),
    ).orderBy("doc_id")
