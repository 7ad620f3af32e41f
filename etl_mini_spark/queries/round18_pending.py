"""Round-18 staged tier: distinct sketches whose ESTIMATES are
oracle-checkable because the hash is engine-portable md5 (an
own-implementation HyperLogLog and a Flajolet-Martin PCSA — unlike
the rows-only builtin HLL++ entry, every register value here is an
exact integer on both engines), combinatorial optimization and
matching (Gale-Shapley stable matching replayed round by round, 0/1
knapsack with a list-carried DP, LP vertex enumeration with exact
integer cross-multiplication feasibility), lakehouse modeling (a
data-vault point-in-time table over two satellite histories), modular
arithmetic (Shamir secret reconstruction via Lagrange interpolation
mod a Mersenne prime), data quality (Luhn checksum audit), and
distribution comparison (the Kuiper two-sample statistic, the
rotation-invariant refinement of KS) — authored in round 14 so the
rotation-focused sessions r15-r18 inherit ready tiers. DELIBERATELY
~12 entries (the small-tier backlog-drain plan).

Module-local PENDING18_QUERIES/PENDING18_ORACLE, swept by
sweep_oracle.py alongside the registry and the 15/16/17 tiers.

Parity rules as in round9..17 (FIXTURES.md §C): exact integers
wherever a comparison decides a row (registers, DP states, modular
residues, cross-multiplied feasibility tests), md5 as the only hash,
offline literals for every transcendental constant (HLL alpha, PCSA
phi, OBF-style boundaries), per-term 9dp pre-rounds summed as BIGINT
nanos, deterministic tie-breaks, HALF_UP display rounding.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mini_spark.queries._base import _t

PENDING18_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
PENDING18_ORACLE: dict[str, str] = {}


def pq(name: str, sql: str | None = None):
    def deco(fn):
        PENDING18_QUERIES[name] = fn
        if sql is not None:
            PENDING18_ORACLE[name] = sql
        return fn

    return deco


def _pin(col, k: int = 6):
    """floor(x*10^k + 0.5)/10^k — HALF_UP display rounding, identical
    IEEE op sequence on both engines (FIXTURES.md §C)."""
    scale = 10 ** k
    return F.floor(col * scale + F.lit(0.5)) / scale


# =====================================================================
# Block A — HyperLogLog over md5 (the estimate itself value-checks)
# =====================================================================

# m = 64 registers indexed by the top 6 bits of the 60-bit md5-prefix
# hash; register = 1 + leading zeros of the remaining 54 bits (the
# exact integer 54 - floor(log2(w)) computed by BIT LENGTH arithmetic,
# not floats). The raw estimate alpha64·m²/Σ2^-M and the small-range
# linear-counting correction are the ONLY float ops and run in the
# identical order on both engines — so unlike the rows-only builtin
# HLL++ entry (agg_approx_distinct), this sketch's estimate
# hash-matches DuckDB exactly. Stream = user_id || ':hll'.
_HLL_SQL = """
    WITH h AS (
      SELECT DISTINCT
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR) || ':hll'), 1, 15))
                  AS BIGINT) AS hv
      FROM events),
    reg AS (
      SELECT hv // 18014398509481984 AS j,          -- top 6 of 60 bits (2^54)
             hv % 18014398509481984 AS w            -- low 54 bits
      FROM h),
    rho AS (
      SELECT j,
             CAST(max(CASE WHEN w = 0 THEN 55
                  ELSE 55 - length(bin(w)) END) AS BIGINT) AS m_j
      FROM reg GROUP BY j),
    regs AS (
      SELECT g.j, coalesce(r.m_j, 0) AS m_j
      FROM (SELECT unnest(generate_series(0, 63)) AS j) g
      LEFT JOIN rho r ON r.j = g.j),
    s AS (
      SELECT CAST(sum(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros,
             CAST(sum(CAST(power(2.0, 55 - m_j) AS BIGINT)) AS BIGINT) AS znum,
             (SELECT CAST(count(*) AS BIGINT) FROM h) AS n_exact
      FROM regs)
    SELECT n_exact, zeros,
           floor(0.709 * 64 * 64 / (CAST(znum AS DOUBLE) / 36028797018963968)
                 * 1000000 + 0.5) / 1000000 AS raw_estimate,
           floor(CASE WHEN 0.709 * 64 * 64 / (CAST(znum AS DOUBLE) / 36028797018963968)
                           <= 160.0 AND zeros > 0
                      THEN 64.0 * ln(64.0 / zeros)
                      ELSE 0.709 * 64 * 64 / (CAST(znum AS DOUBLE) / 36028797018963968)
                      END * 1000000 + 0.5) / 1000000 AS estimate,
           abs(CASE WHEN 0.709 * 64 * 64 / (CAST(znum AS DOUBLE) / 36028797018963968)
                         <= 160.0 AND zeros > 0
                    THEN 64.0 * ln(64.0 / zeros)
                    ELSE 0.709 * 64 * 64 / (CAST(znum AS DOUBLE) / 36028797018963968)
                    END - n_exact)
             / n_exact <= 0.5 AS within_band
    FROM s
"""


@pq("hyperloglog_md5_replay", _HLL_SQL)
def hyperloglog_md5_replay(spark, sf_dir):
    """Own-implementation HyperLogLog (m=64, md5 hash): registers are
    exact integers (bit-length arithmetic on the 54-bit suffix), so
    the sketch — and therefore the estimate — is engine-identical.
    Scale: registers merge by max, the classic mergeable-sketch path;
    one distinct + one 64-group agg. The ±~13% (1.04/√64) accuracy is
    pinned loosely via within_band."""
    e = _t(spark, sf_dir, "events")
    h = e.select(
        F.conv(F.substring(F.md5(F.concat(F.col("user_id").cast("string"),
                                          F.lit(":hll"))), 1, 15), 16, 10)
        .cast("long").alias("hv")
    ).distinct()
    # `div`, not floor(/): hv has up to 60 significant bits and a
    # double division would round before the floor
    reg = h.select(
        F.expr("hv div 18014398509481984").cast("bigint").alias("j"),
        (F.col("hv") % F.lit(18014398509481984)).alias("w"),
    )
    rho = reg.groupBy("j").agg(
        F.max(
            F.when(F.col("w") == 0, F.lit(55)).otherwise(
                55 - F.length(F.bin("w")))
        ).cast("bigint").alias("m_j")
    )
    grid = spark.range(0, 64).select(F.col("id").alias("j"))
    regs = grid.join(rho, "j", "left").select(
        "j", F.coalesce("m_j", F.lit(0)).alias("m_j")
    )
    n_exact = h.agg(F.count("*").cast("bigint").alias("n")).withColumnRenamed("n", "n_exact")
    s = regs.agg(
        F.sum(F.when(F.col("m_j") == 0, 1).otherwise(0)).cast("bigint").alias("zeros"),
        F.sum(F.pow(F.lit(2.0), 55 - F.col("m_j")).cast("bigint"))
        .cast("bigint").alias("znum"),
    ).crossJoin(F.broadcast(n_exact))
    raw = 0.709 * 64 * 64 / (F.col("znum").cast("double") / F.lit(36028797018963968.0))
    est = F.when((raw <= 160.0) & (F.col("zeros") > 0),
                 64.0 * F.log(64.0 / F.col("zeros"))).otherwise(raw)
    return s.select(
        "n_exact", "zeros",
        _pin(raw).alias("raw_estimate"),
        _pin(est).alias("estimate"),
        (F.abs(est - F.col("n_exact")) / F.col("n_exact") <= 0.5).alias("within_band"),
    )


# =====================================================================
# Block B — Flajolet-Martin PCSA (bitmap OR registers, exact)
# =====================================================================

# 64 buckets, each a 55-bit bitmap OR-ing 2^rho of every member's
# hash; R_j = position of the lowest UNSET bit (the FM observable),
# estimate = m/φ · 2^(ΣR/m) with φ = 0.77351 as the offline literal.
# Bitmaps aggregate with bit_or — exact, mergeable, engine-identical.
_PCSA_SQL = """
    WITH h AS (
      SELECT DISTINCT
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR) || ':pcsa'), 1, 15))
                  AS BIGINT) AS hv
      FROM events),
    b AS (
      SELECT hv % 64 AS j, hv // 64 AS w FROM h),
    bm AS (
      SELECT j,
             bit_or(CASE WHEN w = 0 THEN CAST(36028797018963968 AS BIGINT)
                    ELSE w & (-w) END) AS bits
      FROM b GROUP BY j),
    grid AS (SELECT unnest(generate_series(0, 63)) AS j),
    rj AS (
      SELECT g.j,
             CAST(length(bin((~coalesce(m.bits, 0)) & (coalesce(m.bits, 0) + 1)))
                  - 1 AS BIGINT) AS r
      FROM grid g LEFT JOIN bm m ON m.j = g.j),
    s AS (
      SELECT CAST(sum(r) AS BIGINT) AS rsum,
             (SELECT CAST(count(*) AS BIGINT) FROM h) AS n_exact
      FROM rj)
    SELECT n_exact, rsum,
           floor(64.0 / 0.77351 * power(2.0, CAST(rsum AS DOUBLE) / 64.0)
                 * 1000000 + 0.5) / 1000000 AS estimate,
           abs(64.0 / 0.77351 * power(2.0, CAST(rsum AS DOUBLE) / 64.0) - n_exact)
             / n_exact <= 0.5 AS within_band
    FROM s
"""


@pq("pcsa_fm_sketch", _PCSA_SQL)
def pcsa_fm_sketch(spark, sf_dir):
    """Flajolet-Martin PCSA distinct sketch: per-bucket bitmaps OR
    2^(trailing-zero count) of member hashes (bit_or aggregate —
    exact, mergeable), the lowest-unset-bit observable per bucket, one
    final 2^(R̄) estimate. Engine-identical integers end to end."""
    e = _t(spark, sf_dir, "events")
    h = e.select(
        F.conv(F.substring(F.md5(F.concat(F.col("user_id").cast("string"),
                                          F.lit(":pcsa"))), 1, 15), 16, 10)
        .cast("long").alias("hv")
    ).distinct()
    b = h.select(
        (F.col("hv") % 64).alias("j"),
        F.expr("hv div 64").cast("bigint").alias("w"),
    )
    # lowest set bit of w isolates as w & -w (a power of two), so the
    # bitmap contribution is pure integer arithmetic — no shifts, no logs
    bm = b.groupBy("j").agg(
        F.bit_or(
            F.when(F.col("w") == 0, F.lit(36028797018963968).cast("bigint"))
            .otherwise(F.col("w").bitwiseAND(-F.col("w")))
        ).alias("bits")
    )
    grid = spark.range(0, 64).select(F.col("id").alias("j"))
    # lowest UNSET bit of bits isolates as ~bits & (bits+1); its
    # position is length(bin(.)) - 1 — exact string-length arithmetic
    bitsc = F.coalesce(F.col("bits"), F.lit(0))
    r = (F.length(F.bin(F.bitwise_not(bitsc).bitwiseAND(bitsc + 1))) - 1)
    rj = grid.join(bm, "j", "left").select("j", r.cast("bigint").alias("r"))
    n_exact = h.agg(F.count("*").cast("bigint").alias("n_exact"))
    s = rj.agg(F.sum("r").cast("bigint").alias("rsum")).crossJoin(F.broadcast(n_exact))
    est = 64.0 / 0.77351 * F.pow(F.lit(2.0), F.col("rsum").cast("double") / 64.0)
    return s.select(
        "n_exact", "rsum",
        _pin(est).alias("estimate"),
        (F.abs(est - F.col("n_exact")) / F.col("n_exact") <= 0.5).alias("within_band"),
    )
