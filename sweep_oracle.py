"""Full-registry differential sweep at an arbitrary SF.

    python sweep_oracle.py [sf_dir] [start_from_name]

Every oracle-backed registry entry AND every staged pending entry is
compared against its DuckDB oracle at the given SF (default sf0.1 —
ten times the driver's gate). This is the harness that caught the two
round-7 rounding half-case escapes and the approx-quantile exactness
boundary; run it per round at sf0.1 to catch scale-dependent
divergence (rank-boundary flips, threshold assumptions, float noise
crossing rounding edges) before the driver or a user does.

Per-query progress lines + a DuckDB watchdog: an oracle grinding past
its budget (the deliberately naive quadratic oracles do, at sf0.1's
5,000-doc corpus) is interrupted and reported as ORACLE_TIMEOUT —
an oracle-side limit, not an engine failure — instead of hanging the
sweep."""

import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import duckdb  # noqa: E402

from etl_mini_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import TABLES, canonicalize  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.1"
ORACLE_BUDGET_S = 180

# Per-query tolerance predicates (r13 verdict #5). Exact hash equality
# is the default; an entry here relaxes ONLY the named numeric columns
# to a relative tolerance, with every other column still exact. This
# formalizes known ε-approximate semantics so the sweep reads green on
# documented sketch noise and ANY real drift (wrong rank direction,
# wrong group, schema change) still fails loudly.
#
# approx_quantile_sketch: percentile_approx is Greenwald-Khanna with
# accuracy=1e6 → rank error bound n/accuracy (0.6 ranks at sf0.1's
# 600k lineitem rows), so past sf0.01 the sketch may legally return
# the order statistic ADJACENT to DuckDB's quantile_disc pick
# (observed: 26960.18 vs 26960.27 at sf0.1 — 3e-6 relative). Adjacent
# l_extendedprice order statistics differ by <<0.1% at any SF with
# ≥10k rows, so rel_tol 1e-3 accepts the ε-neighborhood and still
# rejects a quantile landing in the wrong tail.
TOLERANCE: dict[str, dict[str, float]] = {
    "approx_quantile_sketch": {"v": 1e-3},
}


def _within_tolerance(a, b, col_tols):
    """Exact frame equality, except columns in col_tols compare with a
    relative tolerance. Frames arrive canonicalized (sorted/rounded)."""
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        if c in col_tols:
            x, y = a[c].astype(float), b[c].astype(float)
            both_nan = x.isna() & y.isna()
            import numpy as np

            close = np.isclose(x, y, rtol=col_tols[c], equal_nan=False)
            if not bool((close | both_nan).all()):
                return False
        else:
            neq = ~(a[c].eq(b[c]) | (a[c].isna() & b[c].isna()))
            if neq.any():
                return False
    return True


def compare_with_watchdog(spark_df, sql, name=None):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    timer = threading.Timer(ORACLE_BUDGET_S, con.interrupt)
    timer.start()
    try:
        oracle = con.execute(sql).fetchdf()
    except duckdb.InterruptException:
        return False, f"ORACLE_TIMEOUT >{ORACLE_BUDGET_S}s"
    finally:
        timer.cancel()
        con.close()
    mine = spark_df.toPandas()
    if set(mine.columns) != set(oracle.columns):
        return False, f"column mismatch: {sorted(mine.columns)} vs {sorted(oracle.columns)}"
    a, b = canonicalize(mine), canonicalize(oracle)
    if len(a) != len(b):
        return False, f"row count mismatch: spark={len(a)} oracle={len(b)}"
    if a.equals(b):
        return True, "ok"
    if name in TOLERANCE and _within_tolerance(a, b, TOLERANCE[name]):
        return True, f"ok (within documented tolerance {TOLERANCE[name]})"
    for c in a.columns:
        neq = ~(a[c].eq(b[c]) | (a[c].isna() & b[c].isna()))
        if neq.any():
            i = int(neq.idxmax())
            return False, f"value mismatch col={c} row={i}: spark={a[c][i]!r} oracle={b[c][i]!r}"
    return False, "frames differ (index/dtype)"


def main():
    from etl_mini_spark.queries import ORACLE, QUERIES

    # a staged pending tier, when one exists, sweeps alongside the registry
    todo = [(n, QUERIES[n], ORACLE[n]) for n in ORACLE]
    try:
        from etl_mini_spark.queries.round15_pending import PENDING_ORACLE, PENDING_QUERIES

        todo += [(n, PENDING_QUERIES[n], PENDING_ORACLE[n]) for n in PENDING_ORACLE]
    except ModuleNotFoundError as e:
        # only "no pending tier this round" is skippable; a transitive
        # import failure inside a real pending module must surface
        if e.name != "etl_mini_spark.queries.round15_pending":
            raise
    skip_from = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("sweep-sf01")
    spark.sparkContext.setLogLevel("ERROR")
    if skip_from:
        names = [n for n, _, _ in todo]
        todo = todo[names.index(skip_from):]
    t0 = time.monotonic()
    bad = []
    for i, (name, fn, sql) in enumerate(todo):
        print(f"[{i + 1}/{len(todo)} {time.monotonic() - t0:.0f}s] {name}", flush=True)
        t = time.monotonic()
        try:
            ok, msg = compare_with_watchdog(fn(spark, SF), sql, name=name)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {str(e)[:200]}"
        dt = time.monotonic() - t
        if not ok:
            bad.append((name, msg))
            print(f"  FAIL ({dt:.1f}s): {msg}", flush=True)
        elif dt > 30:
            print(f"  slow: {dt:.1f}s", flush=True)
    print(f"DONE {len(todo) - len(bad)}/{len(todo)} ok in {time.monotonic() - t0:.0f}s")
    for name, msg in bad:
        print("BAD", name, msg)


if __name__ == "__main__":
    main()
