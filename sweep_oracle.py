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
its budget is interrupted and reported as ORACLE_TIMEOUT — an
oracle-side limit, not an engine failure — instead of hanging the
sweep. The seven deliberately-quadratic oracles that used to hit that
watchdog at sf0.1's 5,000-doc corpus now run CAPPED (identical Spark
query + identical SQL over a deterministic doc_id-residue subset sized
to fit the budget — see CAPPED_ORACLE), so every registry entry gets a
VALUE check at sf0.1 and ORACLE_TIMEOUT only appears on regressions."""

import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import duckdb  # noqa: E402

from etl_mini_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import TABLES, canonicalize  # noqa: E402

# Positionals may appear on either side of flags like --bare (r17
# advice: `sweep_oracle.py --bare sf_dir` used to silently sweep the
# DEFAULT SF and treat the sf path as start_from). First non-dash arg
# = SF, second = start_from; main() rejects a third loudly (the
# rejection lives there, not at import, so pytest's own positionals
# can't kill a test-session import).
_POSITIONALS = [a for a in sys.argv[1:] if not a.startswith("-")]
SF = _POSITIONALS[0] if _POSITIONALS else "/root/testdata/sf0.1"
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

# Queries whose DuckDB *oracles* are deliberately quadratic (all-pairs
# shingle/jaccard formulations — the point of the oracle is a naive
# independent derivation, the Spark side is bucketed and finishes in
# seconds) and blow the 180 s watchdog at sf0.1's 5,000-doc corpus.
# r13 verdict #6: instead of recording nothing at sf0.1, these run the
# IDENTICAL Spark query over a deterministic 30 % doc subset
# (doc_id % 10 < 3, ~1,500 docs — 3× the driver's sf0.01 gate, ~9 % of
# the quadratic cost that times out) against the same oracle SQL on the
# same subset, so the sweep checks *values* at above-gate scale. The
# subset directory symlinks every other table and is rebuilt from the
# SF parquet on demand.
CAPPED_ORACLE = {
    # measured at sf0.1 under ambient load, oracle side: 36-141 s at
    # the 30 % cap for these five...
    "dedup_ngram_jaccard": 3,
    "dedup_minhash_lsh": 3,
    "corpus_curation_pipeline": 3,
    "minhash_containment": 3,
    "dedup_canonical_pick": 3,
    # ...the recursive-CTE connected-components oracle fits at 20 %
    # (1,000 docs, 121 s — still 2× the driver's gate corpus)...
    "dedup_clusters": 2,
    # ...and the split-leakage oracle (all-pairs 13-gram overlap ACROSS
    # split assignment, worse than quadratic in practice) only fits at
    # 10 % — the same corpus SIZE as the driver's gate but a disjoint
    # doc_id population drawn from the sf0.1 distribution, so it still
    # checks rows the gate never sees.
    "split_leakage_safe": 1,
}


def capped_dir(sf_dir: str, tenths: int) -> str:
    """Materialize (once) the deterministic capped twin of sf_dir:
    documents down-sampled to `tenths`/10 by doc_id residue via DuckDB
    COPY (schema-preserving), every other table symlinked. The cache
    key includes the source documents.parquet mtime+size, so a
    regenerated testdata tree (or a different SF root with the same
    basename) rebuilds instead of silently reusing a stale subset
    (r14 advice)."""
    import hashlib
    import shutil
    import time

    src = Path(sf_dir)
    st = (src / "documents.parquet").stat()
    # key on the FULL resolved source path (not just the basename): two
    # SF roots named "sf0.1" must not share — or prune — each other's
    # cache (r15 advice)
    pathkey = hashlib.md5(str(src.resolve()).encode()).hexdigest()[:10]
    fingerprint = f"{pathkey}_{st.st_mtime_ns:x}_{st.st_size:x}"
    dst = Path(__file__).resolve().parent / "tmp" / f"cap{tenths}0_{src.name}_{fingerprint}"
    marker = dst / ".complete"
    if marker.exists():
        return str(dst)
    # Prune stale siblings so tmp/ holds at most one capped copy per
    # SF dir: same-pathkey dirs with an older fingerprint, plus
    # legacy-format dirs (pre-pathkey naming — unreachable by the new
    # key, so they would otherwise be orphaned forever). Structural
    # classification, not prefix heuristics: a sibling SF root whose
    # basename extends ours (sf0.1 vs sf0.1_old) produces suffixes
    # that match NEITHER pattern and is never touched. A dir that is
    # FRESH (its own mtime or its .complete marker touched < 1 h ago)
    # is left alone: a concurrent sweep may still be building or
    # reading it.
    import glob as _glob
    import re as _re

    def _fresh(d: Path) -> bool:
        now = time.time()
        for probe in (d / ".complete", d):
            try:
                if now - probe.stat().st_mtime < 3600:
                    return True
            except OSError:
                continue
        return False

    prefix = f"cap{tenths}0_{src.name}"
    # glob.escape on the BASENAME only (an SF name with glob metachars
    # like "sf[1]" must match literally); Path.glob keeps the parent
    # path itself literal, which glob.glob on the joined string would
    # not (metachars in the checkout path would empty the candidate
    # list and silently disable pruning)
    for old in dst.parent.glob(_glob.escape(prefix) + "*"):
        if old == dst or not old.is_dir():
            continue
        suffix = old.name[len(prefix):]  # "" or "_<parts>"
        m_new = _re.fullmatch(r"_([0-9a-f]{10})_[0-9a-f]+_[0-9a-f]+", suffix)
        legacy = suffix == "" or _re.fullmatch(r"_[0-9a-f]+_[0-9a-f]+", suffix)
        if m_new:
            if m_new.group(1) != pathkey:
                continue  # another SF root's live cache — never touch it
        elif not legacy:
            continue  # unrecognized sibling (e.g. extended basename) — skip
        if _fresh(old):
            continue
        shutil.rmtree(old, ignore_errors=True)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    try:
        for t in TABLES:
            p = src / f"{t}.parquet"
            if not p.exists():
                continue
            out = dst / f"{t}.parquet"
            if out.exists() or out.is_symlink():
                out.unlink()
            if t == "documents":
                con.execute(
                    f"COPY (SELECT * FROM read_parquet('{p}') WHERE doc_id % 10 < {tenths} "
                    f"ORDER BY doc_id) TO '{out}' (FORMAT PARQUET)"
                )
            else:
                out.symlink_to(p)
    finally:
        con.close()
    marker.touch()
    return str(dst)


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

            # pure symmetric RELATIVE tolerance: |x-y| <= rtol*max(|x|,|y|).
            # np.isclose's default atol=1e-8 would additionally accept
            # absolute drift near zero, and its rtol test is asymmetric
            # in |b| (r14 advice) — neither matches the documented
            # contract.
            diff = (x - y).abs()
            bound = col_tols[c] * np.maximum(x.abs(), y.abs())
            # x == y first: keeps equal infinities close (inf - inf is
            # NaN and would otherwise flag a false mismatch). The
            # finite-diff guard rejects finite-vs-inf and +inf-vs--inf,
            # where bound itself is inf and inf <= inf would pass.
            close = (x == y) | ((diff <= bound) & np.isfinite(diff))
            if not bool((close | both_nan).all()):
                return False
        else:
            neq = ~(a[c].eq(b[c]) | (a[c].isna() & b[c].isna()))
            if neq.any():
                return False
    return True


def compare_with_watchdog(spark_df, sql, name=None, sf_dir=None, budget_s=None):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir or SF) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    timer = threading.Timer(budget_s or ORACLE_BUDGET_S, con.interrupt)
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
        from etl_mini_spark.queries.round19_pending import (
            PENDING19_ORACLE, PENDING19_QUERIES)

        todo += [(n, PENDING19_QUERIES[n], PENDING19_ORACLE[n]) for n in PENDING19_ORACLE]
    except ModuleNotFoundError as e:
        if e.name != "etl_mini_spark.queries.round19_pending":
            raise
    try:
        from etl_mini_spark.queries.round20_pending import (
            PENDING20_ORACLE, PENDING20_QUERIES)

        todo += [(n, PENDING20_QUERIES[n], PENDING20_ORACLE[n]) for n in PENDING20_ORACLE]
    except ModuleNotFoundError as e:
        if e.name != "etl_mini_spark.queries.round20_pending":
            raise
    if len(_POSITIONALS) > 2:
        sys.exit(
            "usage: sweep_oracle.py [--bare] [sf_dir] [start_from_name]; "
            f"got extra positionals: {_POSITIONALS[2:]}"
        )
    # a typo'd flag (--bar, --bare=1) would otherwise be dropped by the
    # positional filter AND missed by the exact '--bare' match below —
    # the sweep would silently run under the WRONG session and the
    # committed gate log would attest conditions that never held
    unknown_flags = [a for a in sys.argv[1:] if a.startswith("-") and a != "--bare"]
    if unknown_flags:
        sys.exit(
            "usage: sweep_oracle.py [--bare] [sf_dir] [start_from_name]; "
            f"unknown flags: {unknown_flags}"
        )
    skip_from = _POSITIONALS[1] if len(_POSITIONALS) > 1 else None
    # The quadratic oracles finish comfortably at the driver's sf0.01
    # gate (500 docs); capping only kicks in where the full oracle
    # provably cannot run (sf0.1's 5,000 docs) so smaller SFs keep the
    # stronger full-corpus check.
    # An SF dir without a documents table still sweeps its non-doc
    # entries (capping simply never activates) — don't crash at
    # startup (r14 advice).
    _docs_pq = Path(SF) / "documents.parquet"
    if _docs_pq.exists():
        n_docs = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{_docs_pq}')"
        ).fetchone()[0]
        cap_active = n_docs > 2000
    else:
        cap_active = False
    if "--bare" in sys.argv:
        # the external driver's exact conditions: a bare DEFAULT
        # SparkSession (no session-factory confs). get_spark would
        # yield to it anyway; creating it here replaces the per-round
        # tmp/gate_bare_rN.py pre-import dance with a flag.
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[32]").getOrCreate()
    else:
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
            use_cap = cap_active and name in CAPPED_ORACLE
            run_dir = capped_dir(SF, CAPPED_ORACLE[name]) if use_cap else SF
            # capped oracles are sized to ~0.3-0.8× the default budget
            # on an idle box; double their watchdog so ambient load on
            # the shared machine can't turn a known-bounded oracle into
            # a spurious ORACLE_TIMEOUT
            ok, msg = compare_with_watchdog(
                fn(spark, run_dir), sql, name=name, sf_dir=run_dir,
                budget_s=2 * ORACLE_BUDGET_S if use_cap else None,
            )
            if ok and run_dir != SF:
                msg = (f"ok (capped oracle: identical query + SQL over the "
                       f"{CAPPED_ORACLE[name] * 10}% doc subset)")
                print(f"  {msg}", flush=True)
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
