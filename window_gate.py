"""Driver-window gate: the EXACT 50-entry `_DRIVER_WINDOW` vs its
DuckDB oracles, in registry order, using the same canonicalize +
NaN-aware comparison as the sweep and the pytest differential.

    python window_gate.py [sf_dir] [--bare]

Default sf_dir is /root/testdata/sf0.01 — the external driver's gate.
``--bare`` pre-creates a bare default SparkSession (the driver's exact
conditions: default confs, no session factory) before any engine
import; without it the session factory applies.

Committed (rather than an ad-hoc tmp/ script) after round 17, where a
hand-rolled gate compared raw ``.values`` and flagged four false
MISMATCHes on NaN/nullable columns: the comparison MUST be the
harness's per-column ``eq | both-isna`` equality, and keeping the
runner in-repo stops that footgun from being re-authored each round.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF = next((a for a in sys.argv[1:] if not a.startswith("-")),
          "/root/testdata/sf0.01")


def main() -> int:
    if "--bare" in sys.argv:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[32]").getOrCreate()
    else:
        from etl_mini_spark.session import get_spark

        spark = get_spark("window-gate")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_mini_spark.queries import ORACLE, QUERIES
    from etl_mini_spark.queries._window import _DRIVER_WINDOW
    from tests.oracle_harness import compare

    t0 = time.monotonic()
    n_ok = 0
    for i, name in enumerate(_DRIVER_WINDOW, 1):
        ok, msg = compare(QUERIES[name](spark, SF), ORACLE[name], SF)
        print(f"[{i}/{len(_DRIVER_WINDOW)} {time.monotonic() - t0:.0f}s] "
              f"{name}: {'ok' if ok else 'MISMATCH ' + msg}", flush=True)
        n_ok += bool(ok)
    print(f"WINDOW GATE DONE {n_ok}/{len(_DRIVER_WINDOW)} ok "
          f"in {time.monotonic() - t0:.0f}s")
    return 0 if n_ok == len(_DRIVER_WINDOW) else 1


if __name__ == "__main__":
    sys.exit(main())
