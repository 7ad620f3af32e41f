"""One shard of the registry-vs-DuckDB differential at a given SF.

tests/test_queries_oracle.py fans N of these out as CONCURRENT
subprocesses (guide §2.6: independent verifications overlap instead of
queueing behind one driver). Process isolation — each shard owns a
private JVM — also makes the conf-scoped operators (CC-star loop
partitions, pagerank loops, the NTZ reader guard) race-free without
any locking: session confs are per-process.

Shard i of n runs sorted(QUERIES)[i::n]; shards are DISJOINT, and every
named on-disk fixture is keyed by query name (+ SF) or a uuid, so no
two shards ever touch the same path.

    python tests/oracle_shard_runner.py <shard> <nshards> <sf_dir>

Exit 0 iff every query in the shard matches its oracle (or, for the
rows-only entries, produces non-empty output with the declared schema).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Exact declared output schema for each no-oracle (rows-only) entry.
# Their VALUE pins live in dedicated tests (HLL ±5% test_plans, IVF
# recall test_operators, capped-sessions differential+checksum); this
# registry-level pin makes empty output or schema drift fail loudly.
ROWS_ONLY_SCHEMAS = {
    "similarity_ivf": ["probe_id", "neighbor_id", "cosine"],
    "ann_pq_rerank": ["probe_id", "neighbor_id", "cosine"],
    "agg_approx_distinct": ["approx_users", "approx_types"],
    "stream_capped_sessions": [
        "user_id", "session_start", "session_end", "n_events", "closed_by",
    ],
    "stream_capped_sessions_checksum": [
        "closed_by", "n_sessions", "total_events", "bounds_checksum_us",
    ],
    # iterative float fixpoint — trajectory pinned by the numpy
    # differential test in test_operators.py
    "embedding_kmeans": ["cluster", "n_points", "wcss"],
}


def main() -> int:
    shard, nshards, sf_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from etl_mini_spark.queries import ORACLE, QUERIES
    from etl_mini_spark.session import get_spark
    from tests.oracle_harness import compare

    # Each shard JVM must size its internal pools (GC, netty, codegen)
    # for ITS slice of the box, not all 32 cores — without
    # ActiveProcessorCount, N concurrent shards each spawn ~cores GC
    # threads and the run goes system-time-bound. Small heap for
    # sf0.001-scale work keeps GC pauses trivial.
    spark = get_spark(
        f"oracle-shard-{shard}",
        cpus=3,
        shuffle_partitions=8,
        extra_conf={
            "spark.driver.memory": "3g",
            "spark.driver.extraJavaOptions": "-XX:ActiveProcessorCount=3",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    names = sorted(QUERIES)[shard::nshards]
    n_bad = 0
    for name in names:
        t0 = time.monotonic()
        try:
            df = QUERIES[name](spark, sf_dir)
            if name in ORACLE:
                ok, msg = compare(df, ORACLE[name], sf_dir)
            elif name not in ROWS_ONLY_SCHEMAS:
                ok, msg = False, (
                    "no oracle and no declared schema — add it to "
                    "ROWS_ONLY_SCHEMAS or give it an oracle_sql entry"
                )
            else:
                n = df.count()
                if n == 0:
                    ok, msg = False, "rows-only query produced empty output"
                elif df.columns != ROWS_ONLY_SCHEMAS[name]:
                    ok, msg = False, (
                        f"schema drift {df.columns} != {ROWS_ONLY_SCHEMAS[name]}"
                    )
                else:
                    ok, msg = True, ""
        except Exception as e:  # noqa: BLE001 — report, keep sweeping the shard
            ok, msg = False, f"EXC {type(e).__name__}: {str(e)[:300]}"
        dt = time.monotonic() - t0
        if not ok:
            n_bad += 1
            print(f"FAIL {name}: {msg}", flush=True)
        elif dt > 15:
            print(f"slow {name}: {dt:.1f}s", flush=True)
    print(f"SHARD {shard}/{nshards} DONE {len(names) - n_bad}/{len(names)} ok",
          flush=True)
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
