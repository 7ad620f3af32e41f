"""Non-vacuity pins for the round-16 tier (oracle equivalence is
verified by tests/test_queries_oracle.py at sf0.001 and the driver at
sf0.01): bounds, conservation laws, exact independent replays
(adstock recursion, MMR scoring) so no entry can go green as a
degenerate constant. Migrated unchanged from the staging harness at
registration."""

from __future__ import annotations

import hashlib

from tests.conftest import SF_SMOKE


def _pending():
    from etl_mini_spark.queries import QUERIES

    return QUERIES


PENDING = _pending()


# --- Block A: V-shape row patterns ---------------------------------------------


def test_vshape_matches_are_real_vs(spark):
    rows = PENDING["pattern_vshape_runs"](spark, SF_SMOKE).collect()
    assert rows  # a 700+-day random-ish series has V-shapes
    for r in rows:
        assert r["n_down"] >= 1 and r["n_up"] >= 1
        assert r["depth_cents"] > 0 and r["recovery_cents"] > 0
        assert r["start_d"] < r["bottom_d"] < r["end_d"]


# --- Blocks B/C: per-user sequential DPs ---------------------------------------


def test_wis_bounds_and_overlap_rejection(spark):
    from pyspark.sql import functions as F

    from etl_mini_spark.queries._base import _t

    rows = {r["user_id"]: r for r in
            PENDING["interval_scheduling_wis"](spark, SF_SMOKE).collect()}
    assert rows
    tot = {
        r["user_id"]: (r["total"], r["mx"])
        for r in _t(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias("total"),
             F.max(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias("mx"))
        .collect()
    }
    assert set(rows) == set(tot)
    rejected_any = False
    for u, r in rows.items():
        total, mx = tot[u]
        assert mx <= r["best_cents"] <= total
        if r["best_cents"] < total:
            rejected_any = True
    assert rejected_any  # overlapping intervals exist and cost something


def test_lis_bounds(spark):
    rows = PENDING["lis_events_per_user"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["lis_len"] <= r["n_events"]
    assert any(r["lis_len"] < r["n_events"] for r in rows)
    assert any(r["lis_len"] >= 3 for r in rows)


# --- Blocks D/E: phonetic + edit-distance linkage ------------------------------


def test_soundex_groups_codes_and_known_words(spark):
    rows = PENDING["soundex_phonetic_groups"](spark, SF_SMOKE).collect()
    assert rows
    import re

    by_word = {}
    for r in rows:
        assert re.fullmatch(r"[A-Z][0-9]{3}", r["code"]), r["code"]
        assert r["n_words"] == len(r["words"].split(","))
        assert r["doc_reach"] > 0
        for w in r["words"].split(","):
            by_word[w] = r["code"]
    # canonical spot checks against the classic algorithm
    assert by_word["key"] == "K000" and by_word["batch"] == "B320"


def test_damerau_pairs_cut_and_known_distance(spark):
    rows = PENDING["damerau_dl_blocked"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["w1"] < r["w2"] and 1 <= r["dl"] <= 2
        assert r["docs_w1"] > 0 and r["docs_w2"] > 0
    got = {(r["w1"], r["w2"]): r["dl"] for r in rows}
    assert got.get(("fast", "hash")) == 2  # two substitutions


# --- Blocks F/G/H: psychometrics ------------------------------------------------


def test_cronbach_alpha_range(spark):
    r = PENDING["cronbach_alpha_items"](spark, SF_SMOKE).collect()[0]
    assert r["n"] > 0 and r["num"] > 0 and r["den"] > 0
    assert r["alpha"] <= 1.0


def test_icc_components_positive(spark):
    r = PENDING["icc_oneway_quantity"](spark, SF_SMOKE).collect()[0]
    assert r["n_groups"] > 0 and r["nn"] > r["n_groups"]
    assert r["msb"] > 0 and r["msw"] > 0 and r["k0"] > 1.0
    assert -1.0 <= r["icc1"] <= 1.0


def test_krippendorff_alpha_range(spark):
    r = PENDING["krippendorff_alpha_nominal"](spark, SF_SMOKE).collect()[0]
    assert r["n_units"] > 0 and r["n_vals"] >= 2 * r["n_units"]
    assert r["do_nanos"] > 0 and r["de_int"] > 0
    assert -1.0 <= r["alpha"] <= 1.0  # random codings sit near 0


# --- Block I: RANSAC -------------------------------------------------------------


def test_ransac_consensus_bounds(spark):
    r = PENDING["ransac_integer_line"](spark, SF_SMOKE).collect()[0]
    assert r["i"] < r["j"]
    # both seed endpoints are exact inliers of their own line, and the
    # tolerance band must actually discriminate (the round-14 staging
    # gate caught a unit-asymmetry bug where EVERY point was an inlier
    # of every candidate)
    assert 2 <= r["n_inliers"] < r["n_points"]
    assert r["n_points"] > 20


# --- Block J: adstock — exact independent replay ---------------------------------


def test_adstock_recursion_replays_exactly(spark):
    rows = PENDING["adstock_geometric_decay"](spark, SF_SMOKE).collect()
    assert rows
    by_et: dict[str, list] = {}
    for r in rows:
        by_et.setdefault(r["et"], []).append(r)
    for et, rs in by_et.items():
        rs.sort(key=lambda r: r["d"])
        a = 0
        for k, r in enumerate(rs):
            a = r["spend_cents"] if k == 0 else r["spend_cents"] + a // 2
            assert r["adstock_cents"] == a, (et, r["d"])
        assert any(r["adstock_cents"] > r["spend_cents"] for r in rs[1:])


# --- Block K: MMR — exact independent replay of the scoring ----------------------


def test_mmr_selection_replays_exactly(spark):
    rows = sorted(PENDING["mmr_diverse_topk"](spark, SF_SMOKE).collect(),
                  key=lambda r: r["step"])
    assert [r["step"] for r in rows] == list(range(1, 11))
    assert len({r["doc_id"] for r in rows}) == 10
    seen_sources: set[str] = set()
    for r in rows:
        rel = int(hashlib.md5(f"{r['doc_id']}:mmr".encode()).hexdigest()[:15], 16) % 1000000
        penalty = 3000000 if r["source"] in seen_sources else 0
        assert r["score"] == 7 * rel - penalty, r
        seen_sources.add(r["source"])


# --- Block L: circulant BFS -------------------------------------------------------


def test_bfs_histogram_conserves_nodes(spark):
    from etl_mini_spark.queries._base import _t

    rows = sorted(PENDING["graph_bfs_circulant"](spark, SF_SMOKE).collect(),
                  key=lambda r: r["d"])
    n = _t(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    assert [r["d"] for r in rows] == list(range(len(rows)))  # contiguous levels
    assert rows[0]["n_nodes"] == 1 and rows[0]["d"] == 0
    assert sum(r["n_nodes"] for r in rows) == n  # circulant is connected
    assert len(rows) >= 2


# --- Block M: state-eviction twin --------------------------------------------------


def test_eviction_counts_bounded_by_sessions(spark):
    from pyspark.sql import functions as F

    from etl_mini_spark.queries._base import _t

    rows = PENDING["stream_eviction_twin"](spark, SF_SMOKE).collect()
    assert rows
    evicted = sum(r["n_evicted"] for r in rows)
    # session count via the same 30-min gap rule
    from pyspark.sql import Window

    e = _t(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("t"))
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    n_sessions = (
        e.withColumn("brk", F.when(F.col("t") - F.lag("t").over(w) > 1800000000, 1)
                     .otherwise(0))
        .agg((F.sum("brk") + F.count_distinct("user_id")).alias("n"))
        .collect()[0]["n"]
    )
    assert 0 < evicted <= n_sessions
    trigs = [r["evict_trig"] for r in rows]
    assert trigs == sorted(trigs)


# --- Block N: seasonal Mann-Kendall -------------------------------------------------


def test_smk_totals_and_bounds(spark):
    rows = {r["season"]: r for r in
            PENDING["seasonal_mann_kendall"](spark, SF_SMOKE).collect()}
    assert set(rows) == set(range(0, 13))
    tot = rows[0]
    assert tot["s_stat"] == sum(rows[m]["s_stat"] for m in range(1, 13))
    assert tot["var18"] == sum(rows[m]["var18"] for m in range(1, 13))
    for m in range(1, 13):
        n = rows[m]["n_years"]
        assert abs(rows[m]["s_stat"]) <= n * (n - 1) // 2
        assert rows[m]["var18"] > 0 and rows[m]["z"] is None
    assert tot["z"] is not None and abs(tot["z"]) < 10


# --- Block O: Dunn's pairwise z -----------------------------------------------------


def test_dunn_pairs_complete_and_consistent(spark):
    rows = PENDING["dunns_pairwise_z"](spark, SF_SMOKE).collect()
    types = sorted({r["g1"] for r in rows} | {r["g2"] for r in rows})
    k = len(types)
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        assert r["g1"] < r["g2"] and r["n1"] > 0 and r["n2"] > 0
        assert r["significant"] == (abs(r["z"]) >= 2.807034)


# --- Block N: Avro round-trip (added round 15) -------------------------------


def test_avro_roundtrip_not_vacuous(spark):
    """The monthly rollup must cover multiple months with nonzero
    sums, and the container files on disk must be real Avro (magic
    bytes) — one per write partition."""
    import glob

    rows = PENDING["avro_roundtrip"](spark, SF_SMOKE).collect()
    assert len(rows) > 1
    assert all(r["n"] > 0 and r["sum_price"] > 0 for r in rows)
    assert len({r["month"] for r in rows}) == len(rows)
    from pathlib import Path

    from etl_mini_spark.queries._base import _TMP

    files = glob.glob(str(_TMP / f"avro_roundtrip_{Path(SF_SMOKE).name}" / "*.avro"))
    assert files
    with open(files[0], "rb") as fh:
        assert fh.read(4) == b"Obj\x01"
