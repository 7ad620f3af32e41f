"""Round-7 PENDING queries — implemented and differentially tested now,
REGISTERED next round.

Why deferred: the driver's CORRECTNESS gate records exactly the first 50
registry entries, and every round-6 slot is already owned by a
never-driver-verified entry (tests/test_window_rotation.py enforces
"oracle-backed ⇒ driver-green row OR window slot", so registering these
now would break the invariant with no slot to give). They are verified
THIS round by tests/test_round7_pending.py — the exact harness the
registry tests use — and round 7 promotes them by moving the @-free
functions below into a registered module and granting freed slots.

Contents: PPJoin-style exact Jaccard set-similarity join (lossless
prefix/length/positional filters vs a naive all-pairs oracle), linear
time-series gap interpolation (the interior-gap twin of the LOCF fill),
a k-anonymity / l-diversity privacy report, Spark 4 SQL pipe syntax,
temperature-based mixture reweighting (share ∝ count^0.7),
INTERSECT ALL / EXCEPT ALL bag-semantics set ops, and corpus bigram-LM
document scoring (the KenLM-style quality-filter proxy).
"""

from etl_mini_spark.queries._base import _t
from pyspark.sql import Window
from pyspark.sql import functions as F

PENDING_QUERIES = {}
PENDING_ORACLE = {}


def pq(name, sql):
    def deco(fn):
        PENDING_QUERIES[name] = fn
        PENDING_ORACLE[name] = sql
        return fn

    return deco


# --- exact Jaccard set-similarity join with prefix filtering ---------------
# Spec shared with the oracle: token sets are DISTINCT whitespace tokens
# (shared normalization contract, length ≥ 3); pairs with
# Jaccard ≥ 3/5 — evaluated as the INTEGER comparison 5·|A∩B| ≥ 3·|A∪B|,
# so the threshold never touches a float. The ORACLE computes the naive
# exact join (full postings self-join); the Spark side generates
# candidates only from per-doc PREFIXES (the |A| − ⌈τ·|A|⌉ + 1 rarest
# tokens in a global (df, token) order — any pair meeting τ must share a
# prefix token), so the oracle doubles as a proof that the filter is
# lossless.
_SETJOIN_SQL = """
    WITH tok AS (
      SELECT DISTINCT doc_id, t AS tok FROM (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS t
        FROM documents)
      WHERE length(t) >= 3
    ),
    sz AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY 1),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isect
              FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT doc_a, doc_b, CAST(isect AS BIGINT) AS isect,
           CAST(x.sz + y.sz - isect AS BIGINT) AS un
    FROM inter JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
    WHERE 5 * isect >= 3 * (x.sz + y.sz - isect)
"""


@pq("setjoin_prefix_filter", _SETJOIN_SQL)
def setjoin_prefix_filter(spark, sf_dir):
    """PPJoin-style exact set-similarity join (Xiao et al., WWW'08):
    Jaccard ≥ 0.6 document pairs where candidates come ONLY from prefix
    postings. Rank each doc's tokens by global (df, token) ascending —
    rarest first; a pair at threshold τ must share one of each side's
    first |A| − ⌈τ|A|⌉ + 1 tokens, so the candidate join runs on the
    LOW-df end of the postings (the exact opposite of the stop-word
    mass), shrinking the candidate stream by orders of magnitude at
    corpus scale while provably losing nothing — the naive-join oracle
    checks exactly that. Three lossless filters stack (all integer
    arithmetic, no float ever decides a boundary): prefix, LENGTH
    (3·|A| ≤ 5·|B| ∧ 3·|B| ≤ 5·|A|), and POSITIONAL (a pair whose
    first shared prefix token sits at positions (pa, pb) can overlap at
    most 1 + min(|A|−pa, |B|−pb), which must reach ⌈(3/8)(|A|+|B|)⌉).
    Verification is per-pair ``array_intersect`` over each doc's
    collected token array — one O(|doc|) kernel per candidate, NOT an
    exploded postings re-join (measured 10× cheaper at a 200×-scale
    probe: the exploded form shuffles |cand|·|doc| rows)."""
    docs = _t(spark, sf_dir, "documents")
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
    # prefix_len = sz - ceil(3*sz/5) + 1, in integer arithmetic
    prefix = ranked.filter(
        F.col("rk") <= F.col("sz") - F.expr("(3 * sz + 4) div 5") + 1
    ).select("doc_id", "tok", "sz", "rk")
    a, b = prefix.alias("a"), prefix.alias("b")
    # LENGTH filter: Jaccard ≥ 3/5 forces 3·|A| ≤ 5·|B| ∧ 3·|B| ≤ 5·|A|
    # (|A∩B| ≤ min, |A∪B| ≥ max). It prunes even on df-flat corpora
    # where the prefix filter alone degenerates (uniform vocabularies
    # have no rare tail for the prefix to exploit).
    # POSITIONAL filter: overlap from the first shared token onward is
    # ≤ 1 + min(|A|−pa, |B|−pb) and must reach α = ⌈(3/8)(|A|+|B|)⌉;
    # n ≥ ⌈m/8⌉ ⟺ 8n ≥ m keeps it in integers. Any-token-pass is the
    # first-token test (the bound is largest at the earliest positions).
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (3 * F.col("a.sz") <= 5 * F.col("b.sz"))
            & (3 * F.col("b.sz") <= 5 * F.col("a.sz"))
            & (
                8 * (1 + F.least(F.col("a.sz") - F.col("a.rk"), F.col("b.sz") - F.col("b.rk")))
                >= 3 * (F.col("a.sz") + F.col("b.sz"))
            ),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    arrs = tok.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("tok")).alias("ta"), F.count("*").alias("sz")
    )
    x = arrs.withColumnsRenamed({"doc_id": "doc_a", "ta": "taa", "sz": "sza"})
    y = arrs.withColumnsRenamed({"doc_id": "doc_b", "ta": "tab", "sz": "szb"})
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .withColumn("isect", F.size(F.array_intersect("taa", "tab")).cast("long"))
        .withColumn("un", F.col("sza") + F.col("szb") - F.col("isect"))
        .filter(5 * F.col("isect") >= 3 * F.col("un"))
        .select("doc_a", "doc_b", "isect", "un")
    )


# --- linear time-series gap interpolation ----------------------------------
# Hourly mean value for 'purchase' events over the full span; missing
# hours linearly interpolated between the nearest observed hours
# (interior gaps only — leading/trailing edges stay NULL and are
# labeled 'edge').
_INTERP_SQL = """
    WITH obs AS (SELECT date_trunc('hour', ts) AS h, round(avg(value), 6) AS v
                 FROM events WHERE event_type = 'purchase' GROUP BY 1),
    b AS (SELECT min(h) AS h0, max(h) AS h1 FROM obs),
    grid AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
    j AS (SELECT g.h, o.v FROM grid g LEFT JOIN obs o ON o.h = g.h),
    f AS (SELECT h, v,
                 last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                   OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
                 last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
                   OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                 first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                   OVER (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh,
                 first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
                   OVER (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
          FROM j)
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           CASE WHEN v IS NOT NULL THEN 'obs'
                WHEN ph IS NULL OR nh IS NULL THEN 'edge'
                ELSE 'interp' END AS fill_kind,
           round(CASE WHEN v IS NOT NULL THEN v
                      WHEN ph IS NULL OR nh IS NULL THEN NULL
                      ELSE pv + (nv - pv) * date_diff('hour', ph, h)::DOUBLE
                                          / date_diff('hour', ph, nh)::DOUBLE
                 END, 6) AS value_filled
    FROM f
"""


@pq("timeseries_interpolate_linear", _INTERP_SQL)
def timeseries_interpolate_linear(spark, sf_dir):
    """Linear interpolation over interior gaps of an hourly series —
    the modeling-grade twin of timeseries_resample_fill's LOCF: each
    missing hour gets prev + (next−prev)·Δt/Δspan from the nearest
    observed values on each side, found with two IGNORE NULLS value
    windows (no self-join, no per-gap iteration). One sort per series
    (here: one series; per-key at scale via partitionBy) does the whole
    fill — the standard distributed formulation. Edges (before first /
    after last observation) are labeled, not fabricated."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    obs = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.round(F.avg("value"), 6).alias("v")
    )
    bounds = obs.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    j = grid.join(obs, "h", "left")
    w_prev = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("h").rowsBetween(0, Window.unboundedFollowing)
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    obs_v = F.when(F.col("v").isNotNull(), F.col("v"))
    f = (
        j.withColumn("ph", F.last(obs_h, ignorenulls=True).over(w_prev))
        .withColumn("pv", F.last(obs_v, ignorenulls=True).over(w_prev))
        .withColumn("nh", F.first(obs_h, ignorenulls=True).over(w_next))
        .withColumn("nv", F.first(obs_v, ignorenulls=True).over(w_next))
    )
    hours = lambda a, b: (F.unix_timestamp(b) - F.unix_timestamp(a)) / 3600.0  # noqa: E731
    kind = (
        F.when(F.col("v").isNotNull(), "obs")
        .when(F.col("ph").isNull() | F.col("nh").isNull(), "edge")
        .otherwise("interp")
    )
    val = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.when(
            F.col("ph").isNotNull() & F.col("nh").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * hours(F.col("ph"), F.col("h"))
            / hours(F.col("ph"), F.col("nh")),
        )
    )
    return f.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        kind.alias("fill_kind"),
        F.round(val, 6).alias("value_filled"),
    )


# --- k-anonymity / l-diversity privacy report ------------------------------
# QI = (nation, market segment, account-balance band); sensitive
# attribute = the CENTS digit of the balance — independent of the
# 1000-wide band by construction, and exactly representable in both
# engines (round(x*100) of a 2-decimal double is integer-exact). k=5, l=2.
_KANON_SQL = """
    SELECT c_nationkey,
           c_mktsegment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT abs(CAST(round(c_acctbal * 100) AS BIGINT)) % 10) AS BIGINT) AS l_div,
           count(*) >= 5 AS k_anonymous,
           count(DISTINCT abs(CAST(round(c_acctbal * 100) AS BIGINT)) % 10) >= 2 AS l_diverse
    FROM customer
    GROUP BY 1, 2, 3
"""


@pq("privacy_k_anonymity", _KANON_SQL)
def privacy_k_anonymity(spark, sf_dir):
    """Privacy-tier DQ report: k-anonymity (every quasi-identifier
    group ≥ k rows) and l-diversity (≥ l distinct sensitive values per
    group) over customer — the release-gate check that runs BEFORE a
    dataset ships to training (complements text_redact_pii, which
    scrubs inside values; this audits the join-able structure around
    them). One hash aggregation with a distinct-count: at 100 TB this
    is a two-shuffle partial-agg plan, nothing more. Suppression policy
    (drop/generalize violating groups) is the caller's next step; the
    report lists every group with its flags."""
    c = _t(spark, sf_dir, "customer")
    cents_digit = F.abs(F.round(F.col("c_acctbal") * 100).cast("long")) % 10
    return (
        c.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).alias("bal_band"),
        )
        .agg(
            F.count("*").alias("n"),
            F.count_distinct(cents_digit).alias("l_div"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_band",
            "n",
            "l_div",
            (F.col("n") >= 5).alias("k_anonymous"),
            (F.col("l_div") >= 2).alias("l_diverse"),
        )
    )


# --- SQL pipe syntax (Spark 4) ---------------------------------------------
_PIPE_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(avg(l_quantity), 6) AS avg_qty
    FROM lineitem
    WHERE l_shipdate >= DATE '1994-01-01'
    GROUP BY l_returnflag, l_linestatus
"""


@pq("sql_pipe_syntax", _PIPE_SQL)
def sql_pipe_syntax(spark, sf_dir):
    """Modern-SQL tier: Spark 4 SQL PIPE syntax (`|>` — SIGMOD'24
    'SQL Has Problems...' / GoogleSQL pipes): the same logical plan as
    the GROUP BY formulation, written as a linear dataflow. Catalyst
    lowers pipes to the identical resolved plan, so this costs nothing
    at any scale — the entry pins that the dialect actually works on
    this engine version against a standard-SQL oracle."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("r7_lineitem")
    return spark.sql(
        """
        FROM r7_lineitem
        |> WHERE l_shipdate >= DATE '1994-01-01'
        |> AGGREGATE count(*) AS n,
                     round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                     round(avg(l_quantity), 6) AS avg_qty
           GROUP BY l_returnflag, l_linestatus
        """
    )


# --- temperature-based mixture reweighting ---------------------------------
# The data-DERIVED twin of mixture_weighted_sample (whose rates come
# from a hash): per-source keep rates follow the temperature rule used
# to balance LM training mixes — share ∝ n_s^α (α=0.7 flattens the
# head), total budget 40 % of the corpus, rate capped at 1. Thresholds
# become integers (floor(rate·100000)) before the hash filter, so the
# keep/drop edge is engine-exact; the only cross-engine float is
# pow(n, 0.7), ~1e-16 relative, 5 decades away from a floor boundary.
_MIXTEMP_SQL = """
    WITH totals AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    wts AS (SELECT source, n, pow(n, 0.7) AS w FROM totals),
    tot AS (SELECT sum(w) AS sw, sum(n) AS sn FROM wts),
    rates AS (SELECT source, n,
                     least(1.0, (0.4 * sn * w / sw) / n) AS rate
              FROM wts CROSS JOIN tot),
    thr AS (SELECT source, n, rate,
                   CAST(floor(rate * 100000) AS BIGINT) AS t FROM rates),
    kept AS (SELECT d.source, count(*) AS n_kept
             FROM documents d JOIN thr ON d.source = thr.source
             WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':'), 1, 15)) AS BIGINT)
                     % 100000 < thr.t
             GROUP BY d.source)
    SELECT thr.source, CAST(thr.n AS BIGINT) AS n_total,
           round(thr.rate, 6) AS rate,
           CAST(COALESCE(kept.n_kept, 0) AS BIGINT) AS n_kept
    FROM thr LEFT JOIN kept ON thr.source = kept.source
"""


@pq("mixture_temperature_weights", _MIXTEMP_SQL)
def mixture_temperature_weights(spark, sf_dir):
    """Temperature-based mixture reweighting (the multilingual-LM
    sampling rule: share ∝ count^α): derive per-source keep rates FROM
    the corpus itself — weight n^0.7, normalize, scale to a 40 % token
    budget, cap at 1 — then keep rows by the md5-bucket threshold
    (operators/sampling.py:mixture_sample). Two tiny aggregates (source
    counts, one global sum) feed a broadcast join onto the corpus; the
    sample itself is a narrow map+filter, so at 100 TB the whole thing
    costs one source-keyed partial agg and one scan. Integer thresholds
    keep the boundary engine-exact. Output: per-source totals, rate,
    kept counts."""
    from etl_mini_spark.operators.sampling import mixture_sample

    d = _t(spark, sf_dir, "documents")
    totals = d.groupBy("source").agg(F.count("*").alias("n"))
    wts = totals.withColumn("w", F.pow("n", F.lit(0.7)))
    tot = wts.agg(F.sum("w").alias("sw"), F.sum("n").alias("sn"))
    thr = (
        wts.crossJoin(F.broadcast(tot))
        .withColumn("rate", F.least(F.lit(1.0), (0.4 * F.col("sn") * F.col("w") / F.col("sw")) / F.col("n")))
        .withColumn("t", F.floor(F.col("rate") * 100000).cast("long"))
        .select("source", "n", "rate", "t")
    )
    base = d.select("doc_id", "source").join(F.broadcast(thr), "source")
    kept = (
        mixture_sample(base, "doc_id", F.col("t"))
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        thr.join(kept, "source", "left")
        .select(
            "source",
            F.col("n").alias("n_total"),
            F.round("rate", 6).alias("rate"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


# --- bag-semantics set operations ------------------------------------------
# INTERSECT ALL / EXCEPT ALL over multisets with real duplicate
# multiplicity: event (user_id, event_type) rows repeat, and the two
# deterministic halves overlap. DISTINCT set ops are already covered
# (set_intersect / set_except); ALL variants preserve min/differences of
# multiplicities — a different operator in both engines.
_SETALL_SQL = """
    WITH a AS (SELECT user_id, event_type FROM events WHERE event_id % 3 <> 0),
    b AS (SELECT user_id, event_type FROM events WHERE event_id % 2 <> 0),
    i AS (SELECT *, 'intersect_all' AS op FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)),
    e AS (SELECT *, 'except_all' AS op FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b))
    SELECT op, user_id, event_type, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT * FROM i UNION ALL SELECT * FROM e)
    GROUP BY op, user_id, event_type
"""


@pq("set_ops_all", _SETALL_SQL)
def set_ops_all(spark, sf_dir):
    """U1 completion: INTERSECT ALL / EXCEPT ALL — bag semantics with
    true multiplicities (min(m_a, m_b) and m_a − m_b), which the
    DISTINCT set-op entries cannot exercise. Spark plans both as a
    single aggregate computing per-row counts on each side then
    replicating — one shuffle each, no join. Output rolls the surviving
    multiset up to (row, multiplicity) so the hash compare is
    order-free."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter("event_id % 3 <> 0").select("user_id", "event_type")
    b = ev.filter("event_id % 2 <> 0").select("user_id", "event_type")
    i = a.intersectAll(b).withColumn("op", F.lit("intersect_all"))
    e = a.exceptAll(b).withColumn("op", F.lit("except_all"))
    return (
        i.unionByName(e)
        .groupBy("op", "user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )


# --- corpus bigram-LM scoring ----------------------------------------------
# KenLM-style quality proxy without external models: train MLE bigram
# statistics ON the corpus, score every document by its mean bigram
# log-probability ln(c(w1,w2)/c(w1)). Scoring the training corpus means
# every bigram has count ≥ 1 — no smoothing needed, fully exact spec.
_BIGRAM_LM_SQL = """
    WITH d AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    big AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
            FROM d, UNNEST(range(1, len(t))) AS r(i)
            WHERE len(t) >= 2),
    c2 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
    c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
    sc AS (SELECT doc_id, ln(c12::DOUBLE / c1) AS lp
           FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1))
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(lp), 6) AS avg_logprob
    FROM sc GROUP BY doc_id
"""


@pq("text_bigram_lm_score", _BIGRAM_LM_SQL)
def text_bigram_lm_score(spark, sf_dir):
    """Corpus-LM document scoring — the quality-filter primitive that
    ranks documents by how 'typical' their word transitions are for
    the corpus (low mean bigram log-prob ⇒ boilerplate-free but also
    gibberish-prone; the tails feed manual review or cut thresholds).
    Differs from corpus_token_entropy (within-doc distribution) and
    text_quality (surface heuristics): this conditions on corpus-wide
    transition statistics. Plan: two hash aggregations build the model
    (bigram and unigram-context counts), two keyed joins replay it over
    the bigram stream, one doc rollup — every stage a partial-agg
    shuffle on its key; at 100 TB the model tables stay distributed
    (no broadcast of the vocabulary anywhere)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")
    big = (
        d.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = big.groupBy("w1").agg(F.count("*").alias("c1"))
    sc = (
        big.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .select("doc_id", F.log(F.col("c12").cast("double") / F.col("c1")).alias("lp"))
    )
    return sc.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"), F.round(F.avg("lp"), 6).alias("avg_logprob")
    )
