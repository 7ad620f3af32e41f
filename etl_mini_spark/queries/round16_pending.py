"""Round-16 staged tier: the SQL:2016 row-pattern surface as a batch
differential (V-shape MATCH_RECOGNIZE-class detection over daily
revenue), two classic per-group sequential DPs no window frame can
express (weighted interval scheduling, longest increasing
subsequence), phonetic + edit-distance record linkage (American
Soundex replayed char-by-char in SQL, full Damerau-Levenshtein vs
DuckDB's builtin), a psychometrics block (Cronbach's alpha, one-way
ICC, Krippendorff's nominal alpha), deterministic RANSAC line fitting
under pure-integer inlier tests, marketing adstock with an exact
integer-halving carryover, MMR diverse top-k retrieval, single-source
BFS on a formulaic circulant graph, a streaming state-eviction batch
twin driven by as-of joins on BOTH engines (Spark union-sort vs DuckDB
native ASOF), seasonal Mann-Kendall, and Dunn's post-hoc pairwise z —
authored in round 14, to be registered no earlier than round 16.
DELIBERATELY ~15 entries: per the r13 verdict's backlog plan, tiers
stay small so ~35 window slots per round re-verify the stale r05-r08
cohort until that debt clears.

Module-local PENDING16_QUERIES/PENDING16_ORACLE (swept by
sweep_oracle.py alongside the registry and the round-15 tier) until a
future round rotates them into the driver window — the same two-step
every round since 7 has used.

Parity rules as in round9..15 (FIXTURES.md §C): integer/decimal
arithmetic end-to-end wherever a comparison decides a row (money as
exact BIGINT cents, durations as exact BIGINT micros, DP states and
adstock carryover as BIGINTs, RANSAC inlier tests as integer
cross-product inequalities — no division or sqrt ever decides
membership), libm-free except IEEE-exact sqrt of identical doubles,
per-term 9dp pre-rounds summed as BIGINT nanos before any display
division, deterministic tie-breaks on every rank and argmax (packed
BIGINT keys where an engine lacks composite arg_max), and
floor(x*10^k + 0.5)/10^k HALF_UP display rounding.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mini_spark.queries._base import _t

PENDING16_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
PENDING16_ORACLE: dict[str, str] = {}


def pq(name: str, sql: str | None = None):
    def deco(fn):
        PENDING16_QUERIES[name] = fn
        if sql is not None:
            PENDING16_ORACLE[name] = sql
        return fn

    return deco


def _pin(col, k: int = 6):
    """floor(x*10^k + 0.5)/10^k — the repo's HALF_UP display rounding,
    identical IEEE op sequence on both engines (FIXTURES.md §C)."""
    scale = 10 ** k
    return F.floor(col * scale + F.lit(0.5)) / scale


# Daily order-revenue cents — the bounded calendar series every
# sequential entry in this tier recurses over (same shape as the
# round-12 _daily_cents: one hash agg, ~2.4k rows at any SF).
_DAILY_SQL = """
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS d,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
      FROM orders GROUP BY 1
"""


def _daily_cents(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint").alias("c")
    )


# =====================================================================
# Block A — V-shape row patterns (MATCH_RECOGNIZE class, batch twin)
# =====================================================================

# PATTERN (STRT DOWN+ UP+) over the daily revenue series: a maximal
# strictly-falling run immediately followed by a maximal strictly-
# rising run. Directions come from exact integer cent diffs (FLAT days
# break a pattern), runs from the classic gaps-islands rn-rn id, and
# a match joins a DOWN run to the UP run that starts on its next day.
# Neither engine has MATCH_RECOGNIZE; both derive it from the same
# windows, which is the point of the differential.
_VSHAPE_SQL = f"""
    WITH daily AS ({_DAILY_SQL}),
    ser AS (
      SELECT d, c, row_number() OVER (ORDER BY d) AS i FROM daily),
    dirs AS (
      SELECT s2.i, s2.d, s2.c, s1.d AS prev_d, s1.c AS prev_c,
             CASE WHEN s2.c > s1.c THEN 'U' WHEN s2.c < s1.c THEN 'D'
                  ELSE 'F' END AS dir
      FROM ser s1 JOIN ser s2 ON s2.i = s1.i + 1),
    runs AS (
      SELECT i, d, c, prev_d, prev_c, dir,
             i - row_number() OVER (PARTITION BY dir ORDER BY i) AS grp
      FROM dirs),
    seg AS (
      SELECT dir, grp, min(i) AS i0, max(i) AS i1,
             CAST(count(*) AS BIGINT) AS len,
             min(prev_d) AS strt_d, arg_min(prev_c, i) AS strt_c,
             max(d) AS end_d, arg_max(c, i) AS end_c
      FROM runs GROUP BY dir, grp)
    SELECT dn.strt_d AS start_d, dn.end_d AS bottom_d, up.end_d AS end_d,
           dn.len AS n_down, up.len AS n_up,
           CAST(dn.strt_c - dn.end_c AS BIGINT) AS depth_cents,
           CAST(up.end_c - dn.end_c AS BIGINT) AS recovery_cents
    FROM seg dn JOIN seg up
      ON dn.dir = 'D' AND up.dir = 'U' AND up.i0 = dn.i1 + 1
    ORDER BY start_d
"""


@pq("pattern_vshape_runs", _VSHAPE_SQL)
def pattern_vshape_runs(spark, sf_dir):
    """MATCH_RECOGNIZE-class V-shape detection (STRT DOWN+ UP+) over
    daily revenue: exact integer cent diffs classify each day U/D/F,
    gaps-islands groups maximal runs, and a DOWN run joined to the UP
    run starting the next day is a match. Plan: one day agg, two
    ordered windows, one tiny self-join of run summaries — the series
    is calendar-bounded (~2.4k rows at any SF), so the single-partition
    windows are the CORRECT plan, not a scale hazard."""
    daily = _daily_cents(spark, sf_dir)
    ser = daily.select("d", "c", F.row_number().over(Window.orderBy("d")).alias("i"))
    s1, s2 = ser.alias("s1"), ser.alias("s2")
    dirs = s1.join(s2, F.col("s2.i") == F.col("s1.i") + 1).select(
        F.col("s2.i").alias("i"), F.col("s2.d").alias("d"), F.col("s2.c").alias("c"),
        F.col("s1.d").alias("prev_d"), F.col("s1.c").alias("prev_c"),
        F.when(F.col("s2.c") > F.col("s1.c"), "U")
        .when(F.col("s2.c") < F.col("s1.c"), "D").otherwise("F").alias("dir"),
    )
    runs = dirs.withColumn(
        "grp", F.col("i") - F.row_number().over(Window.partitionBy("dir").orderBy("i"))
    )
    seg = runs.groupBy("dir", "grp").agg(
        F.min("i").alias("i0"), F.max("i").alias("i1"),
        F.count("*").cast("bigint").alias("len"),
        F.min("prev_d").alias("strt_d"), F.min_by("prev_c", "i").alias("strt_c"),
        F.max("d").alias("end_d"), F.max_by("c", "i").alias("end_c"),
    )
    dn, up = seg.alias("dn"), seg.alias("up")
    return (
        dn.join(up, (F.col("dn.dir") == "D") & (F.col("up.dir") == "U")
                & (F.col("up.i0") == F.col("dn.i1") + 1))
        .select(
            F.col("dn.strt_d").alias("start_d"), F.col("dn.end_d").alias("bottom_d"),
            F.col("up.end_d").alias("end_d"), F.col("dn.len").alias("n_down"),
            F.col("up.len").alias("n_up"),
            (F.col("dn.strt_c") - F.col("dn.end_c")).cast("bigint").alias("depth_cents"),
            (F.col("up.end_c") - F.col("dn.end_c")).cast("bigint").alias("recovery_cents"),
        )
        .orderBy("start_d")
    )


# =====================================================================
# Block B — weighted interval scheduling (per-user sequential DP)
# =====================================================================

# Intervals from events: [ts, ts + value minutes), weight = value in
# cents — all derived with the identical floor(x+0.5) on both engines
# (value has 2dp, so *60 and *100 never land on .5). The DP
# dp_i = max(dp_{i-1}, w_i + dp_{p_i}) needs random access to an
# EARLIER state (p_i, the last interval ending before i starts), which
# no window frame expresses: Spark runs it as one Arrow pass per user
# (≤~100 rows each), the oracle replays it as a recursive CTE carrying
# the dp vector as a list. p_i comes from a bounded per-user self-join
# (≤100² pairs/user). Pure BIGINT throughout — no float ever.
_WIS_SQL = """
    WITH RECURSIVE iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s,
             epoch_us(ts) + CAST(floor(value * 60 + 0.5) AS BIGINT) * 1000000 AS e,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS w
      FROM events),
    ser AS (
      SELECT user_id, s, e, w,
             row_number() OVER (PARTITION BY user_id ORDER BY e, s, event_id) AS i
      FROM iv),
    p AS (
      SELECT a.user_id, a.i,
             CAST(coalesce(max(b.i), 0) AS BIGINT) AS p
      FROM ser a LEFT JOIN ser b
        ON b.user_id = a.user_id AND b.e <= a.s
      GROUP BY a.user_id, a.i),
    n AS (SELECT user_id, CAST(max(i) AS BIGINT) AS n FROM ser GROUP BY 1),
    rec AS (
      SELECT user_id, CAST(0 AS BIGINT) AS i, [CAST(0 AS BIGINT)] AS dp
      FROM n
      UNION ALL
      SELECT r.user_id, r.i + 1,
             list_append(r.dp,
               greatest(r.dp[CAST(r.i + 1 AS INT)],
                        s.w + r.dp[CAST(p.p + 1 AS INT)]))
      FROM rec r
      JOIN ser s ON s.user_id = r.user_id AND s.i = r.i + 1
      JOIN p ON p.user_id = r.user_id AND p.i = s.i)
    SELECT r.user_id, n.n AS n_intervals,
           r.dp[CAST(n.n + 1 AS INT)] AS best_cents
    FROM rec r JOIN n ON n.user_id = r.user_id AND r.i = n.n
    ORDER BY r.user_id
"""


@pq("interval_scheduling_wis", _WIS_SQL)
def interval_scheduling_wis(spark, sf_dir):
    """Weighted interval scheduling per user: the classic end-sorted
    DP with binary-searched predecessor, run as one Arrow pass per
    user. Every quantity is an exact BIGINT (epoch micros, cent
    weights), so the answer hash-matches the oracle's recursive-CTE
    replay bit-for-bit. Scale: users partition the work (hash shuffle
    on user_id only), each group is bounded by the per-user event
    count, and the kernel is O(n log n) per group — at 100 TB this is
    an embarrassingly parallel applyInPandas, no global sort."""
    import bisect

    import pandas as pd

    e = _t(spark, sf_dir, "events")
    iv = e.select(
        "user_id", "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts")
         + F.floor(F.col("value") * 60 + F.lit(0.5)).cast("bigint") * 1000000).alias("e"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("w"),
    )

    def wis(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["e", "s", "event_id"]).reset_index(drop=True)
        ends = pdf["e"].tolist()
        starts = pdf["s"].tolist()
        ws = pdf["w"].tolist()
        n = len(pdf)
        dp = [0] * (n + 1)
        for i in range(1, n + 1):
            p = bisect.bisect_right(ends, starts[i - 1], hi=i - 1)
            dp[i] = max(dp[i - 1], ws[i - 1] + dp[p])
        return pd.DataFrame(
            {"user_id": [int(pdf["user_id"][0])], "n_intervals": [n],
             "best_cents": [int(dp[n])]}
        )

    return (
        iv.groupBy("user_id")
        .applyInPandas(wis, schema="user_id long, n_intervals long, best_cents long")
        .orderBy("user_id")
    )


# =====================================================================
# Block C — longest increasing subsequence (per-user sequential DP)
# =====================================================================

# LIS of the cent-value sequence in event-time order, strictly
# increasing. Spark runs patience sorting (O(n log n) tails) per user;
# the oracle replays the O(n²) textbook DP as a recursive CTE that
# carries the dp vector and indexes the per-user value array with list
# lambdas — two genuinely different formulations of the same function,
# both exact integers.
_LIS_SQL = """
    WITH RECURSIVE ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      FROM events),
    ser AS (
      SELECT user_id, v,
             row_number() OVER (PARTITION BY user_id ORDER BY t, event_id) AS i
      FROM ev),
    arr AS (
      SELECT user_id, list(v ORDER BY i) AS vs,
             CAST(count(*) AS BIGINT) AS n
      FROM ser GROUP BY 1),
    rec AS (
      SELECT user_id, CAST(0 AS BIGINT) AS i, CAST([] AS BIGINT[]) AS dp
      FROM arr
      UNION ALL
      SELECT r.user_id, r.i + 1,
             list_append(r.dp,
               1 + coalesce(list_max(
                 list_transform(
                   list_filter(generate_series(1, CAST(r.i AS INT)),
                               j -> a.vs[j] < a.vs[CAST(r.i + 1 AS INT)]),
                   j -> r.dp[j])), 0))
      FROM rec r JOIN arr a ON a.user_id = r.user_id AND r.i < a.n)
    SELECT r.user_id, a.n AS n_events,
           CAST(list_max(r.dp) AS BIGINT) AS lis_len
    FROM rec r JOIN arr a ON a.user_id = r.user_id AND r.i = a.n
    ORDER BY r.user_id
"""


@pq("lis_events_per_user", _LIS_SQL)
def lis_events_per_user(spark, sf_dir):
    """Longest strictly-increasing subsequence of cent values per user
    (patience sorting, bisect_left tails). Scale notes as Block B: the
    shuffle is on user_id only, groups are bounded, and the kernel is
    O(n log n) — the oracle's O(n²) DP is the deliberately naive
    independent derivation, not the plan."""
    import bisect

    import pandas as pd

    e = _t(spark, sf_dir, "events")
    ev = e.select(
        "user_id", "event_id",
        F.unix_micros("ts").alias("t"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v"),
    )

    def lis(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t", "event_id"]).reset_index(drop=True)
        tails: list[int] = []
        for v in pdf["v"]:
            pos = bisect.bisect_left(tails, v)
            if pos == len(tails):
                tails.append(v)
            else:
                tails[pos] = v
        return pd.DataFrame(
            {"user_id": [int(pdf["user_id"][0])], "n_events": [len(pdf)],
             "lis_len": [len(tails)]}
        )

    return (
        ev.groupBy("user_id")
        .applyInPandas(lis, schema="user_id long, n_events long, lis_len long")
        .orderBy("user_id")
    )


# =====================================================================
# Block D — American Soundex phonetic groups (char-walk SQL twin)
# =====================================================================

# Spark has a builtin soundex(); DuckDB does not — the oracle replays
# the classic American algorithm char by char (translate() digit map,
# H/W removed as TRANSPARENT before adjacency so letters they separate
# still merge, adjacent equal digits collapsed via lag, vowels AEIOUY
# acting as separators, first letter kept with its own code dedup) —
# verified against Spark on the canonical Ashcraft→A261 /
# Tymczak→T522 / Pfister→P236 / Honeyman→H555 cases. Output groups the
# corpus vocabulary by code with SF-sensitive per-word document reach.
_SOUNDEX_SQL = """
    WITH tok AS (
      SELECT DISTINCT doc_id, w
      FROM documents, unnest(string_split(text, ' ')) AS t(w)
      WHERE regexp_matches(w, '^[a-z]+$')),
    reach AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n_docs FROM tok GROUP BY w),
    words AS (SELECT w, upper(w) AS uw FROM reach),
    chars AS (
      SELECT w, uw, i,
             substr(translate(uw, 'BFPVCGJKQSXZDTLMNR',
                                  '111122222222334556'), i, 1) AS cd
      FROM words, unnest(generate_series(1, length(uw))) AS t(i)),
    nohw AS (
      SELECT w, uw, i, cd,
             lag(cd) OVER (PARTITION BY w ORDER BY i) AS prev_cd
      FROM chars WHERE cd NOT IN ('H', 'W')),
    dedup AS (
      SELECT w, uw, i, cd FROM nohw
      WHERE NOT (cd BETWEEN '1' AND '6' AND cd = prev_cd)),
    codes AS (
      SELECT w, uw,
             string_agg(cd, '' ORDER BY i)
               FILTER (WHERE cd BETWEEN '1' AND '6' AND i > 1) AS ds
      FROM dedup GROUP BY w, uw),
    sx AS (
      SELECT c.w, substr(c.uw, 1, 1) || substr(coalesce(c.ds, '') || '000', 1, 3) AS code,
             r.n_docs
      FROM codes c JOIN reach r ON r.w = c.w)
    SELECT code, CAST(count(*) AS BIGINT) AS n_words,
           string_agg(w, ',' ORDER BY w) AS words,
           CAST(sum(n_docs) AS BIGINT) AS doc_reach
    FROM sx GROUP BY code
    ORDER BY code
"""


@pq("soundex_phonetic_groups", _SOUNDEX_SQL)
def soundex_phonetic_groups(spark, sf_dir):
    """Phonetic blocking audit: every corpus word encoded with American
    Soundex (Spark's builtin vs the oracle's char-walk replay — two
    truly independent implementations of the algorithm), grouped by
    code with word lists and document reach. Scale: the vocabulary is
    tiny after the distinct (the group-by runs on words, not tokens);
    the token explode is the only corpus-sized pass and it feeds a
    partial-aggregated distinct."""
    d = _t(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .distinct()
    )
    reach = tok.groupBy("w").agg(F.count("*").cast("bigint").alias("n_docs"))
    sx = reach.select("w", "n_docs", F.soundex(F.upper("w")).alias("code"))
    return (
        sx.groupBy("code")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.array_join(F.array_sort(F.collect_list("w")), ",").alias("words"),
            F.sum("n_docs").cast("bigint").alias("doc_reach"),
        )
        .orderBy("code")
    )


# =====================================================================
# Block E — full Damerau-Levenshtein blocked pairs
# =====================================================================

# DuckDB ships damerau_levenshtein() (FULL DL — 'CA'->'ABC' is 2, not
# the OSA 3); Spark has no counterpart, so the Spark side runs the
# textbook full-DL DP (alphabet last-occurrence table) as an
# Arrow-batched kernel over length-blocked vocabulary pairs. The
# blocked candidate mass is |V|²-bounded with |V| the corpus
# vocabulary — word-level linkage at 100 TB keeps |V| ~1e5-1e6, far
# below all-pairs doc space, and the block predicate (length ±1)
# prunes further before any kernel runs.
_DAMERAU_SQL = """
    WITH tok AS (
      SELECT DISTINCT doc_id, w
      FROM documents, unnest(string_split(text, ' ')) AS t(w)
      WHERE regexp_matches(w, '^[a-z]+$')),
    reach AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n_docs FROM tok GROUP BY w),
    pairs AS (
      SELECT a.w AS w1, b.w AS w2, a.n_docs AS docs_w1, b.n_docs AS docs_w2,
             CAST(damerau_levenshtein(a.w, b.w) AS BIGINT) AS dl
      FROM reach a JOIN reach b
        ON a.w < b.w AND abs(length(a.w) - length(b.w)) <= 1)
    SELECT w1, w2, dl, docs_w1, docs_w2
    FROM pairs WHERE dl <= 2
    ORDER BY w1, w2
"""


@pq("damerau_dl_blocked", _DAMERAU_SQL)
def damerau_dl_blocked(spark, sf_dir):
    """Full Damerau-Levenshtein (unrestricted transpositions) over
    length-blocked vocabulary pairs, vs DuckDB's builtin — the Spark
    side is the textbook DP with the alphabet last-occurrence table,
    Arrow-batched. Pure integers; the ≤2 cut is exact."""
    import pandas as pd

    def _dl_batch(w1s, w2s):
        def dl(a: str, b: str) -> int:
            # full DL: Lowrance-Wagner with da[] last-occurrence rows
            la, lb = len(a), len(b)
            maxd = la + lb
            da: dict[str, int] = {}
            d = [[maxd] * (lb + 2) for _ in range(la + 2)]
            d[1][1] = 0
            for i in range(1, la + 1):
                d[i + 1][1] = i
            for j in range(1, lb + 1):
                d[1][j + 1] = j
            for i in range(1, la + 1):
                db = 0
                for j in range(1, lb + 1):
                    k = da.get(b[j - 1], 0)
                    l = db
                    if a[i - 1] == b[j - 1]:
                        cost = 0
                        db = j
                    else:
                        cost = 1
                    d[i + 1][j + 1] = min(
                        d[i][j] + cost,            # substitute
                        d[i + 1][j] + 1,           # insert
                        d[i][j + 1] + 1,           # delete
                        d[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transpose
                    )
                da[a[i - 1]] = i
            return d[la + 1][lb + 1]

        return pd.Series([dl(x, y) for x, y in zip(w1s, w2s)])

    # the module-wide `from __future__ import annotations` stringifies
    # inline hints, which pandas_udf's type-hint inference rejects —
    # attach live objects instead
    _dl_batch.__annotations__ = {"w1s": pd.Series, "w2s": pd.Series, "return": pd.Series}
    dl_udf = F.pandas_udf(_dl_batch, "long")

    d = _t(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .distinct()
    )
    reach = tok.groupBy("w").agg(F.count("*").cast("bigint").alias("n_docs"))
    a = reach.select(F.col("w").alias("w1"), F.col("n_docs").alias("docs_w1"))
    b = reach.select(F.col("w").alias("w2"), F.col("n_docs").alias("docs_w2"))
    pairs = a.join(
        F.broadcast(b),
        (F.col("w1") < F.col("w2"))
        & (F.abs(F.length("w1") - F.length("w2")) <= 1),
    )
    return (
        pairs.withColumn("dl", dl_udf("w1", "w2"))
        .filter(F.col("dl") <= 2)
        .select("w1", "w2", "dl", "docs_w1", "docs_w2")
        .orderBy("w1", "w2")
    )
