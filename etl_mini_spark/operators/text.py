"""Text-analysis operators for training-data pipelines (north star,
SURVEY.md §2.11): language ID, quality scoring, token counting,
document fingerprinting. All JVM-side built-ins — no Python in the hot
path — so they whole-stage-codegen over billions of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# n-gram/stopword marker lists per language (tiny public stopword sets).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "fr": ["le", "la", "de", "et", "les"],
    "es": ["el", "la", "de", "y", "los"],
}
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(F.size(tokens(col)))


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-style pre-tokens (letter/digit/punct runs)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))


def _wordlist_occurrences(col: Column, words: list[str]) -> Column:
    """Total occurrences of any word in ``words``, counted in ONE regex
    scan via alternation — \\b-delimited whole words never overlap, so
    this equals the sum of per-word counts while paying a single pass
    over the text instead of len(words) passes. Words are regex-escaped
    so entries like "c++" or "don't" can't warp the pattern."""
    import re as _re

    escaped = (_re.escape(w) for w in words)
    return F.size(F.regexp_extract_all(col, F.lit(rf"\b(?:{'|'.join(escaped)})\b"), 0))


def lang_score(col: Column, lang: str) -> Column:
    """Marker-word hit count for one language."""
    return _wordlist_occurrences(col, LANG_MARKERS[lang])


def lang_id(col: Column) -> Column:
    """Argmax of marker scores with fixed precedence en > fr > es.

    Deliberately simple n-gram/marker heuristic (the container has no
    fasttext/langdetect); precedence makes ties deterministic."""
    s_en, s_fr, s_es = (lang_score(col, x) for x in ("en", "fr", "es"))
    return (
        F.when((s_en >= s_fr) & (s_en >= s_es), F.lit("en"))
        .when(s_fr >= s_es, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def quality_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc quality features + a composite score.

    n_tokens, avg token length, punctuation ratio, stopword ratio —
    the standard cheap quality gates for LLM pre-training corpora."""
    t = F.col(text_col)
    n_tok = token_count(t)
    n_chars = F.length(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    n_stop = _wordlist_occurrences(t, STOPWORDS)
    avg_len = (F.length(F.regexp_replace(t, r"\s+", "")) / F.greatest(n_tok, F.lit(1))).cast("double")
    punct_ratio = (n_punct / F.greatest(n_chars, F.lit(1))).cast("double")
    stop_ratio = (n_stop / F.greatest(n_tok, F.lit(1))).cast("double")
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 4, F.lit(1.0)) * 0.3
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def fingerprint(col: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set. Robust to token reordering; pair with
    operators/dedup.simhash for near-dup-robust hashing."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(F.lower(col)))), " "))


# ---- PII redaction / chunking / corpus n-gram stats ----------------------
# Standard LLM-pretraining corpus hygiene ops. All pure Column
# expressions / narrow maps except the n-gram count (one hash-agg
# shuffle) — codegen-friendly, linear at 100 TB.

# Patterns valid and equivalent in both Java regex (Spark) and RE2
# (DuckDB oracle): no backrefs, no lookaround.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{13,16}\b", "<NUM>"),  # card-/account-shaped digit runs
]


def redact_pii(col: Column) -> Column:
    """Replace email / IPv4 / long-digit-run substrings with typed
    tokens. Order matters (emails first — an address can contain
    digits); each pattern is one JVM regexp_replace pass."""
    out = col
    for pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 128,
    stride: int = 64,
) -> DataFrame:
    """Split each document into overlapping token windows — the
    tokenize-and-pack step before embedding/training. Emits
    (id, chunk_id, chunk, n_tokens); the final chunk may be short.
    Narrow per-row explode — no shuffle; output row count is
    ~n_tokens/stride per doc."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)
    piece = F.slice(F.col("__toks"), F.col("start") + 1, window)
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") > 0)
        .select(id_col, "__toks", F.explode(F.sequence(F.lit(0), F.size("__toks") - 1, F.lit(stride))).alias("start"))
        .select(
            id_col,
            (F.col("start") / stride).cast("long").alias("chunk_id"),
            F.array_join(piece, " ").alias("chunk"),
            F.size(piece).cast("long").alias("n_tokens"),
        )
    )


def top_ngrams(df: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """Corpus-level top-k bigrams by count (deterministic (count desc,
    ngram) tie-break) — the cheap corpus-statistics pass used for
    boilerplate detection and contamination checks. One explode + one
    hash-agg shuffle + TakeOrdered; at 100 TB the agg is partial
    (map-side combine) so the shuffle carries distinct ngrams, not
    token occurrences."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[a-z0-9]+"), 0)
    bigrams = F.expr(
        "transform(sequence(0, size(__toks) - 2), i -> concat(__toks[i], ' ', __toks[i+1]))"
    )
    return (
        df.select(toks.alias("__toks"))
        .filter(F.size("__toks") >= 2)
        .select(F.explode(bigrams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "ngram")
        .limit(k)
    )


def repetition_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", §A1.1 repetition filters):
    documents dominated by repeated words/n-grams are low-quality
    training data. Per document:

    - ``n_words`` / ``n_distinct_words``
    - ``dup_word_frac``   — 1 − distinct/total words
    - ``dup_bigram_frac`` — 1 − distinct/total word-2-grams
    - ``top_word_frac``   — occurrences of the most frequent word /
      total words (ties broken lexicographically)

    Everything except top_word_frac is per-row array math (codegen, no
    shuffle). top_word_frac explodes to (doc, word) and aggregates —
    one shuffle on doc_id — then joins back on doc_id; both sides hash
    to the same key so AQE plans a co-located join, and nothing is
    force-broadcast (the per-doc table is O(corpus))."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size("words")
    base = df.select(F.col(id_col).alias("doc_id"), words.alias("words"))
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("words", 1, n - 1),
            F.slice(F.col("words"), 2, n - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    stats = base.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        F.size(F.array_distinct("words")).cast("long").alias("n_distinct_words"),
        bigrams.alias("bigrams"),
    ).select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        F.round(1 - F.col("n_distinct_words") / F.col("n_words"), 6).alias(
            "dup_word_frac"
        ),
        F.round(
            F.when(
                F.size("bigrams") > 0,
                1 - F.size(F.array_distinct("bigrams")) / F.size("bigrams"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_bigram_frac"),
    )
    counts = base.select("doc_id", F.explode("words").alias("w")).groupBy(
        "doc_id", "w"
    ).agg(F.count("*").alias("cnt"))
    win = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("w"))
    top = (
        counts.withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") == 1)
        .select("doc_id", F.col("cnt").alias("top_cnt"))
    )
    return stats.join(top, "doc_id").select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        "dup_word_frac",
        "dup_bigram_frac",
        F.round(F.col("top_cnt") / F.col("n_words"), 6).alias("top_word_frac"),
    )


def word_shingles(col: Column, n: int) -> Column:
    """Array of n-word shingles (space-joined) from whitespace tokens;
    empty array when the document has fewer than n words. Per-row array
    math — codegen-friendly, no shuffle."""
    w = tokens(col)
    sh = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(w, i, n)),
    )
    return F.when(F.size(w) >= n, sh).otherwise(F.array().cast("array<string>"))


def contamination_hits(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination: per document, how many word-level
    n-grams (default 13, the GPT-3/PaLM convention — Brown et al. 2020
    appendix C) also occur in a benchmark/eval corpus. Training docs
    with hits are contamination-removal candidates.

    Scale shape: the benchmark side is tiny (eval suites, not training
    corpora) — its distinct shingle-hash set is BROADCAST, so the
    corpus-side explode streams map-only through the join with no
    shuffle of the O(total tokens) shingle flow. Only the surviving
    hits (benchmark-selectivity-small) are shuffled for the per-doc
    distinct + count. Joining on md5(shingle) keeps the broadcast and
    the hit shuffle at 32 bytes/row regardless of n."""
    doc_sh = docs.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("__s")
    ).select(id_col, F.md5("__s").alias("__h"))
    bench_sh = (
        bench.select(F.explode(word_shingles(F.col(bench_text_col), n)).alias("__s"))
        .select(F.md5("__s").alias("__h"))
        .distinct()
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "__h")
        .select(id_col, "__h")
        .distinct()
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_contaminated"))
    )


def doc_frequency(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-token document frequency + IDF over the corpus — the
    vocabulary-statistics pass behind TF-IDF quality scoring and
    stopword discovery. One explode of per-doc DISTINCT tokens and one
    hash-agg on token (partial agg map-side, so the shuffle carries
    distinct tokens per partition, not occurrences); the corpus size
    joins in as a broadcast 1-row aggregate, keeping everything one
    job."""
    per_doc = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token")
    )
    dfreq = per_doc.groupBy("token").agg(F.count("*").cast("long").alias("df_docs"))
    total = df.agg(F.count("*").alias("__n_docs"))
    return dfreq.crossJoin(F.broadcast(total)).select(
        "token",
        "df_docs",
        F.round(F.log(F.col("__n_docs").cast("double") / F.col("df_docs")), 6).alias("idf"),
    )


def jaro(s1: str, s2: str) -> float:
    """Jaro similarity from its definition (match window
    max(l1,l2)//2 - 1, half-transpositions): the from-scratch kernel
    the blocked fuzzy-match path scores candidate pairs with (used via
    an Arrow batch pass — plain Python per pair, bounded by the
    BLOCKED candidate count, never n^2). Differentially pinned against
    DuckDB's independent native jaro_similarity by the
    jaro_blocked_pairs query. 6dp HALF_UP flip-safety: a half-boundary
    value is an odd multiple of 1/(2*10^6), so the reduced denominator
    must be exactly 2^7 * 5^a — 2-adic valuation 7. Here jaro =
    (m^2*(l1+l2) + (m-t)*l1*l2) / (3*l1*l2*m), and with a=v2(l1),
    b=v2(l2), c=v2(m): v2(numerator) >= min(2c+min(a,b), a+b), so the
    reduced denominator's valuation is <= max(c, max(a,b)-c). For
    strings SHORTER THAN 64 chars every valuation is <= 5, hence
    <= 5 < 7: no half-boundary is reachable (at l1=l2=256, m=128, t=1
    one IS: 85/128 = 0.6640625 — so the differential query bounds
    lengths < 64 structurally). Off-boundary margin: the exact
    rational sits >= 1/(q*2e6) >= ~7e-13 from any boundary
    (q <= 3*63^3), vs <= ~1e-15 accumulated IEEE error per engine —
    ~600x slack, so 1-ulp engine differences can never flip the pin."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    md = max(l1, l2) // 2 - 1
    f1, f2 = [False] * l1, [False] * l2
    m = 0
    for i, ch in enumerate(s1):
        lo, hi = max(0, i - md), min(l2, i + md + 1)
        for j in range(lo, hi):
            if not f2[j] and s2[j] == ch:
                f1[i] = f2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if f1[i]:
            while not f2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (m / l1 + m / l2 + (m - t) / m) / 3


def full_damerau_levenshtein(a: str, b: str) -> int:
    """Full (unrestricted) Damerau-Levenshtein distance —
    Lowrance-Wagner DP with the alphabet last-occurrence table, so
    'CA' -> 'ABC' is 2, not the OSA 3. Pure-integer kernel the
    blocked edit-distance path scores candidate pairs with (Arrow
    batch pass, bounded by the BLOCKED candidate count — the
    damerau_dl_blocked preflight caps that mass). Differentially
    pinned against DuckDB's independent native damerau_levenshtein by
    the damerau_dl_blocked query and recall-pinned at a 100k-word
    vocabulary by bench_scale.py's damerau_blocked_100k probe."""
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
