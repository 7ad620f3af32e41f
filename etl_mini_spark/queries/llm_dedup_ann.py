from etl_mini_spark.queries._base import *  # noqa: F401,F403
from etl_mini_spark.queries._base import _t, _TMP  # noqa: F401

# North-star LLM-pipeline ops (SURVEY §2.11: DQ-34, DQ-35, dedup/text/ANN)
# =========================================================================

@q(
    "dedup_exact_docs",
    """SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
              CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS n_dups
       FROM documents GROUP BY 1""",
)
def dedup_exact_docs(spark, sf_dir):
    """DQ-34: exact dedup on normalized text."""
    return exact_dedup(_t(spark, sf_dir, "documents"), "text", "doc_id")


_JACCARD_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
     sh AS (SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) AS shingles
            FROM toks)
SELECT d1, d2, round(j, 6) AS jaccard FROM (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         len(list_intersect(a.shingles, b.shingles))::DOUBLE
           / len(list_distinct(list_concat(a.shingles, b.shingles))) AS j
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id) WHERE j >= 0.8
"""


@q("dedup_ngram_jaccard", _JACCARD_ORACLE)
def dedup_ngram_jaccard(spark, sf_dir):
    """Near-dup pairs, exact 3-word-shingle Jaccard ≥ 0.8 via inverted
    shingle index (the oracle brute-forces all pairs — deliberately a
    different plan shape for a stronger differential check)."""
    return near_dup_pairs_ngram_jaccard(_t(spark, sf_dir, "documents"), "doc_id", "text")


@q("dedup_minhash_lsh", _JACCARD_ORACLE)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(64)+LSH(16 bands, r=4) candidates, exact-verified at
    0.8 — per-pair miss prob (1-j⁴)¹⁶ ≈ 2e-4 at j=0.8, 4e-8 at j=0.9,
    so the oracle is the exact pair set. This is the 100 TB dedup path:
    candidate generation shuffles only (band, bucket) keys."""
    return near_dup_pairs_minhash_lsh(
        _t(spark, sf_dir, "documents"), "doc_id", "text", num_hashes=64, bands=16
    )


# SimHash oracle: DuckDB recomputes the exact 64-bit SimHash —
# whitespace tokens, per-token hash = first 8 md5 bytes big-endian
# (== python int.from_bytes(md5(tok).digest()[:8], 'big') ==
# ('0x'||substr(md5(tok),1,16))::UBIGINT), per-bit majority vote —
# then takes ALL pairs with bit_count(xor) <= 3. The Spark side must
# reproduce this exact pair set through the block-bucket LSH path.
_SIMHASH_BIT_SUMS = ",\n         ".join(
    f"sum(CAST((hv >> {i}) & 1 AS BIGINT)) AS b{i}" for i in range(64)
)
# bit weights as decimal literals: DuckDB's << overflows at bit 63
_SIMHASH_BIT_OR = " + ".join(
    f"(CASE WHEN 2 * v.b{i} > v.ntok THEN {1 << i}::UBIGINT ELSE 0::UBIGINT END)"
    for i in range(64)
)
_SIMHASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents
),
h AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS hv FROM toks
),
votes AS (
  SELECT doc_id, count(*) AS ntok,
         {_SIMHASH_BIT_SUMS}
  FROM h GROUP BY doc_id
),
sh AS (
  SELECT d.doc_id,
         COALESCE(({_SIMHASH_BIT_OR}), 0::UBIGINT) AS hv
  FROM documents d LEFT JOIN votes v ON d.doc_id = v.doc_id
)
SELECT a.doc_id AS d1, b.doc_id AS d2,
       CAST(bit_count(xor(a.hv, b.hv)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.hv, b.hv)) <= 3
"""


@q("dedup_simhash", _SIMHASH_ORACLE)
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs within hamming distance 3 via 4×16-bit
    block-bucket LSH (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 of 4 blocks equal,
    so recall is exactly 1) + exact bit_count(xor) verify. No all-pairs
    join anywhere — candidate volume is bounded by 16-bit block-bucket
    collisions. Differential oracle: DuckDB recomputes SimHash from
    scratch (same md5 token hash, same majority vote) and enumerates
    the exact pair set."""
    from etl_mini_spark.operators.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3, n_blocks=4
    )


@q(
    "similarity_topk",
    """SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
              round(list_cosine_similarity(c.embedding::DOUBLE[], p.embedding::DOUBLE[]), 6) AS cosine
       FROM embeddings c JOIN embeddings p
         ON p.vec_id % 50 = 0 AND c.vec_id <> p.vec_id
       QUALIFY row_number() OVER (PARTITION BY p.vec_id
                                  ORDER BY cosine DESC, c.vec_id) <= 5""",
)
def similarity_topk(spark, sf_dir):
    """DQ-35: exact top-5 cosine neighbors for probe vectors
    (vec_id % 50 = 0), brute force, JVM-side arithmetic."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0)
    return cosine_topk_bruteforce(emb, probes, k=5)


@q("similarity_ivf")  # recall<1 by design — rows-only check
def similarity_ivf(spark, sf_dir):
    """IVF ANN over trained spherical-k-means cells, nprobe=4/16 —
    the pruned scale path (scan ~25% of the corpus per probe)."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0)
    return cosine_topk_ivf(emb, probes, k=5, nprobe=4, n_cells=16)


@q(
    "embedding_near_dups",
    """SELECT a.vec_id AS id1, b.vec_id AS id2,
              round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45""",
)
def embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact scoring). Threshold 0.45:
    the synthetic embeddings are near-orthogonal (max natural cosine
    ~0.51 at sf0.01), so 0.95 yields an empty — vacuous — result;
    0.45 keeps a small non-empty pair set at every test SF."""
    return embedding_near_dup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.45)


@q(
    "embedding_near_dups_lsh",
    """WITH aug AS (
         SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
         UNION ALL
         SELECT vec_id + 1000000,
                list_transform(embedding::DOUBLE[], x -> x + 0.02)
         FROM embeddings WHERE vec_id % 25 = 0
       )
       SELECT a.vec_id AS id1, b.vec_id AS id2,
              round(list_cosine_similarity(a.embedding, b.embedding), 6) AS cosine
       FROM aug a JOIN aug b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95""",
)
def embedding_near_dups_lsh(spark, sf_dir):
    """Embedding near-dups via random-hyperplane LSH + exact verify —
    the non-broadcast 100 TB path (no side held in memory). Candidates
    are bucket cohabitants only; exact cosine verification makes the
    output the true pair set (per-pair miss prob ~3e-11 at cos≈0.987),
    so the oracle is the exact all-pairs query.

    The corpus is augmented with PLANTED near-dups (every 25th vector,
    re-inserted at vec_id+1e6 with +0.02 added to each component →
    cosine ≈ 0.987 to its source, ≤0.49 to everything else): the
    synthetic embeddings have no natural pairs above ~0.51, so without
    planting the ≥0.95 check is vacuously 0 = 0. Both engines build the
    same augmented corpus, so the oracle stays exact."""
    from etl_mini_spark.operators.similarity import embedding_near_dup_pairs_lsh

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.02)).alias("embedding"),
    )
    return embedding_near_dup_pairs_lsh(emb.unionByName(planted), threshold=0.95)


@q(
    "join_salted_skew",
    """SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS revenue
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment""",
)
def join_salted_skew(spark, sf_dir):
    """Skew-resistant salted join (deterministic salt, right side
    replicated) — row-identical to the plain join, so the oracle is the
    plain SQL join. The forced shuffle join shows the salt spreading
    one hot key over N reducers."""
    from etl_mini_spark.operators.joins import salted_join

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    j = salted_join(o, c.hint("shuffle_hash"), on=["o_custkey"], salts=8)
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )


@q(
    "text_quality",
    """SELECT doc_id,
              CAST(len(regexp_extract_all(trim(text), '\\S+')) AS BIGINT) AS n_tokens,
              round(len(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
                    / greatest(len(regexp_extract_all(trim(text), '\\S+')), 1), 6) AS avg_token_len,
              round(len(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE
                    / greatest(len(text), 1), 6) AS punct_ratio,
              round((len(regexp_extract_all(text, '\\bthe\\b')) + len(regexp_extract_all(text, '\\ba\\b'))
                     + len(regexp_extract_all(text, '\\bof\\b')) + len(regexp_extract_all(text, '\\band\\b'))
                     + len(regexp_extract_all(text, '\\bto\\b')) + len(regexp_extract_all(text, '\\bin\\b'))
                     + len(regexp_extract_all(text, '\\bis\\b')))::DOUBLE
                    / greatest(len(regexp_extract_all(trim(text), '\\S+')), 1), 6) AS stopword_ratio
       FROM documents""",
)
def text_quality(spark, sf_dir):
    """Quality features for corpus filtering (north star)."""
    d = _t(spark, sf_dir, "documents")
    out = TX.quality_features(d, "text", "doc_id")
    return out.select("doc_id", "n_tokens", "avg_token_len", "punct_ratio", "stopword_ratio")


@q(
    "text_token_counts",
    """SELECT doc_id,
              CAST(len(regexp_extract_all(trim(text), '\\S+')) AS BIGINT) AS n_ws_tokens,
              CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens
       FROM documents""",
)
def text_token_counts(spark, sf_dir):
    """Token counting: whitespace + BPE-ish regex pre-tokens."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count(F.col("text")).cast("long").alias("n_ws_tokens"),
        TX.bpe_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


@q(
    "text_lang_id",
    """SELECT doc_id,
              CASE WHEN s_en >= s_fr AND s_en >= s_es THEN 'en'
                   WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS pred_lang
       FROM (SELECT doc_id,
                    len(regexp_extract_all(text, '\\bthe\\b')) + len(regexp_extract_all(text, '\\ba\\b'))
                      + len(regexp_extract_all(text, '\\bof\\b')) + len(regexp_extract_all(text, '\\band\\b'))
                      + len(regexp_extract_all(text, '\\bto\\b')) AS s_en,
                    len(regexp_extract_all(text, '\\ble\\b')) + len(regexp_extract_all(text, '\\bla\\b'))
                      + len(regexp_extract_all(text, '\\bde\\b')) + len(regexp_extract_all(text, '\\bet\\b'))
                      + len(regexp_extract_all(text, '\\bles\\b')) AS s_fr,
                    len(regexp_extract_all(text, '\\bel\\b')) + len(regexp_extract_all(text, '\\bla\\b'))
                      + len(regexp_extract_all(text, '\\bde\\b')) + len(regexp_extract_all(text, '\\by\\b'))
                      + len(regexp_extract_all(text, '\\blos\\b')) AS s_es
             FROM documents)""",
)
def text_lang_id(spark, sf_dir):
    """Marker-word language ID heuristic (deterministic precedence)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TX.lang_id(F.col("text")).alias("pred_lang"))


@q(
    "text_fingerprint",
    """SELECT doc_id,
              md5(array_to_string(list_sort(list_distinct(
                    regexp_extract_all(trim(lower(text)), '\\S+'))), ' ')) AS fp
       FROM documents""",
)
def text_fingerprint(spark, sf_dir):
    """Order-insensitive doc fingerprint (sorted distinct token set)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))


# Round-14: the legacy `multimodal_decode` stub entry (deterministic
# fake kernel over fabricated payloads) retired from the registry —
# superseded by the oracle-backed real-pixel `multimodal_decode_real`
# differential in round13_ops.py, completing the retirement already
# made for multimodal_resize/multimodal_features in round 13. The
# function stays (un-registered) because bench.py's round-1 headline
# suite times it for BASELINE.md continuity, and the stub operator
# stays pytest-covered as the documented drop-in batch shape for heavy
# production decoders (tests/test_operators.py).
def multimodal_decode(spark, sf_dir):
    """Multimodal plumbing: binary payload column → mapInPandas decode
    (deterministic stub kernel; real batch/schema/Arrow path)."""
    d = attach_binary_payload(_t(spark, sf_dir, "documents"), "text")
    return decode_media(d, "doc_id")


# =========================================================================
