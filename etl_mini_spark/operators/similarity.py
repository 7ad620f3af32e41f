"""Vector-similarity operators over ``array<float>`` embedding columns.

- ``cosine_topk_bruteforce`` — exact top-k: broadcast the (small) probe
  set against the corpus; the dot product stays JVM-side via
  ``zip_with`` + ``aggregate`` (no Python in the hot path). On a
  cluster, the corpus scan is embarrassingly parallel; the only shuffle
  is the final per-probe top-k (tiny).
- ``cosine_topk_ivf`` — IVF-style scale path: partition the corpus into
  coarse cells (deterministic centroids from a labeled/bucketed
  column), search only the ``nprobe`` closest cells. At 100 TB this
  turns a full-corpus scan per probe into a cell-pruned scan.
- ``embedding_near_dup_pairs`` — all-pairs cosine ≥ threshold;
  blocked self-join (broadcast one side when small; at scale swap in
  the LSH band join from operators/dedup.py on sign-random-projection
  sketches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, JVM-side."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe vector.

    Rank on the 6-decimal-rounded similarity with the neighbor id as
    tie-breaker so results are deterministic across partitionings and
    engines. Returns (probe_id, neighbor_id, cosine)."""
    p = probes.select(
        F.col(id_col).alias(probe_id_col), F.col(vec_col).alias("__pvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    scored = (
        c.join(F.broadcast(p), F.col("neighbor_id") != F.col(probe_id_col))
        .withColumn("cosine", F.round(cosine_similarity_col(F.col("__cvec"), F.col("__pvec")), 6))
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(probe_id_col, "neighbor_id", "cosine")
    )


def centroids_by(corpus: DataFrame, cell_col: str, vec_col: str = "embedding") -> DataFrame:
    """Deterministic per-cell centroids: posexplode → avg per (cell, dim)
    → re-assemble. (cell, centroid array<double>)."""
    dims = (
        corpus.select(F.col(cell_col).alias("cell"), F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("cell", "dim")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
    )
    return (
        dims.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select("cell", F.transform("dc", lambda s: s.getField("c")).alias("centroid"))
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """IVF ANN: route each probe to its ``nprobe`` nearest cell
    centroids, brute-force only inside those cells. Recall < 1 by
    design; rank determinism as in the brute-force path."""
    cents = centroids_by(corpus, cell_col, vec_col)
    p = probes.select(F.col(id_col).alias(probe_id_col), F.col(vec_col).alias("__pvec"))
    routed = p.join(F.broadcast(cents)).withColumn(
        "__csim", F.round(cosine_similarity_col(F.col("__pvec"), F.col("centroid")), 6)
    )
    wr = Window.partitionBy(probe_id_col).orderBy(F.col("__csim").desc(), F.col("cell"))
    probe_cells = (
        routed.withColumn("__cr", F.row_number().over(wr))
        .filter(F.col("__cr") <= nprobe)
        .select(probe_id_col, "__pvec", "cell")
    )
    c = corpus.select(
        F.col(cell_col).alias("cell"), F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    scored = (
        c.join(F.broadcast(probe_cells), "cell")
        .filter(F.col("neighbor_id") != F.col(probe_id_col))
        .withColumn("cosine", F.round(cosine_similarity_col(F.col("__cvec"), F.col("__pvec")), 6))
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(probe_id_col, "neighbor_id", "cosine")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold, id1 < id2. Broadcast
    self-join; for corpora too large to broadcast, block by an LSH
    sketch first (see operators/dedup.py banding)."""
    a = corpus.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("__v1"))
    b = corpus.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("__v2"))
    return (
        a.join(F.broadcast(b), F.col("id1") < F.col("id2"))
        .withColumn("cosine", F.round(cosine_similarity_col(F.col("__v1"), F.col("__v2")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )
