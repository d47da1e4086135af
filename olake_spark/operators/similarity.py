"""Similarity search over embedding columns (array<float>).

Two plans, one semantics:

- ``brute_force_topk`` — the exactness baseline: broadcast the (small) query
  set against the corpus, JVM-native dot products via
  ``aggregate(zip_with(...))``, per-query top-k window. Cost O(|Q|·|C|·d);
  right when |Q| is small (the common "probe" pattern) because the corpus is
  scanned once with no shuffle — at 100 TB the corpus never moves, only the
  broadcast queries do.
- ``lsh_bucket_topk`` — the scale path: random-hyperplane signatures (sign
  bits of ±1-plane dot products) bucket the corpus; each query searches only
  its bucket (and optional hamming-≤1 neighbor buckets). Planes are fixed
  seeded constants so results are reproducible in the SQL oracle.
- ``cosine_near_dup_pairs`` — embedding near-duplicate detection: bucketed
  candidate pairs verified with exact cosine.

Everything is double-precision with sequential fold order so DuckDB
(list_dot_product / list_cosine_similarity) reproduces values to ~1e-15;
compared outputs are rounded to 6 decimals.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from olake_spark.sources.files import spread

__all__ = [
    "LSH_PLANES",
    "cosine",
    "brute_force_topk",
    "lsh_signature",
    "lsh_bucket_topk",
    "ivf_assign",
    "ivf_topk",
    "cosine_near_dup_pairs",
]

_DIM = 64
# 8 sign bits → 256 buckets. Same-bucket candidate count is N²/(2·256):
# the plane count is the knob that keeps the near-dup self-join tractable —
# production corpora should scale it with log2(N) (e.g. 16-20 bits at
# billions of vectors) and/or multiprobe neighboring buckets for recall.
# 8 bits keeps the synthetic near-random test corpus producing real matches.
_NUM_PLANES = 8
_rng = random.Random(1234)
# ±1 hyperplane entries: dot products are plain signed sums of the embedding
# components — identical fold order in any engine (shared with the oracle)
LSH_PLANES: list[list[int]] = [
    [_rng.choice((-1, 1)) for _ in range(_DIM)] for _ in range(_NUM_PLANES)
]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Output: (query_id, neighbor_id, rank, cosine_sim). Self-matches excluded.
    The query side is broadcast — the corpus is streamed once, no shuffle
    until the final (tiny) per-query window.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    sim = F.round(cosine(F.col("_qv"), F.col("_cv")), 9).alias("_sim9")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim)
    )
    w = W.partitionBy("query_id").orderBy(F.col("_sim9").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("_sim9"), 6).alias("cosine_sim"),
        )
    )


def lsh_signature(vec: Column) -> Column:
    """Bucket id = integer of sign bits of the ±1-plane dot products."""
    sig = F.lit(0)
    for j, plane in enumerate(LSH_PLANES):
        arr = F.array(*[F.lit(float(w)) for w in plane])
        sig = sig + F.when(_dot(vec, arr) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return sig.cast("int")


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Approximate top-k: search only the query's LSH bucket.

    Recall < 1 by design; at scale the bucket join replaces the corpus scan
    per query with a hash-partitioned equi-join on the signature.
    """
    c = spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        lsh_signature(F.col(vec_col)).alias("_sig"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        lsh_signature(F.col(vec_col)).alias("_sig"),
    )
    sim = F.round(cosine(F.col("_qv"), F.col("_cv")), 9).alias("_sim9")
    scored = (
        c.join(F.broadcast(q), "_sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim)
    )
    w = W.partitionBy("query_id").orderBy(F.col("_sim9").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", F.round(F.col("_sim9"), 6).alias("cosine_sim")
        )
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Assign each vector to its nearest centroid (cosine, nprobe=1).

    Centroids are broadcast (they are tiny by construction); each vector
    scores every centroid map-side — no shuffle until the per-vector argmax
    window, which partitions on the vector id. Ties break on centroid id.
    """
    scored = df.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("_cent_id"),
        F.round(cosine(F.col(vec_col), F.col("_cent_v")), 9).alias("_cs"),
    )
    w = W.partitionBy(id_col).orderBy(F.col("_cs").desc(), F.col("_cent_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, F.col("_cent_id").alias("_cell"))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    centroid_stride: int = 97,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    centroid cells, search only the query's cell.

    Centroids here are a deterministic corpus subset (ids divisible by
    ``centroid_stride``) so the SQL oracle reproduces the index exactly;
    production swaps in k-means centroids — the dataflow (assign → cell
    equi-join → per-query top-k) is identical. Versus LSH buckets, IVF
    cells adapt to the data distribution; ``centroid_stride`` ∝ sqrt(N)
    balances cell size against the assignment fan-out.
    """
    cents = spread(corpus, id_col).filter(
        (F.col(id_col) % centroid_stride) == 0
    ).select(F.col(id_col).alias("_cent_id"), F.col(vec_col).alias("_cent_v"))
    ca = ivf_assign(
        spread(corpus, id_col).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
        ),
        cents, "neighbor_id", "_cv",
    )
    qa = ivf_assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")),
        cents, "query_id", "_qv",
    )
    sim = F.round(cosine(F.col("_qv"), F.col("_cv")), 9).alias("_sim9")
    scored = (
        ca.join(F.broadcast(qa), "_cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim)
    )
    w = W.partitionBy("query_id").orderBy(F.col("_sim9").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", F.round(F.col("_sim9"), 6).alias("cosine_sim")
        )
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """Embedding near-duplicate pairs with cosine ≥ threshold.

    Candidates come from the LSH bucket join (same-signature pairs), then
    exact cosine verifies — the scalable shape; brute-force verification of
    a petabyte corpus is never an option.
    """
    # cache the signed signatures: the self-join would otherwise compute the
    # 8 hyperplane dot products per vector twice (once per join side)
    t = spread(df, id_col).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        lsh_signature(F.col(vec_col)).alias("_sig"),
    ).cache()
    a, b = t.alias("a"), t.alias("b")
    sim = F.round(cosine(F.col("a._v"), F.col("b._v")), 6)
    return (
        a.join(b, (F.col("a._sig") == F.col("b._sig")) & (F.col("a._id") < F.col("b._id")))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
