"""Similarity search over embedding columns (array<float>).

Two plans, one semantics:

- ``brute_force_topk`` — the exactness baseline: broadcast the (small) query
  set against the corpus, JVM-native dot products via
  ``aggregate(zip_with(...))``, per-query top-k window. Cost O(|Q|·|C|·d);
  right when |Q| is small (the common "probe" pattern) because the corpus is
  scanned once with no shuffle — at 100 TB the corpus never moves, only the
  broadcast queries do.
- ``lsh_bucket_topk`` — the scale path: banded multi-table random-hyperplane
  LSH. ``n_tables`` (L) independent tables of ``n_planes`` (b) sign bits
  each; a pair is a candidate when it collides in ANY table (the same
  union-of-bands shape as MinHash). Recall comes from L, selectivity from b:
  per-table collision probability for near-random vectors is 2^-b, so the
  expected candidate count is L·N²/2^(b+1) — b is the knob that keeps every
  bucket's self-join bounded as N grows (b ≈ log2(N) - log2(target bucket
  size)), while L recovers the recall a single fine-grained table loses.
  Planes are fixed seeded constants so results are reproducible in the SQL
  oracle.
- ``cosine_near_dup_pairs`` — embedding near-duplicate detection: banded
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
    "lsh_planes",
    "lsh_signature",
    "lsh_bands",
    "lsh_bucket_topk",
    "ivf_assign",
    "ivf_topk",
    "ivf_train_centroids",
    "cosine_near_dup_pairs",
]

_DIM = 64
# Defaults sized for the synthetic test corpus: 8 bits × 2 tables. At real
# corpus sizes raise n_planes with log2(N) (16-24 bits at billions of
# vectors) and n_tables (8-32) for recall — the candidate count is
# L·N²/2^(b+1), so b bounds every bucket and L buys back recall.
_NUM_PLANES = 8
_NUM_TABLES = 2


def lsh_planes(
    n_tables: int = _NUM_TABLES, n_planes: int = _NUM_PLANES, dim: int = _DIM
) -> list[list[list[int]]]:
    """L independent tables of b ±1 hyperplanes, deterministically seeded.

    ±1 entries keep the plane dot products plain signed sums of embedding
    components — identical fold order in any engine (shared with the SQL
    oracle, which inlines these same literals).
    """
    rng = random.Random(1234)
    return [
        [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]


# single-table planes kept as a module constant for the oracle SQL generator
LSH_PLANES: list[list[int]] = lsh_planes(1)[0]


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


def lsh_signature(vec: Column, planes: list[list[int]] | None = None) -> Column:
    """Bucket id = integer of sign bits of the ±1-plane dot products."""
    sig = F.lit(0)
    for j, plane in enumerate(planes if planes is not None else LSH_PLANES):
        arr = F.array(*[F.lit(float(w)) for w in plane])
        sig = sig + F.when(_dot(vec, arr) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return sig.cast("int")


def lsh_bands(vec: Column, tables: list[list[list[int]]]) -> Column:
    """Array of (band, sig) structs — one per LSH table — for one explode.

    All L signatures are computed in a single projection pass over the
    vector; exploding multiplies only the (id, band, sig) relation, never
    re-reads the corpus."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band"), lsh_signature(vec, planes).alias("sig")
            )
            for i, planes in enumerate(tables)
        ]
    )


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_tables: int = _NUM_TABLES,
    n_planes: int = _NUM_PLANES,
) -> DataFrame:
    """Approximate top-k: search the union of the query's buckets across L
    banded LSH tables.

    Recall < 1 by design and grows with ``n_tables``; ``n_planes`` bounds
    bucket size (≈ N/2^b per table), so the bucket equi-join stays hash-
    partitioned and bounded as the corpus scales — there is no fixed
    256-bucket ceiling. A pair colliding in several tables is scored once
    per collision and deduped by ``distinct()`` (collisions beyond the first
    are exactly the near-neighbors — a vanishing fraction of candidates)."""
    tables = lsh_planes(n_tables, n_planes)
    c = spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.explode(lsh_bands(F.col(vec_col), tables)).alias("_b"),
    ).select("neighbor_id", "_cv", "_b.band", "_b.sig")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(lsh_bands(F.col(vec_col), tables)).alias("_b"),
    ).select("query_id", "_qv", "_b.band", "_b.sig")
    sim = F.round(cosine(F.col("_qv"), F.col("_cv")), 9).alias("_sim9")
    scored = (
        c.join(F.broadcast(q), ["band", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim)
        .distinct()
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


def ivf_train_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 3,
) -> DataFrame:
    """Lloyd's k-means over the embedding column, pure DataFrame ops — the
    production replacement for ``ivf_topk``'s deterministic stride centroids.

    Init = first k vectors by id (deterministic). Each iteration is two
    shuffles, both map-side combinable at 100 TB:

    1. assign: broadcast the k centroids, per-vector argmax (``ivf_assign``)
    2. update: ``posexplode`` the member vectors → groupBy (cell, dim) avg
       (k·d result rows) → re-assemble ordered arrays

    No vector ever crosses the wire un-aggregated in step 2 — the partial
    averages combine map-side, so the update shuffle carries O(partitions ·
    k · d) rows regardless of corpus size. Output: (_cent_id, _cent_v), the
    shape ``ivf_assign``/``ivf_topk`` consume.
    """
    cents = (
        corpus.orderBy(F.col(id_col))
        .limit(k)
        .select(
            F.col(id_col).alias("_cent_id"),
            F.col(vec_col).cast("array<double>").alias("_cent_v"),
        )
    )
    vecs = spread(corpus, id_col).select(
        F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vv")
    )
    for _ in range(iters):
        assigned = ivf_assign(vecs, cents, "_vid", "_vv")
        by_dim = assigned.select(
            "_cell", F.posexplode(F.col("_vv").cast("array<double>")).alias("_pos", "_x")
        )
        means = by_dim.groupBy("_cell", "_pos").agg(F.avg("_x").alias("_m"))
        cents = (
            means.groupBy("_cell")
            .agg(
                F.array_sort(F.collect_list(F.struct("_pos", "_m"))).alias("_pm")
            )
            .select(
                F.col("_cell").alias("_cent_id"),
                F.expr("transform(_pm, s -> s._m)").alias("_cent_v"),
            )
        )
    return cents


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_tables: int = _NUM_TABLES,
    n_planes: int = _NUM_PLANES,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs with cosine ≥ threshold.

    Candidates come from the banded multi-table LSH band join (a pair
    qualifies if it collides in ANY of the L tables — the MinHash
    union-of-bands shape), then exact cosine verifies. ``n_planes`` bounds
    per-table bucket size so the self-join stays sub-quadratic as the
    corpus grows; ``n_tables`` restores the recall fine buckets lose;
    ``max_bucket_size`` additionally drops degenerate hot buckets (e.g. a
    spike of identical embeddings) before the self-join.
    """
    from olake_spark.operators.dedup import cap_buckets

    tables = lsh_planes(n_tables, n_planes)
    # cache the banded relation: it feeds both self-join sides — without the
    # cache every hyperplane dot product runs twice
    t = spread(df, id_col).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.explode(lsh_bands(F.col(vec_col), tables)).alias("_b"),
    ).select("_id", "_v", "_b.band", "_b.sig")
    t = cap_buckets(t, ["band", "sig"], max_bucket_size).cache()
    a, b = t.alias("a"), t.alias("b")
    sim = F.round(cosine(F.col("a._v"), F.col("b._v")), 6)
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            sim.alias("cosine_sim"),
        )
        .distinct()
        .filter(F.col("cosine_sim") >= threshold)
    )
