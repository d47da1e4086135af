"""Linear text classifier over hashed bag-of-words features.

The model-based filtering stage of a modern pretraining pipeline (the
DataComp / FineWeb-edu pattern): a cheap linear classifier scores every
document and a threshold keeps the high-quality tail. This module is the
*serving* side — apply a trained (weights, bias) to 100 TB of text — with
the classic hashing trick (token → bucket via a stable hash) so the
feature space is fixed-width and vocabulary-free.

Weights are INTEGER micro-units (1e-6): the per-document logit is then an
exact integer sum, which is order-free — distributed aggregation gives the
same bits on any partitioning, any engine. Only the final sigmoid touches
floating point, applied once to the already-exact logit and rounded.

Scale shape: one explode + one map-side-combinable integer sum per doc.
Small weight vectors (≤ ``ARRAY_LITERAL_MAX`` buckets) ride the plan as a
plain array literal — no join, no broadcast, no Python. Larger vectors
switch to a broadcast hash join on the bucket id: ``F.array`` of N
literals is N expression nodes, and at 65k buckets that is the same
Janino/constant-pool codegen blowup class the LSH signature path had —
a broadcast of a 65k-row two-column table is KBs and keeps codegen small.

``default_weights`` generates a deterministic pseudo-trained weight vector
(fixed seed) so the operator is exercisable end-to-end without shipping a
real model; swap in real trained weights in production.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olake_spark.operators.dedup import hash60
from olake_spark.operators.text import tokens

__all__ = ["default_weights", "hashed_bow_logits", "classify_quality"]

WEIGHT_SCALE = 1_000_000  # micro-units: weight doubles = w_int / 1e6

# above this bucket count the weight vector joins as a broadcast table
# instead of an array literal (each literal is one expression node; tens of
# thousands of nodes risk Janino method/constant-pool limits in codegen)
ARRAY_LITERAL_MAX = 2048


def default_weights(n_buckets: int = 256, seed: int = 7) -> list[int]:
    """Deterministic stand-in weight vector (integer micro-units in
    [-1e6, 1e6], i.e. real-valued weights in [-1, 1])."""
    rng = random.Random(seed)
    return [rng.randrange(-WEIGHT_SCALE, WEIGHT_SCALE + 1) for _ in range(n_buckets)]


def hashed_bow_logits(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: list[int],
    bias: int = 0,
) -> DataFrame:
    """(id, n_tokens, logit_micro) — exact-integer logit per document.

    ``logit_micro = bias + Σ_tokens weights[hash(token) % B]`` in micro-units;
    every token OCCURRENCE contributes (bag-of-words with counts). Empty
    documents score exactly ``bias``.
    """
    b = len(weights)
    if b == 0:
        raise ValueError("weights must be non-empty")
    t = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")).filter(
        F.col("tok") != ""
    )
    if b <= ARRAY_LITERAL_MAX:
        wl = F.array(*[F.lit(int(w)) for w in weights])
        contrib = t.select(
            id_col, F.element_at(wl, (hash60(F.col("tok")) % b + 1).cast("int")).alias("_w")
        )
    else:
        # broadcast weight table: (bucket, _w) is ≤ ~1 MB even at 65k buckets;
        # the inner join is total (every bucket id 0..b-1 has a weight row)
        wdf = t.sparkSession.createDataFrame(
            [(i, int(w)) for i, w in enumerate(weights)], "bucket INT, _w BIGINT"
        )
        contrib = (
            t.withColumn("bucket", (hash60(F.col("tok")) % b).cast("int"))
            .join(F.broadcast(wdf), "bucket")
            .select(id_col, "_w")
        )
    agg = contrib.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"), F.sum("_w").alias("_z")
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            (F.coalesce(F.col("_z"), F.lit(0)) + F.lit(int(bias)))
            .cast("long")
            .alias("logit_micro"),
        )
    )


def classify_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: list[int],
    bias: int = 0,
    threshold: float = 0.5,
) -> DataFrame:
    """(id, n_tokens, logit_micro, score, keep) — sigmoid score rounded to
    6 decimals; ``keep`` = score ≥ threshold. The sigmoid is the only
    floating-point step and consumes an exact integer, so the decision
    boundary is engine-independent."""
    z = F.col("logit_micro") / F.lit(float(WEIGHT_SCALE))
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return hashed_bow_logits(df, id_col, text_col, weights, bias).select(
        id_col,
        "n_tokens",
        "logit_micro",
        score.alias("score"),
        (score >= threshold).alias("keep"),
    )
