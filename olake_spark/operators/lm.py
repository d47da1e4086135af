"""Corpus n-gram language model — train + in-distribution scoring.

The KenLM-shaped quality filter of LLM data pipelines (CCNet / Gopher /
RedPajama all score documents against a reference LM and drop the
tails), rebuilt on exact-integer statistics so the score is
partition-order-free and oracle-reproducible — no floating log-prob sum
whose addition order could flip a rounding (beyond parity: the
reference replicates rows, it never judges text; SURVEY.md §2.12).

- ``bigram_counts``: (w1, w2, cnt) over whitespace tokens — one
  explode + one map-side-combinable groupBy; vocabulary-sized output.
- ``lm_coverage_score``: per document, the share of its bigrams the
  reference LM has seen at least ``min_count`` times, plus the average
  observed bigram count. Exact integers until the final division
  (integer ratios divide to the same IEEE double in any engine); the
  per-doc bigram relation joins the broadcast LM on the bigram key —
  corpus rows shuffle once on doc_id, the LM never shuffles.

Scale: train = one shuffle of (w1, w2) partials (Zipf-bounded output);
score = explode + broadcast join + per-doc aggregate — the same plan
family as the TF-IDF/BM25 operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bigram_counts", "lm_coverage_score"]


def _bigrams(text_col: str):
    toks = F.split(
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "), " "
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1))),
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.try_element_at(toks, i + 1).alias("w2"),
        ),
    )
    return F.filter(pairs, lambda p: p["w2"].isNotNull())


def bigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Train: corpus bigram frequency table (w1, w2, cnt)."""
    return (
        df.select(F.explode(_bigrams(text_col)).alias("_bg"))
        .select(F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def lm_coverage_score(
    df: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Score each document against a trained bigram LM.

    Returns (id, n_bigrams, n_known, coverage, avg_bigram_cnt):
    ``n_known`` counts the doc's bigram OCCURRENCES whose corpus count is
    ≥ ``min_count``; ``coverage`` = n_known/n_bigrams (rounded 6);
    ``avg_bigram_cnt`` = mean corpus count over the doc's bigrams
    (unseen = 0, rounded 4). Low coverage = out-of-distribution text —
    the drop criterion. Documents with no bigram (≤1 token) score NULL.
    """
    occ = df.select(
        F.col(id_col), F.explode(_bigrams(text_col)).alias("_bg")
    ).select(
        id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2")
    )
    joined = occ.join(F.broadcast(lm), ["w1", "w2"], "left").select(
        id_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("_c")
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.when(F.col("_c") >= min_count, 1).otherwise(0)).alias(
            "n_known"
        ),
        F.round(
            F.sum(F.when(F.col("_c") >= min_count, 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("coverage"),
        F.round(F.sum("_c") / F.count(F.lit(1)), 4).alias("avg_bigram_cnt"),
    )
