"""BM25 keyword scoring over a document corpus.

Okapi BM25 (Robertson/Spärck Jones; the standard lexical ranking function)
for a FIXED query-term set — the curation use case: score documents for
topical relevance to a seed-term list (domain filtering, quality-weighted
sampling), not serving ad-hoc search.

Dataflow built for 100 TB:
- per-term ``tf`` is one ``regexp_count`` per query term per row (query
  term lists are small, single scan, zero shuffle, codegen'd);
- corpus statistics (N, avgdl, per-term document frequency) are ONE
  single-pass aggregate producing a 1-row relation that is broadcast back
  (literally ``crossJoin(broadcast(stats))``) — no second scan shape like
  a self-join;
- the final score is a pure column expression; optional top-k is a global
  ``orderBy ... limit`` which Spark executes as per-partition top-k +
  single-reduce (TakeOrderedAndProject), not a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olake_spark.operators.text import tokens

__all__ = ["bm25_scores"]


def _tf(term: str, text_col: str):
    # \b word boundaries; terms are plain words so no escaping needed beyond
    # documenting the assumption.
    return F.regexp_count(F.lower(F.col(text_col)), F.lit(rf"\b{term}\b"))


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
) -> DataFrame:
    """Score every document against ``query_terms``; returns
    ``(id_col, dl, tf_<term>..., bm25)`` ordered by score desc (id asc
    tiebreak) and limited to ``top_k`` when given.

    idf uses the standard smoothed form ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    — always positive, so stop-like terms cannot flip document ordering.
    """
    base = df.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("double").alias("dl"),
        *[_tf(t, text_col).cast("double").alias(f"tf_{t}") for t in query_terms],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).cast("double").alias(f"df_{t}")
            for t in query_terms
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for t in query_terms:
        tf = F.col(f"tf_{t}")
        idf = F.log(
            F.lit(1.0) + (F.col("n_docs") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5)
        )
        norm = tf + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        score = score + idf * (tf * F.lit(k1 + 1.0)) / norm
    out = scored.select(
        id_col,
        F.col("dl").cast("long").alias("dl"),
        *[F.col(f"tf_{t}").cast("long").alias(f"tf_{t}") for t in query_terms],
        score.alias("bm25"),
    )
    out = out.orderBy(F.col("bm25").desc(), F.col(id_col).asc())
    if top_k is not None:
        out = out.limit(top_k)
    return out
