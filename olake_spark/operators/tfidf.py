"""TF-IDF term weighting and corpus vocabulary statistics.

Two corpus-level text-analysis operators the curation stack leans on:

- ``tfidf_top_terms``: the ``top_n`` most characteristic terms of every
  document by classic ``tf · ln(N/df)`` — keyword extraction for topic
  bucketing, near-dup explanation, and cluster labeling.
- ``vocab_coverage``: the Zipf head of the corpus vocabulary with
  cumulative token coverage — the artifact you read before choosing
  tokenizer vocab sizes, stop-word lists, and ``max_df`` dedup caps.

Dataflow built for 100 TB:
- one explode of the token array feeds BOTH term frequency (groupBy
  (doc, term)) and document frequency (distinct → groupBy term) — partial
  aggregation is map-side combinable, and the (doc, term) key is
  near-unique so no hot keys;
- the document count ``N`` rides a 1-row broadcast (``crossJoin`` of an
  aggregate relation, the same shape as ``bm25_scores``) — query
  construction stays fully lazy, no driver-side count;
- the df relation is VOCABULARY-sized (≪ corpus); joining it back to the
  (doc, term) tf relation is an equi-join on the term — Zipf-hot terms are
  bounded because tf already collapsed per-doc repeats to one row;
- top-n per doc is one window on the doc id (row_number, not a global
  sort); ``vocab_coverage`` ends in a single-partition window over only
  the top-k rows (bounded by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from olake_spark.operators.text import tokens

from olake_spark.materialize import materialize

__all__ = ["doc_terms", "tfidf_top_terms", "vocab_coverage"]


def doc_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) — per-document term frequencies over whitespace
    tokens of lowered text (empty terms dropped)."""
    t = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")).filter(
        F.col("term") != ""
    )
    return t.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, top_n: int = 5
) -> DataFrame:
    """Top ``top_n`` terms per document by ``tf · ln(N/df)``.

    Returns ``(id, term, tf, df, tfidf, rank)`` with ``tfidf`` rounded to
    6 decimals; rank ties break on the rounded score then term ascending,
    so output is deterministic under any partitioning.
    """
    # tf feeds the document-frequency aggregate AND the scored join;
    # materialize once so tokenize+explode+count runs a single time
    tf = doc_terms(df, id_col, text_col).transform(materialize)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("_n") / F.col("df")), 6),
        )
    )
    w = W.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(id_col, "term", "tf", "df", "tfidf", F.col("rank").cast("int"))
    )


def vocab_coverage(df: DataFrame, text_col: str, top_k: int = 50) -> DataFrame:
    """The ``top_k`` most frequent terms with cumulative token coverage.

    Returns ``(term, n_occurrences, rank, coverage)`` where ``coverage`` is
    the fraction of ALL token occurrences accounted for by ranks 1..r
    (rounded to 6 decimals). Ordering is (count desc, term asc) — exact
    integer keys, so ranks are engine-independent.

    The global ordering only ever materializes the top-k rows: Spark plans
    the ``orderBy().limit()`` as per-partition top-k + single reduce
    (TakeOrderedAndProject), and the cumulative window then runs on ≤ k
    rows in one partition — bounded by construction, not by data size.
    """
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    total = counts.agg(F.sum("n_occurrences").alias("_tot"))
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("term")).limit(top_k)
    w = (
        W.orderBy(F.desc("n_occurrences"), F.asc("term"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(W.orderBy(F.desc("n_occurrences"), F.asc("term"))))
        .withColumn("coverage", F.round(F.sum("n_occurrences").over(w) / F.col("_tot"), 6))
        .select("term", "n_occurrences", F.col("rank").cast("int"), "coverage")
    )
