"""Benchmark decontamination: flag corpus documents that overlap a held-out
evaluation set by exact word n-grams.

The standard pre-training hygiene step (GPT-3 appendix C / PaLM / Llama
training reports): a training document is "contaminated" if it shares at
least ``min_shared`` distinct word n-grams (typically 8-13; configurable)
with any benchmark document, and is dropped or flagged before training.

Scale shape (100 TB corpus, MB-scale benchmark): the benchmark side is tiny
by construction — its distinct n-gram set is collected once and
**broadcast**, so the corpus side streams through a broadcast hash join with
no shuffle of corpus data at all. The corpus n-gram explode is per-document
map work; the per-document distinct + count is keyed by ``doc_id`` (unique →
uniform) and mostly collapses map-side. Never joins corpus-to-corpus.

If the benchmark outgrows broadcast size (rare — eval sets are small), pass
``broadcast_benchmark=False`` to fall back to a shuffled semi-join.

This family is part of the training-data-pipeline extension surface (the
reference engine has no corpus operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olake_spark.operators.quality import ngrams
from olake_spark.operators.text import tokens

__all__ = ["ngram_overlap", "decontaminate", "semantic_overlap", "semantic_decontaminate"]


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-corpus-document count of distinct word ``n``-grams shared with the
    benchmark. Returns ``(id_col, n_shared_ngrams)`` for every corpus row
    (0 when disjoint)."""
    bench_grams = benchmark.select(
        F.explode(ngrams(tokens(F.col(text_col)), n)).alias("gram")
    ).distinct()
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    corpus_grams = (
        corpus.select(F.col(id_col), F.explode(ngrams(tokens(F.col(text_col)), n)).alias("gram"))
        .distinct()
    )
    hits = corpus_grams.join(bench_grams, "gram").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shared_ngrams")
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .withColumn("n_shared_ngrams", F.coalesce(F.col("n_shared_ngrams"), F.lit(0)))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_shared: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Corpus with contaminated documents removed (shared distinct n-grams
    ≥ ``min_shared``). Keeps all corpus columns; anti-join on the flagged id
    set, which is small and broadcast by AQE."""
    flagged = (
        ngram_overlap(corpus, benchmark, id_col, text_col, n, broadcast_benchmark)
        .filter(F.col("n_shared_ngrams") >= min_shared)
        .select(id_col)
    )
    return corpus.join(flagged, id_col, "left_anti")


def semantic_overlap(
    corpus: DataFrame | None,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    max_bucket_size: int | None = None,
    corpus_index: DataFrame | None = None,
    n_tables: int | None = None,
    n_planes: int | None = None,
) -> DataFrame:
    """Corpus ids whose EMBEDDING is near (cosine ≥ ``threshold``) some
    benchmark embedding — the semantic contamination n-gram matching cannot
    see (paraphrases, translations, format-shuffled answers).

    Same banded multi-table LSH shape as
    ``similarity.cosine_near_dup_pairs`` but CROSS-set: corpus bands join
    benchmark bands on (band, sig) — candidates are corpus × bucket, never
    corpus × benchmark — and exact cosine verifies. The benchmark's banded
    relation is tiny (eval sets are MB-scale) and broadcasts, so corpus
    rows never shuffle. Output: distinct contaminated ``(id)``.

    ``corpus_index=`` accepts the PRECOMPUTED banded relation from
    ``similarity.lsh_build_index`` (persisted bucketed on ``(band, sig)``) —
    decontaminating against a new benchmark release then costs only the
    benchmark's (tiny) signature pass, not a fresh L·b-plane sweep of the
    100 TB corpus. Pass the SAME ``n_tables``/``n_planes`` the index was
    built with: the benchmark side signs with these planes, and mismatched
    signature widths would band-join to nothing (a silent all-clean result).
    Indexes from ``lsh_build_index`` carry their build params as stamp
    columns and ``check_index_params`` turns a mismatch into a LOUD
    execution-time error instead of a decontamination false-negative.
    """
    from olake_spark.operators.dedup import cap_buckets
    from olake_spark.operators.similarity import (
        _NUM_PLANES,
        _NUM_TABLES,
        banded_relation,
        check_index_params,
        cosine_prenormed,
        lsh_planes,
    )

    eff_tables = n_tables if n_tables is not None else _NUM_TABLES
    eff_planes = n_planes if n_planes is not None else _NUM_PLANES
    tables = lsh_planes(eff_tables, eff_planes)
    dim = len(tables[0][0])
    if corpus_index is not None:
        c = check_index_params(corpus_index, eff_tables, eff_planes).select(
            F.col(id_col).alias("_cid"),
            F.col(vec_col).alias("_cv"),
            F.col("_norm").alias("_cn"),
            "band",
            "sig",
        )
    else:
        if corpus is None:
            raise ValueError("need corpus or a precomputed corpus_index")
        c = banded_relation(corpus, id_col, vec_col, tables, "_cid", "_cv", norm_col="_cn")
    c = cap_buckets(c, ["band", "sig"], max_bucket_size)
    b = banded_relation(benchmark, id_col, vec_col, tables, "_bid", "_bv", norm_col="_bn")
    sim = F.round(cosine_prenormed("_cv", "_bv", "_cn", "_bn", dim), 6)
    return (
        c.join(F.broadcast(b), ["band", "sig"])
        .select(F.col("_cid").alias(id_col), sim.alias("_sim"))
        .filter(F.col("_sim") >= threshold)
        .select(id_col)
        .distinct()
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    max_bucket_size: int | None = None,
    corpus_index: DataFrame | None = None,
    n_tables: int | None = None,
    n_planes: int | None = None,
) -> DataFrame:
    """Corpus rows surviving semantic decontamination: one anti-join of the
    corpus against ``semantic_overlap``'s contaminated-id set. Pass
    ``corpus_index=`` (see ``semantic_overlap``) to reuse a persisted banded
    relation instead of re-signing the corpus per benchmark release, with
    the index's ``n_tables``/``n_planes``."""
    hits = semantic_overlap(
        corpus, benchmark, id_col, vec_col, threshold, max_bucket_size,
        corpus_index=corpus_index, n_tables=n_tables, n_planes=n_planes,
    )
    return corpus.join(hits, id_col, "left_anti")
