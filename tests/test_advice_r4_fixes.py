"""Regression tests for the round-4 ADVICE findings.

1. semantic_overlap(corpus_index=...) with mismatched n_tables/n_planes must
   FAIL LOUDLY (execution-time error), not band-join to nothing and report
   the corpus fully clean — indexes now carry build-param stamps.
2. source_quality_report NULL-text handling: NULL scores count as 0 (not
   skipped), NULL fingerprints coalesce to '' (not dropped from
   count_distinct, which inflated dup_rate), and flagged is never NULL.
3. numeric_outlier_stats reports real stats for a NULL group key (plain
   equi-joins never match NULL and silently yielded n=0 / NULL median).
4. connected_components drops NULL edge endpoints before the driver
   fast path (pandas int64→float64 promotion; int(nan) raised).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

DIM = 64


def _vec(seed: int) -> list[float]:
    rng = random.Random(seed)
    return [rng.uniform(-1, 1) for _ in range(DIM)]


# -- 1: LSH index param stamps ----------------------------------------------


def test_index_param_mismatch_raises_not_silent_clean(spark):
    from olake_spark.operators.decontam import semantic_overlap
    from olake_spark.operators.similarity import lsh_build_index

    v = _vec(1)
    corpus = spark.createDataFrame([(10, v), (11, _vec(2))], ["vec_id", "embedding"])
    bench = spark.createDataFrame([(900, v)], ["vec_id", "embedding"])
    idx = lsh_build_index(corpus, n_tables=2, n_planes=8)
    # matched params: exact-copy contamination found via the index
    hits = semantic_overlap(
        bench, benchmark=bench, corpus_index=idx, n_tables=2, n_planes=8, threshold=0.9
    )
    assert {r.vec_id for r in hits.collect()} == {10}
    # mismatched planes: used to return an empty (all-clean) frame; the
    # schema-metadata stamp now fails PLAN BUILD, before any execution
    with pytest.raises(Exception, match="n_tables, n_planes"):
        semantic_overlap(
            bench, benchmark=bench, corpus_index=idx,
            n_tables=2, n_planes=12, threshold=0.9,
        )
    # an EMPTY mis-pathed index (rows can't trigger the lazy assert) still
    # fails loudly via the metadata stamp
    with pytest.raises(Exception, match="n_tables, n_planes"):
        semantic_overlap(
            bench, benchmark=bench, corpus_index=idx.filter("vec_id < 0"),
            n_tables=2, n_planes=12, threshold=0.9,
        )


def test_lsh_bucket_topk_checks_index_params(spark):
    from olake_spark.operators.similarity import lsh_bucket_topk, lsh_build_index

    corpus = spark.createDataFrame(
        [(i, _vec(i)) for i in range(6)], ["vec_id", "embedding"]
    )
    idx = lsh_build_index(corpus, n_tables=2, n_planes=8)
    q = corpus.limit(1)
    ok = lsh_bucket_topk(q, index=idx, k=3, n_tables=2, n_planes=8)
    ok.collect()  # no raise
    with pytest.raises(Exception, match="n_tables, n_planes"):
        lsh_bucket_topk(q, index=idx, k=3, n_tables=4, n_planes=8)
    # metadata stripped (e.g. a transformation rebuilt the column): the
    # row-level lazy assert still catches the mismatch at execution
    stripped = idx.withMetadata("band", {})
    lazy_bad = lsh_bucket_topk(stripped, index=stripped, k=3, n_tables=4, n_planes=8)
    with pytest.raises(Exception, match="n_tables, n_planes"):
        lazy_bad.collect()


def test_unstamped_index_passes_through(spark):
    from olake_spark.operators.similarity import check_index_params, lsh_build_index

    idx = (
        lsh_build_index(
            spark.createDataFrame([(1, _vec(1))], ["vec_id", "embedding"]),
            n_tables=2,
            n_planes=8,
        )
        .drop("_lsh_tables", "_lsh_planes")
        .withMetadata("band", {})
    )
    # hand-built / pre-stamp index (no stamp columns, no schema metadata):
    # caller owns consistency, no check
    assert check_index_params(idx, 99, 99).count() == 2  # 2 tables → 2 rows


# -- 2: source_quality_report NULL text -------------------------------------


def test_source_quality_null_text_not_counted_as_dup(spark):
    from olake_spark.operators.quality import (
        source_quality_filter,
        source_quality_report,
    )

    rows = [(i, None, "nullsrc") for i in range(12)]
    rows += [(100 + i, f"unique document text number {i} " * 20, "goodsrc") for i in range(12)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    rep = {
        r.source: r
        for r in source_quality_report(
            df, min_docs=10, min_quality=0.5, max_dup_rate=0.2
        ).collect()
    }
    ns = rep["nullsrc"]
    # 12 NULL-text docs share the '' fingerprint: 11/12 dup_rate, 0 quality,
    # and a DEFINITE verdict (previously flagged could be NULL)
    assert ns.n_docs == 12 and ns.sum_quality_micro == 0
    assert ns.flagged is True
    assert rep["goodsrc"].flagged is False
    kept = source_quality_filter(df, min_docs=10, min_quality=0.5, max_dup_rate=0.2)
    assert kept.count() == 12  # the all-NULL source is actually dropped now


# -- 3: numeric_outlier_stats NULL group ------------------------------------


def test_null_group_reports_real_stats(spark):
    from olake_spark.operators.audit import numeric_outlier_stats

    rows = [(None, float(v)) for v in (1, 2, 3, 4, 1000)]
    rows += [("a", float(v)) for v in (10, 20, 30)]
    rows += [(None, None)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = {r.grp: r for r in numeric_outlier_stats(df, "grp", "v", k=3.0).collect()}
    ng = out[None]
    assert ng.n == 5 and ng.n_nulls == 1
    assert ng.median == 3.0 and ng.mad == 1.0
    assert ng.n_outliers == 1  # the 1000
    assert out["a"].n == 3 and out["a"].median == 20.0


# -- 4: connected_components NULL edge endpoints ----------------------------


def test_cc_null_pairs_dropped(spark):
    from olake_spark.operators.dedup import connected_components

    ids = spark.range(1, 6).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(1, 2), (2, None), (None, 4)], "a bigint, b bigint"
    )
    out = {r.doc_id: r.cluster_id for r in
           connected_components(ids, pairs, "doc_id", "a", "b").collect()}
    assert out[1] == out[2]  # the real edge
    assert out[4] == 4 and out[5] == 5  # NULL edges did not link anything


def test_cc_int32_ids_supported(spark):
    """int32 id columns are lossless and must take the driver fast path
    (the first dtype guard rejected anything non-int64)."""
    from olake_spark.operators.dedup import connected_components

    ids = spark.createDataFrame([(1,), (2,), (3,)], "doc_id int")
    pairs = spark.createDataFrame([(1, 2)], "a int, b int")
    out = {r.doc_id: r.cluster_id
           for r in connected_components(ids, pairs, "doc_id", "a", "b").collect()}
    assert out[1] == out[2] and out[3] == 3
