"""Incremental dedup: a new batch against a persisted corpus index.

The corpus never contributes text to the join — only its fingerprint /
signature index — so the daily cost is linear in the batch, not the corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olake_spark.operators.dedup import (
    fingerprint_index,
    incremental_exact_dedup,
    incremental_minhash_dedup,
    minhash_index,
    minhash_near_dups,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "sphinx of black quartz judge my vow"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_survivors_and_first_wins(spark, corpus):
    batch = spark.createDataFrame(
        [
            (10, "THE QUICK  BROWN fox jumps over the lazy dog"),  # corpus dup (normalized)
            (11, "a genuinely new document about distributed joins"),
            (12, "a genuinely new document about distributed joins"),  # in-batch dup
            (13, "another fresh document"),
        ],
        ["doc_id", "text"],
    )
    idx = fingerprint_index(corpus, "doc_id", "text")
    out = incremental_exact_dedup(batch, idx, "doc_id", "text")
    assert sorted(r.doc_id for r in out.collect()) == [11, 13]
    # original batch columns survive untouched
    assert set(out.columns) == {"doc_id", "text"}


def test_exact_empty_batch_and_disjoint_batch(spark, corpus):
    idx = fingerprint_index(corpus, "doc_id", "text")
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert incremental_exact_dedup(empty, idx, "doc_id", "text").count() == 0
    disjoint = spark.createDataFrame([(20, "nothing like the corpus at all")], ["doc_id", "text"])
    assert incremental_exact_dedup(disjoint, idx, "doc_id", "text").count() == 1


def test_minhash_drops_near_dup_of_corpus(spark):
    base = "spark shuffles hash partition the rows of every join and aggregation stage "
    corpus = spark.createDataFrame([(1, base * 4)], ["doc_id", "text"])
    batch = spark.createDataFrame(
        [
            (10, (base * 4) + "with one trailing clause"),  # near-dup of corpus doc 1
            (11, "completely unrelated text about parquet footer statistics and bloom filters"),
        ],
        ["doc_id", "text"],
    )
    idx = minhash_index(corpus, "doc_id", "text")
    out = incremental_minhash_dedup(batch, idx, "doc_id", "text", threshold=0.7)
    assert [r.doc_id for r in out.collect()] == [11]


def test_minhash_matches_pairwise_semantics(spark):
    """Batch doc survives iff minhash_near_dups finds no cross-side pair —
    the incremental operator must agree with the batch pairwise operator."""
    rows = [
        (i, f"document number {i} about topic {i % 3} " * 6) for i in range(12)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    corpus = df.filter(F.col("doc_id") < 6)
    batch = df.filter(F.col("doc_id") >= 6)
    pairs = minhash_near_dups(df, "doc_id", "text", threshold=0.7).collect()
    cross_dup_ids = {
        r.id_b for r in pairs if r.id_a < 6 <= r.id_b
    } | {r.id_a for r in pairs if r.id_b < 6 <= r.id_a}
    expected = sorted(set(range(6, 12)) - cross_dup_ids)
    idx = minhash_index(corpus, "doc_id", "text")
    out = incremental_minhash_dedup(batch, idx, "doc_id", "text", threshold=0.7)
    assert sorted(r.doc_id for r in out.collect()) == expected


def test_minhash_bucket_cap_applies_to_index_side(spark):
    """A boilerplate mega-bucket in the corpus index must be droppable."""
    boiler = [(i, "terms of service apply to all pages on this site") for i in range(20)]
    corpus = spark.createDataFrame(boiler, ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(100, "terms of service apply to all pages on this site")], ["doc_id", "text"]
    )
    idx = minhash_index(corpus, "doc_id", "text")
    kept = incremental_minhash_dedup(
        batch, idx, "doc_id", "text", threshold=0.7, max_bucket_size=5
    )
    # cap drops the hot corpus bucket -> no candidates -> batch doc survives
    assert kept.count() == 1
    uncapped = incremental_minhash_dedup(batch, idx, "doc_id", "text", threshold=0.7)
    assert uncapped.count() == 0


def test_split_by_cluster_keeps_near_dups_together(spark):
    from olake_spark.operators.sampling import split_by_cluster

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 9)], ["doc_id", "text"]
    )
    # two 3-doc clusters + two singletons
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4), (7, 7), (8, 8)],
        ["doc_id", "cluster_id"],
    )
    out = split_by_cluster(docs, clusters, "doc_id", 0.5)
    rows = out.collect()
    assert len(rows) == 8 and set(out.columns) == {"doc_id", "text", "cluster_id", "split"}
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    # every cluster lands entirely on one side
    assert all(len(sides) == 1 for sides in by_cluster.values())
    # the decision depends only on cluster_id -> re-running agrees
    again = {r.doc_id: r.split for r in split_by_cluster(docs, clusters, "doc_id", 0.5).collect()}
    assert again == {r.doc_id: r.split for r in rows}
