"""Embedding-space (semantic) decontamination."""

from __future__ import annotations

import random

import pytest

from olake_spark.operators.decontam import semantic_decontaminate, semantic_overlap

DIM = 64


def _vec(seed: int) -> list[float]:
    rng = random.Random(seed)
    return [rng.uniform(-1, 1) for _ in range(DIM)]


@pytest.fixture(scope="module")
def frames(spark):
    bench_v = _vec(1)
    near = [x + random.Random(99).uniform(-0.01, 0.01) for x in bench_v]
    corpus = spark.createDataFrame(
        [
            (10, bench_v),  # exact copy of a benchmark vector
            (11, near),  # paraphrase-level neighbor
            (12, _vec(7)),  # unrelated
            (13, _vec(8)),  # unrelated
        ],
        ["vec_id", "embedding"],
    )
    bench = spark.createDataFrame([(900, bench_v), (901, _vec(2))], ["vec_id", "embedding"])
    return corpus, bench


def test_overlap_flags_copies_and_neighbors(spark, frames):
    corpus, bench = frames
    hits = {r.vec_id for r in semantic_overlap(corpus, bench, threshold=0.9).collect()}
    assert 10 in hits and 11 in hits
    assert 12 not in hits and 13 not in hits


def test_decontaminate_survivors(spark, frames):
    corpus, bench = frames
    out = semantic_decontaminate(corpus, bench, threshold=0.9)
    assert sorted(r.vec_id for r in out.collect()) == [12, 13]
    assert set(out.columns) == {"vec_id", "embedding"}  # corpus schema intact


def test_corpus_internal_dupes_are_not_cross_set_hits(spark):
    v = _vec(3)
    corpus = spark.createDataFrame([(1, v), (2, v)], ["vec_id", "embedding"])
    bench = spark.createDataFrame([(900, _vec(4))], ["vec_id", "embedding"])
    # both corpus rows survive: identical to EACH OTHER, far from benchmark
    assert semantic_decontaminate(corpus, bench, threshold=0.9).count() == 2


def test_bucket_cap_bounds_hot_corpus_buckets(spark):
    v = _vec(5)
    corpus = spark.createDataFrame([(i, v) for i in range(20)], ["vec_id", "embedding"])
    bench = spark.createDataFrame([(900, v)], ["vec_id", "embedding"])
    uncapped = semantic_decontaminate(corpus, bench, threshold=0.9)
    assert uncapped.count() == 0  # all 20 are contaminated
    capped = semantic_decontaminate(corpus, bench, threshold=0.9, max_bucket_size=5)
    assert capped.count() == 20  # hot corpus bucket dropped before the join
