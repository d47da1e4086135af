"""Hot-bucket cap tests: mega-buckets (boilerplate clusters) must not
explode the LSH candidate joins when ``max_bucket_size`` is set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olake_spark.operators.dedup import (
    cap_buckets,
    minhash_near_dups,
    simhash_near_dups,
)
from olake_spark.operators.similarity import cosine_near_dup_pairs


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    # 20 identical boilerplate docs (one mega-bucket) + 2 genuine near-dups
    boiler = [(i, "terms of service apply to all pages on this site") for i in range(20)]
    pair = [
        (100, "completely original research about spark shuffles and joins"),
        (101, "completely original research about spark shuffles and joins"),
    ]
    return spark.createDataFrame(boiler + pair, ["doc_id", "text"])


def test_cap_buckets_drops_only_mega(spark):
    rows = [(i, "hot") for i in range(10)] + [(100, "cold"), (101, "cold")]
    bt = spark.createDataFrame(rows, ["id", "bh"]).withColumn("band", F.lit(0))
    kept = cap_buckets(bt, ["band", "bh"], max_bucket_size=5)
    assert sorted(r["id"] for r in kept.collect()) == [100, 101]
    # None = passthrough
    assert cap_buckets(bt, ["band", "bh"], None).count() == 12


def test_minhash_cap_bounds_candidates(boilerplate_docs):
    uncapped = minhash_near_dups(boilerplate_docs, "doc_id", "text", 0.7)
    # identical docs collide in every band: 20*19/2 = 190 boilerplate pairs
    assert uncapped.count() == 190 + 1
    capped = minhash_near_dups(
        boilerplate_docs, "doc_id", "text", 0.7, max_bucket_size=5
    )
    got = [(r["id_a"], r["id_b"]) for r in capped.collect()]
    assert got == [(100, 101)]  # mega-bucket dropped, real pair survives


def test_simhash_cap_bounds_candidates(boilerplate_docs):
    capped = simhash_near_dups(
        boilerplate_docs, "doc_id", "text", max_hamming=3, max_bucket_size=5
    )
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in pairs
    assert not any(a < 100 and b < 100 for a, b in pairs)


def test_cosine_pairs_cap(spark):
    # vectors must span the operator's plane dimensionality (64); the
    # mega-bucket direction is the exact negative of the real pair, so every
    # hyperplane sign flips and the pair never shares the mega bucket
    import random

    rng = random.Random(3)
    d = [rng.uniform(-1, 1) for _ in range(64)]
    neg = [-x for x in d]
    near = [x + rng.uniform(-0.01, 0.01) for x in d]
    rows = [(i, neg) for i in range(15)] + [(100, d), (101, near)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    capped = cosine_near_dup_pairs(df, threshold=0.9, max_bucket_size=6)
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in pairs
    assert not any(a < 100 and b < 100 for a, b in pairs)
