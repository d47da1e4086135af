"""Sequence packing, deterministic shuffle, and mixture sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olake_spark.operators.packing import deterministic_shuffle, pack_offsets
from olake_spark.operators.sampling import mixture_weighted_sample


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(90)) + 10).alias("n_tokens"),
    )


def test_pack_offsets_prefix_sum_contiguity(spark):
    budget, shards = 64, 4
    out = pack_offsets(_docs(spark), "doc_id", "n_tokens", budget, shards).collect()
    assert {r.shard for r in out} <= set(range(shards))
    # replay each shard in hash order: offsets must be the running token sum
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: (r.seq_in_shard, r.offset_in_seq))
        cum = 0
        for r in rows:
            assert r.seq_in_shard == cum // budget
            assert r.offset_in_seq == cum % budget
            assert r.straddles == (cum % budget + r.n_tokens > budget)
            cum += r.n_tokens


def test_pack_offsets_deterministic_across_partitioning(spark):
    docs = _docs(spark)
    a = pack_offsets(docs, "doc_id", "n_tokens", 64, 4)
    b = pack_offsets(docs.repartition(13), "doc_id", "n_tokens", 64, 4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_offsets_rejects_bad_budget(spark):
    with pytest.raises(ValueError):
        pack_offsets(_docs(spark), "doc_id", "n_tokens", 0, 4)


def test_deterministic_shuffle_dense_positions(spark):
    out = deterministic_shuffle(_docs(spark), "doc_id", n_shards=4)
    per = (
        out.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.max("pos_in_shard").alias("mx"),
             F.min("pos_in_shard").alias("mn"))
        .collect()
    )
    for r in per:  # positions are exactly 0..n-1 within each shard
        assert (r.mn, r.mx) == (0, r.n - 1)
    # stable under input repartitioning
    again = deterministic_shuffle(_docs(spark).repartition(7), "doc_id", n_shards=4)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_mixture_weighted_sample_hits_targets(spark):
    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "en")
        .when(F.col("id") % 4 == 1, "zh")
        .when(F.col("id") % 4 == 2, "fr")
        .otherwise("junk")
        .alias("lang"),
    )
    weights = {"en": 0.6, "zh": 0.3, "fr": 0.1}
    out = mixture_weighted_sample(df, "doc_id", "lang", weights)
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "junk" not in got  # mixture spec is a whitelist
    # en is the binding stratum (1000 rows / 0.6 = smallest cap): kept whole
    assert got["en"] == 1000
    total = sum(got.values())
    for lang, w in weights.items():
        assert abs(got[lang] / total - w) < 0.05  # hash noise at n=1000
    # deterministic: identical sample on re-run
    again = mixture_weighted_sample(df, "doc_id", "lang", weights)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_length_buckets_matches_ntile(spark):
    """The distributed rank+formula path must reproduce SQL ntile exactly —
    including the remainder rule (first N%n buckets get the extra row) —
    across bucket counts that do and don't divide the row count."""
    from pyspark.sql import Window as W

    from olake_spark.operators.packing import length_buckets

    rows = [(i, (i * 37) % 19 + 1) for i in range(103)]  # ties in len, ids unique
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"]).repartition(7)
    for n in (1, 3, 8, 64, 103, 200):
        got = {
            r.doc_id: r.bucket
            for r in length_buckets(df, "doc_id", "n_chars", n).collect()
        }
        want = {
            r.doc_id: r.bucket
            for r in df.withColumn(
                "bucket",
                F.ntile(n).over(W.orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())),
            ).collect()
        }
        assert got == want, f"n_buckets={n}"
