"""Corpus snapshot diff and quantile length bucketing."""

from __future__ import annotations

import pytest

from olake_spark.operators.audit import corpus_diff, corpus_diff_summary
from olake_spark.operators.packing import length_bucket_stats, length_buckets


def test_corpus_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will be removed")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(1, "Same   TEXT"), (2, "changed now"), (4, "brand new")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in corpus_diff(old, new, "doc_id", "text").collect()}
    assert rows[1].status == "unchanged"  # normalization: case/space-insensitive
    assert rows[2].status == "changed"
    assert rows[3].status == "removed" and rows[3].new_fingerprint is None
    assert rows[4].status == "added" and rows[4].old_fingerprint is None
    summary = {r.status: r.n for r in corpus_diff_summary(
        corpus_diff(old, new, "doc_id", "text")).collect()}
    assert summary == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_length_buckets_equal_count_and_ordered(spark):
    df = spark.createDataFrame([(i, i * 3 % 97) for i in range(60)], ["doc_id", "len"])
    b = length_buckets(df, "doc_id", "len", 6)
    sizes = {r.bucket: r.n for r in b.groupBy("bucket").count().withColumnRenamed("count", "n").collect()}
    assert sizes == {i: 10 for i in range(1, 7)}
    rows = b.collect()
    # bucket ordering respects length: every row in bucket k is <= every row in k+1
    max_per = {}
    min_per = {}
    for r in rows:
        max_per[r.bucket] = max(max_per.get(r.bucket, -1), r.len)
        min_per[r.bucket] = min(min_per.get(r.bucket, 10**9), r.len)
    for k in range(1, 6):
        assert max_per[k] <= min_per[k + 1]


def test_length_bucket_stats_padding(spark):
    df = spark.createDataFrame([(1, 10), (2, 10), (3, 100), (4, 50)], ["doc_id", "len"])
    stats = {r.bucket: r for r in length_bucket_stats(df, "doc_id", "len", 2).collect()}
    assert stats[1].min_len == 10 and stats[1].max_len == 10
    assert stats[1].padding_frac == 0.0  # equal lengths -> zero padding
    # bucket 2 = lens (50, 100): padding = (200 - 150) / 200
    assert stats[2].padding_frac == 0.25


def test_length_buckets_rejects_bad_n(spark):
    df = spark.createDataFrame([(1, 5)], ["doc_id", "len"])
    with pytest.raises(ValueError):
        length_buckets(df, "doc_id", "len", 0)


def test_dataset_card_metrics(spark):
    from olake_spark.operators.profile import dataset_card

    df = spark.createDataFrame(
        [
            (1, "one two three", "en"),
            (2, "ONE  TWO  three", "en"),  # exact dupe after normalization
            (3, "quatre cinq", "fr"),
            (4, "six seven eight nine", "en"),
        ],
        ["doc_id", "text", "lang"],
    )
    card = {r.metric: r.value for r in dataset_card(df, "doc_id", "text", "lang").collect()}
    assert card["n_docs"] == 4.0
    assert card["total_tokens"] == 3 + 3 + 2 + 4
    assert card["mean_doc_tokens"] == 3.0
    assert card["exact_dup_rate"] == 0.25
    assert card["lang_share_en"] == 0.75 and card["lang_share_fr"] == 0.25
    # no lang column: just the 4 headline rows
    assert dataset_card(df, "doc_id", "text").count() == 4


def test_profile_cardinality(spark):
    from olake_spark.operators.profile import profile_cardinality

    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 5.0), (3, "b", 5.0), (4, "b", 7.0)],
        ["id", "cat", "v"],
    )
    out = {r.col: r for r in profile_cardinality(df, ["id", "cat", "v"]).collect()}
    assert out["id"].n_distinct == 4 and out["id"].distinct_frac == 1.0
    assert out["cat"].n_distinct == 2 and out["cat"].distinct_frac == 0.5
    assert out["v"].n_nulls == 1 and out["v"].n_distinct == 2
    assert out["v"].distinct_frac == round(2 / 3, 6)
    # approx path returns the same shape with sketch counts
    approx = {r.col: r for r in profile_cardinality(df, ["cat"], approx=True).collect()}
    assert approx["cat"].n == 4
    import pytest as _pytest

    with _pytest.raises(ValueError):
        profile_cardinality(df, [])
