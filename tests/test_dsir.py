"""DSIR importance weights: target-likeness ranking + exact-integer state."""

from olake_spark.operators.dsir import dsir_log_weights, hashed_feature_counts


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_target_like_doc_outscores_junk(spark):
    target = _docs(
        spark,
        [(100 + i, "the cat sat on the mat and the cat purred") for i in range(5)],
    )
    raw = _docs(
        spark,
        [
            (1, "the cat sat on the mat"),  # target-like
            (2, "zqx wvu kjh gfd rts plm"),  # junk, same length
        ],
    )
    w = {r.doc_id: r.score_micros for r in dsir_log_weights(raw, target, "doc_id", "text").collect()}
    assert w[1] > w[2]


def test_empty_doc_scores_zero_and_survives(spark):
    target = _docs(spark, [(100, "a b c")])
    raw = _docs(spark, [(1, "a b"), (2, ""), (3, "   ")])
    out = {r.doc_id: r for r in dsir_log_weights(raw, target, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}
    assert out[2].n_features == 0 and out[2].score_micros == 0
    assert out[3].n_features == 0 and out[3].log_weight == 0.0


def test_score_partition_order_free(spark):
    target = _docs(spark, [(100 + i, f"common words plus t{i}") for i in range(8)])
    raw = _docs(
        spark, [(i, f"common words plus r{i % 3} and filler f{i}") for i in range(20)]
    )
    a = {r.doc_id: r.score_micros for r in dsir_log_weights(raw, target, "doc_id", "text").collect()}
    b = {
        r.doc_id: r.score_micros
        for r in dsir_log_weights(
            raw.repartition(7), target.repartition(3), "doc_id", "text"
        ).collect()
    }
    assert a == b  # micro-unit integer sums: exact under any partitioning


def test_feature_counts_unigrams_plus_bigrams(spark):
    df = _docs(spark, [(1, "a b c")])
    # 3 unigrams + 2 bigrams = 5 features
    total = sum(
        r.cnt for r in hashed_feature_counts(df, "doc_id", "text").collect()
    )
    assert total == 5
