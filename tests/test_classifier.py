"""Hashed bag-of-words linear classifier."""

from __future__ import annotations

import math

import pytest

from olake_spark.operators.classifier import (
    WEIGHT_SCALE,
    classify_quality,
    default_weights,
    hashed_bow_logits,
)


def test_default_weights_deterministic():
    assert default_weights(16) == default_weights(16)
    assert default_weights(16, seed=8) != default_weights(16)
    assert all(-WEIGHT_SCALE <= w <= WEIGHT_SCALE for w in default_weights(64))


def test_logit_is_exact_integer_sum(spark):
    # 1 bucket -> every token hits weight[0]; logit = n_tokens * w + bias
    df = spark.createDataFrame([(1, "a b c"), (2, ""), (3, "x")], ["doc_id", "text"])
    out = {r.doc_id: r for r in hashed_bow_logits(df, "doc_id", "text", [250], bias=7).collect()}
    assert out[1].logit_micro == 3 * 250 + 7 and out[1].n_tokens == 3
    assert out[2].logit_micro == 7 and out[2].n_tokens == 0  # empty doc scores bias
    assert out[3].logit_micro == 250 + 7


def test_logit_partitioning_invariant(spark):
    rows = [(i, f"tok{i} tok{i+1} shared words here") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    w = default_weights(32)
    a = {r.doc_id: r.logit_micro for r in hashed_bow_logits(df, "doc_id", "text", w).collect()}
    b = {
        r.doc_id: r.logit_micro
        for r in hashed_bow_logits(df.repartition(13), "doc_id", "text", w).collect()
    }
    assert a == b


def test_classify_sigmoid_and_threshold(spark):
    df = spark.createDataFrame([(1, "a a a"), (2, "")], ["doc_id", "text"])
    out = {r.doc_id: r for r in classify_quality(df, "doc_id", "text", [500_000]).collect()}
    z = 3 * 0.5
    assert out[1].score == round(1 / (1 + math.exp(-z)), 6)
    assert out[1].keep is True
    assert out[2].score == 0.5 and out[2].keep is True  # logit 0 sits on the boundary


def test_empty_weights_rejected(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        hashed_bow_logits(df, "doc_id", "text", [])
