"""Unit tests for embedding normalize/quantize operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from olake_spark.operators.embeddings import dequantize_int8, l2_normalize, quantize_int8


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [3.0, 4.0]),
        (1, [0.0, 0.0]),
        (2, [-1.0, 0.5]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_l2_normalize(vecs):
    got = {r["vec_id"]: r["embedding"] for r in l2_normalize(vecs).collect()}
    assert got[0] == pytest.approx([0.6, 0.8])
    assert got[1] == [0.0, 0.0]  # zero vector unchanged
    n = math.sqrt(1.25)
    assert got[2] == pytest.approx([-1 / n, 0.5 / n])


def test_quantize_int8_values(vecs):
    got = {r["vec_id"]: r for r in quantize_int8(vecs).collect()}
    assert got[0]["q"] == [95, 127]  # round(3*127/4)=95
    assert got[0]["scale"] == pytest.approx(4.0 / 127)
    assert got[1]["q"] == [0, 0] and got[1]["scale"] == 0.0
    assert got[2]["q"] == [-127, 64]  # round(0.5*127/1)=64 (63.5 rounds away from zero)


def test_quantize_roundtrip_error_bounded(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(50)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    deq = dequantize_int8(quantize_int8(df))
    joined = deq.select(
        "vec_id",
        F.array_max(
            F.zip_with("embedding", "embedding_deq", lambda a, b: F.abs(a - b))
        ).alias("max_err"),
        (F.array_max(F.transform("embedding", lambda x: F.abs(x))) / 254.0).alias("bound"),
    )
    bad = joined.filter(F.col("max_err") > F.col("bound") * 1.0000001).count()
    assert bad == 0  # max error of round() quantization is scale/2 = maxabs/254
