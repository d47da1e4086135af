"""Embedding group centroids and outlier ranking."""

from __future__ import annotations

import pytest

from olake_spark.operators.embeddings import centroid_outliers, group_centroids


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, "a", [1.0, 0.0]),
        (2, "a", [1.0, 0.0]),
        (3, "a", [0.0, 1.0]),  # the odd one out in group a
        (4, "b", [0.0, -1.0]),
        (5, "b", [0.0, -1.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "label", "embedding"])


def test_group_centroids_elementwise_mean(spark, vecs):
    cents = {r.label: r.centroid for r in group_centroids(vecs, "label").collect()}
    assert cents["a"] == [round(2 / 3, 6), round(1 / 3, 6)]
    assert cents["b"] == [0.0, -1.0]


def test_outlier_rank_orders_by_distance(spark, vecs):
    out = centroid_outliers(vecs, "vec_id", "label", "embedding", dim=2, bottom_k=3)
    rows = [r for r in out.collect() if r.label == "a"]
    ranked = sorted(rows, key=lambda r: r.outlier_rank)
    # vec 3 points away from the group-a centroid -> most outlying
    assert ranked[0].vec_id == 3 and ranked[0].outlier_rank == 1
    # vecs 1 and 2 are identical -> same sim, ties broken by id
    assert [r.vec_id for r in ranked[1:]] == [1, 2]
    sims = [r.centroid_sim for r in ranked]
    assert sims == sorted(sims)


def test_outliers_without_bottom_k_scores_everyone(spark, vecs):
    out = centroid_outliers(vecs, "vec_id", "label", "embedding", dim=2)
    assert out.count() == 5
    assert set(out.columns) == {"vec_id", "label", "centroid_sim"}
    perfect = {r.vec_id: r.centroid_sim for r in out.collect()}
    assert perfect[4] == 1.0 and perfect[5] == 1.0  # identical to centroid


def test_lambda_fold_path_matches_unrolled(spark, vecs):
    unrolled = {
        r.vec_id: r.centroid_sim
        for r in centroid_outliers(vecs, "vec_id", "label", "embedding", dim=2).collect()
    }
    folded = {
        r.vec_id: r.centroid_sim
        for r in centroid_outliers(vecs, "vec_id", "label", "embedding", dim=None).collect()
    }
    assert unrolled == folded
