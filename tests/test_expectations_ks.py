"""Round-7 operators: declarative expectations suite + exact KS test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olake_spark.operators.abtest import ks_two_sample
from olake_spark.operators.expectations import (
    expect_between,
    expect_in_set,
    expect_matches,
    expect_not_null,
    expectations_report,
)


def test_expectations_single_pass_counts_null_as_fail(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 50.0), (3, None, None), (4, "z", -1.0)],
        "id int, cat string, v double",
    )
    out = {
        r.expectation: r
        for r in expectations_report(
            df,
            [
                expect_not_null("cat"),
                expect_in_set("cat", ["a", "b"]),
                expect_between("v", 0.0, 10.0),
                expect_matches("cat", "^[ab]$"),
            ],
        ).collect()
    }
    assert out["cat_not_null"].n_pass == 3
    assert out["cat_in_set"].n_pass == 2  # NULL and 'z' fail
    assert out["cat_in_set"].n_fail == 2
    # v: 5.0 passes; 50.0 and -1.0 fail; NULL row fails (not abstains)
    assert out["v_between"].n_pass == 1 and out["v_between"].n_fail == 3
    assert out["cat_matches"].n_pass == 2
    assert all(r.n_rows == 4 for r in out.values())
    assert out["v_between"].pass_rate == 0.25


def test_expectations_plan_is_one_scan(spark):
    df = spark.createDataFrame([(1, 2.0)], "id int, v double")
    plan = (
        expectations_report(df, [expect_not_null("id"), expect_between("v", 0, 9)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one aggregate over the relation; no join, no second scan
    assert plan.count("LocalTableScan") + plan.count("Scan ") <= 2
    assert "Join" not in plan


def test_expectations_empty_suite_raises(spark):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError):
        expectations_report(df, [])


def test_ks_identical_and_disjoint(spark):
    a = [("a", float(i)) for i in range(1, 11)]
    b = [("b", float(i)) for i in range(1, 11)]
    same = spark.createDataFrame(a + b, "g string, v double")
    r = ks_two_sample(same, "g", "v", "a", "b").first()
    assert r.ks == 0.0 and r.n_a == 10 and r.n_b == 10

    # fully separated distributions: D = 1
    c = [("b", float(i + 100)) for i in range(1, 11)]
    sep = spark.createDataFrame(a + c, "g string, v double")
    r2 = ks_two_sample(sep, "g", "v", "a", "b").first()
    assert r2.ks == 1.0
    assert r2.d_num == r2.d_den == 100


def test_ks_hand_computed_shift(spark):
    # a = {1,2}, b = {2,3}: ECDFs differ by 1/2 at v=1 and v=2
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)], "g string, v double"
    )
    r = ks_two_sample(df, "g", "v", "a", "b").first()
    assert r.d_num == 2 and r.d_den == 4 and r.ks == 0.5


def test_dense_ids_match_global_row_number(spark):
    from olake_spark.operators.ids import dense_ids

    df = spark.range(1000).select(
        (F.col("id") * 37 % 1000).alias("k"), F.col("id").alias("tb")
    ).repartition(7)
    out = dense_ids(df, ["k", "tb"], id_col="rid", num_partitions=8)
    rows = out.orderBy("rid").collect()
    assert [r.rid for r in rows] == list(range(1, 1001))  # dense, 1-based
    # ids follow the total order exactly
    ordered = sorted(rows, key=lambda r: (r.k, r.tb))
    assert [r.rid for r in ordered] == list(range(1, 1001))


def test_dense_ids_requires_order_cols(spark):
    from olake_spark.operators.ids import dense_ids

    with pytest.raises(ValueError):
        dense_ids(spark.range(3), [], id_col="rid")
