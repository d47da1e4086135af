"""Bucketed tables: the write-once-shuffle, join-forever-free contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olake_spark.sinks.bucketed import bucketed_tables_join_plan, write_bucketed


@pytest.fixture()
def bucketed_pair(spark):
    # managed tables land in the session's default warehouse; DROP TABLE
    # removes their data (managed-table semantics), so nothing leaks
    facts = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    dims = spark.range(1_000).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    write_bucketed(facts, "bt_facts", ["k"], 8)
    write_bucketed(dims, "bt_dims", ["k"], 8, sort_cols=["k"])
    yield "bt_facts", "bt_dims"
    spark.sql("DROP TABLE IF EXISTS bt_facts")
    spark.sql("DROP TABLE IF EXISTS bt_dims")


def test_bucketed_join_plans_no_shuffle(spark, bucketed_pair):
    left, right = bucketed_pair
    # disable broadcast so the join would OTHERWISE be a shuffle join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_tables_join_plan(spark, left, right, ["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan  # co-located read
        assert joined.count() == 1_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_plans_no_shuffle(spark, bucketed_pair):
    left, _ = bucketed_pair
    agg = spark.table(left).groupBy("k").agg(F.sum("v").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert agg.count() == 10_000


def test_write_bucketed_rejects_empty_key(spark):
    with pytest.raises(ValueError):
        write_bucketed(spark.range(1), "bt_bad", [], 4)
