"""Bloom semi-join: no false negatives, exact FP accounting, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from olake_spark.operators import bloom as bl


def test_bloom_no_false_negatives_and_fp_bounded(spark):
    dim = spark.createDataFrame([(i,) for i in range(0, 50, 5)], "k long")
    fact = spark.createDataFrame([(i,) for i in range(200)], "k long")
    bits = bl.bloom_build(dim, "k", n_bits=128, n_hashes=3)
    kept = set(r.k for r in bl.bloom_prune(fact, "k", bits, 128, 3).collect())
    members = set(range(0, 50, 5))
    assert members <= kept  # every true member survives
    # fp rate at fill<=30/128: (30/128)^3 ~ 1.3% -> belt at 15% of 190
    assert len(kept - members) <= 0.15 * 190


def test_bloom_prune_audit_flags_match_filter(spark):
    dim = spark.createDataFrame([(i,) for i in range(7)], "k long")
    fact = spark.createDataFrame([(i,) for i in range(40)], "k long")
    bits = bl.bloom_build(dim, "k", n_bits=32, n_hashes=2)
    audit = bl.bloom_prune_audit(fact, "k", bits, 32, 2)
    passed = {r.k for r in audit.filter("_bloom_pass").collect()}
    pruned = {r.k for r in bl.bloom_prune(fact, "k", bits, 32, 2).collect()}
    assert passed == pruned
    # audit preserves every fact row exactly once
    assert audit.count() == 40


def test_bloom_probe_plan_has_no_fact_shuffle(spark):
    dim = spark.createDataFrame([(i,) for i in range(7)], "k long")
    fact = spark.createDataFrame([(i,) for i in range(40)], "k long")
    bits = bl.bloom_build(dim, "k", n_bits=32, n_hashes=2)
    plan = bl.bloom_prune(fact, "k", bits, 32, 2)._jdf.queryExecution().executedPlan().toString()
    # probes must be broadcast joins: no SortMergeJoin / ShuffledHashJoin
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan
