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


def test_persisted_lsh_index_joins_exchange_free(spark):
    """The index-artifact lifecycle at the plan level: lsh_build_index
    written bucketed on (band, sig) and read back feeds lsh_bucket_topk
    with NO Exchange on the corpus side — the 100 TB contract: the
    corpus-wide signature pass happens at build time, the per-query plan
    only broadcasts the (tiny) query side."""
    from olake_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    idx = sim.lsh_build_index(emb)
    write_bucketed(idx, "bt_lsh_index", ["band", "sig"], 8)
    try:
        persisted = spark.table("bt_lsh_index")
        out = sim.lsh_bucket_topk(
            emb.filter(F.col("vec_id") < 5), index=persisted, k=5
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # corpus-side scan feeds the band-bucket hash join without an
        # Exchange; the only exchanges in the plan belong to the (tiny)
        # post-join per-query window. Count hash exchanges BEFORE the
        # BroadcastHashJoin's streamed side by checking the scan→join path:
        join_part = plan.split("BroadcastHashJoin")[-1]
        assert "Scan parquet" in join_part  # bucketed scan streams into join
        assert "Exchange hashpartitioning(band" not in plan
        assert "Exchange hashpartitioning(sig" not in plan
        # results identical to the inline path
        inline = sorted(map(tuple, sim.lsh_bucket_topk(
            emb.filter(F.col("vec_id") < 5), emb, k=5).collect()))
        assert sorted(map(tuple, out.collect())) == inline and inline
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_lsh_index")


def test_persisted_ivfpq_index_joins_exchange_free(spark):
    """Same contract for the IVF-PQ artifact: (id, cell, sub, code)
    bucketed on _cell reads co-located; the ADC join against the broadcast
    LUT plans no Exchange on the index side."""
    from olake_spark.operators import pq as pqm
    from olake_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = sim.stride_centroids(emb)
    cb = pqm.pq_stride_codebooks(emb)
    idx = pqm.ivfpq_index(emb, cents, cb)
    write_bucketed(idx, "bt_ivfpq_index", ["_cell"], 8)
    try:
        persisted = spark.table("bt_ivfpq_index")
        out = pqm.ivfpq_topk(
            emb.filter(F.col("vec_id") < 3), persisted, cb, cents, k=3, nprobe=2
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(_cell" not in plan
        inline = sorted(map(tuple, pqm.ivfpq_topk(
            emb.filter(F.col("vec_id") < 3), idx, cb, cents, k=3, nprobe=2
        ).collect()))
        assert sorted(map(tuple, out.collect())) == inline and inline
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_ivfpq_index")
