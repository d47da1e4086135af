"""Source/destination reconciliation: fingerprints, checksums, diff.

The oracle gate (sync_chunk_checksums / sync_table_diff) proves the
cross-engine canonical rendering; these tests pin the operator semantics
the gate can't see — single-row sensitivity, NULL handling, and that the
diff join shuffles thin (pk, fp) tuples rather than full rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from olake_spark.operators import reconcile as rc


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_checksum_detects_single_value_change(spark, sf_dir):
    src = _orders(spark, sf_dir)
    cols = ["o_orderkey", "o_totalprice"]
    base = rc.chunk_checksums(src.select(*cols), "o_orderkey", 128, cols)
    tweaked = src.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") == 7, F.col("o_totalprice") + 0.01)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    after = rc.chunk_checksums(tweaked, "o_orderkey", 128, cols)
    drift = (
        base.alias("a")
        .join(after.alias("b"), "chunk_id")
        .where(F.col("a.checksum") != F.col("b.checksum"))
        .select("chunk_id")
        .collect()
    )
    # exactly the one chunk containing key 7 drifts; counts stay equal
    assert [r.chunk_id for r in drift] == [0]
    assert (
        base.join(after, "chunk_id").where(
            base.n_rows != after.n_rows
        ).count()
        == 0
    )


def test_null_rendering_distinguishes_null_from_sentinel_string(spark):
    df = spark.createDataFrame(
        [(1, None), (2, rc.NULLTOK), (3, "x")], "id long, v string"
    )
    fps = {
        r.id: r.fp
        for r in df.select(
            "id", rc.row_fingerprint64(df, ["v"]).alias("fp")
        ).collect()
    }
    # NULL and the literal sentinel string collide by design (documented
    # sentinel contract) — but both differ from real values
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_table_diff_statuses_and_thin_shuffle(spark, sf_dir):
    src = _orders(spark, sf_dir).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    dst = (
        src.where(F.col("o_orderkey") % 11 != 0)  # -> removed
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 5)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),  # -> changed
            "o_orderstatus",
        )
        .unionByName(
            src.limit(3).select(
                (F.col("o_orderkey") + 1_000_000_000).alias("o_orderkey"),
                "o_totalprice",
                "o_orderstatus",
            )  # -> added
        )
    )
    diff = rc.table_diff(src, dst, ["o_orderkey"])
    by = {r.status: r.n for r in diff.groupBy("status").agg(F.count("*").alias("n")).collect()}
    n = src.count()
    removed = src.where(F.col("o_orderkey") % 11 == 0).count()
    changed = src.where(
        (F.col("o_orderkey") % 11 != 0) & (F.col("o_orderkey") % 13 == 0)
    ).count()
    assert by.get("removed", 0) == removed
    assert by.get("changed", 0) == changed
    assert by.get("added", 0) == 3
    # unchanged rows never surface
    assert diff.count() == removed + changed + 3 < n
    # the join inputs are thin: pk + one fingerprint column per side
    plan = diff._jdf.queryExecution().optimizedPlan().toString()
    assert "o_totalprice" not in plan.split("Join")[0]


def test_fingerprint_column_order_matters(spark):
    df = spark.createDataFrame([("a", "b")], "x string, y string")
    xy = df.select(rc.row_fingerprint64(df, ["x", "y"]).alias("fp")).first().fp
    yx = df.select(rc.row_fingerprint64(df, ["y", "x"]).alias("fp")).first().fp
    assert xy != yx
