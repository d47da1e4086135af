"""Streaming curation e2e: quality gate → stateful dedup → parquet sink."""

from __future__ import annotations

from pyspark.sql import types as T

from olake_spark.streaming.curation import stream_curate

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _write_drop(spark, path: str, rows) -> None:
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(path)


def test_stream_curate_filters_dedups_and_resumes(spark, tmp_path):
    # one file per trigger: arrival order = file order, so "first wins"
    # is deterministic across drops (within one micro-batch the winner
    # among same-content rows is arrival-order-defined, not id-defined)
    src = str(tmp_path / "drops")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    good = "a sufficiently long document about spark streaming state"
    _write_drop(
        spark,
        f"{src}/d0000",
        [
            (1, good),
            (2, "too short"),  # quality-gated
            (3, "another long document that clearly passes the token gate"),
        ],
    )
    _write_drop(
        spark,
        f"{src}/d0001",
        [
            (4, good.upper()),  # near-identical: normalization makes it a dupe of 1
            (5, "a third unique long document passing the quality filter"),
        ],
    )
    stream_curate(spark, f"{src}/d*", SCHEMA, "text", out, ckpt, min_tokens=5,
                  max_files_per_trigger=1)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 3, 5}

    # re-run with the SAME checkpoint and no new files: nothing changes
    stream_curate(spark, f"{src}/d*", SCHEMA, "text", out, ckpt, min_tokens=5,
                  max_files_per_trigger=1)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 3, 5}

    # tomorrow's drop: one genuinely new doc, one dupe of an OLD run's doc —
    # dedup state persisted in the checkpoint must still reject it
    _write_drop(
        spark,
        f"{src}/d0002",
        [
            (6, good),  # content seen in run 1
            (7, "a brand new long document arriving a day later than the rest"),
        ],
    )
    stream_curate(spark, f"{src}/d*", SCHEMA, "text", out, ckpt, min_tokens=5,
                  max_files_per_trigger=1)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 3, 5, 7}
