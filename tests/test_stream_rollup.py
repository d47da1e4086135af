"""Streaming ingestion rollup: drain == batch recompute, resume picks up
only new files, replayed batch ids are idempotent."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from olake_spark.operators import incremental_agg as ia
from olake_spark.streaming.rollup import read_rollup, stream_rollup

SCHEMA = T.StructType(
    [
        T.StructField("g", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("uid", T.IntegerType()),
    ]
)


def _rows(lo, hi):
    return [(f"g{i % 3}", float(i) / 7.0, i % 40) for i in range(lo, hi)]


def _drop(spark, src, name, lo, hi):
    spark.createDataFrame(_rows(lo, hi), SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, name))


def _state_rows(state):
    return sorted(
        (r.g, r.n, r.sum_micros, r.min_micros, r.max_micros, list(r.hll_regs))
        for r in state.collect()
    )


def test_stream_rollup_matches_batch_and_resumes(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _drop(spark, src, "a", 0, 200)
    _drop(spark, src, "b", 200, 350)
    stream_rollup(
        spark, f"{src}/*", SCHEMA, ["g"], "value", "uid", state, ckpt,
        max_files_per_trigger=1,
    )
    got = read_rollup(spark, state)
    full = ia.agg_state(
        spark.createDataFrame(_rows(0, 350), SCHEMA), ["g"], "value", "uid"
    )
    assert _state_rows(got) == _state_rows(full)

    # resume: only the new file folds in
    _drop(spark, src, "c", 350, 500)
    stream_rollup(spark, f"{src}/*", SCHEMA, ["g"], "value", "uid", state, ckpt)
    got2 = read_rollup(spark, state)
    full2 = ia.agg_state(
        spark.createDataFrame(_rows(0, 500), SCHEMA), ["g"], "value", "uid"
    )
    assert _state_rows(got2) == _state_rows(full2)


def test_stream_rollup_replayed_batch_is_skipped(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _drop(spark, src, "a", 0, 100)
    stream_rollup(spark, f"{src}/*", SCHEMA, ["g"], "value", "uid", state, ckpt)
    before = _state_rows(read_rollup(spark, state))
    applied = json.load(open(os.path.join(state, "_CURRENT")))["batch_id"]

    # simulate a crash AFTER the state commit but BEFORE the checkpoint
    # advanced: the engine re-delivers the same batch_id -> must be a no-op
    ckpt2 = str(tmp_path / "ckpt2")  # fresh checkpoint replays batch 0
    stream_rollup(spark, f"{src}/*", SCHEMA, ["g"], "value", "uid", state, ckpt2)
    assert json.load(open(os.path.join(state, "_CURRENT")))["batch_id"] == applied
    assert _state_rows(read_rollup(spark, state)) == before
