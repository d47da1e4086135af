"""Streaming ingestion rollup — foreachBatch merge of mergeable aggregate
state into a persisted rollup table (Druid-style ingestion rollup on
Structured Streaming).

Each micro-batch builds its own tiny per-key state
(operators/incremental_agg.py: count / exact micro-unit sum / min / max /
HLL registers), merges it with the persisted state via
``agg_state_merge``, and commits the result atomically (write to a fresh
snapshot dir + pointer swap — the same commit discipline as
sinks/table.py). Raw rows are never re-read: the rollup's refresh cost
is proportional to the BATCH, and state size to the key cardinality.

Exactly-once: the checkpoint makes batch delivery at-least-once with a
stable ``batch_id`` on replay; the state commit records the latest
applied batch_id and skips replays (idempotent merge), so a crash
between the state write and the checkpoint advance cannot double-count.

At 100 TB: per-batch state is |keys| rows regardless of batch volume;
the merge joins two |keys|-row frames. The expensive aggregation happens
once per event, map-side-combinable, inside the micro-batch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olake_spark.operators import incremental_agg as ia

__all__ = ["stream_rollup", "read_rollup"]

_PTR = "_CURRENT"


def _commit_dir(state_dir: str) -> str | None:
    ptr = os.path.join(state_dir, _PTR)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        doc = json.load(fh)
    return os.path.join(state_dir, doc["snapshot"])


def _last_batch_id(state_dir: str) -> int:
    ptr = os.path.join(state_dir, _PTR)
    if not os.path.exists(ptr):
        return -1
    with open(ptr) as fh:
        return json.load(fh).get("batch_id", -1)


def read_rollup(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The current committed rollup state (None before the first commit)."""
    snap = _commit_dir(state_dir)
    return spark.read.parquet(snap) if snap else None


def stream_rollup(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    keys: list[str],
    value_col: str,
    distinct_col: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Drain ``source_dir`` parquet drops once (availableNow), folding
    each micro-batch into the persisted rollup state. Pass a GLOB
    (``.../drops/*``) when drops land as subdirectories — the file
    stream source does not recurse on its own. Re-running with the same
    checkpoint picks up only new files; replayed batches are skipped by
    batch_id (idempotent). Returns the finished StreamingQuery."""
    os.makedirs(state_dir, exist_ok=True)

    def fold(batch: DataFrame, batch_id: int):
        if batch_id <= _last_batch_id(state_dir):
            return  # replay after crash-before-checkpoint: already applied
        delta = ia.agg_state(batch, keys, value_col, distinct_col)
        prev_dir = _commit_dir(state_dir)
        if prev_dir is not None:
            prev = batch.sparkSession.read.parquet(prev_dir)
            merged = ia.agg_state_merge(prev.unionByName(delta), keys)
        else:
            merged = delta
        snap = f"snap-{batch_id}"
        merged.write.mode("overwrite").parquet(os.path.join(state_dir, snap))
        tmp = os.path.join(state_dir, f".{_PTR}.tmp")
        with open(tmp, "w") as fh:
            json.dump({"snapshot": snap, "batch_id": batch_id}, fh)
        os.replace(tmp, os.path.join(state_dir, _PTR))  # atomic pointer swap

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    query = (
        reader.parquet(source_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
