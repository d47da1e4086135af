"""Bounded-drain changelog replay — the engine's CDC loop.

Reference semantics (SURVEY.md §2.6, §2.12): each ``sync`` run captures an
end position (LSN / binlog pos / Kafka end offsets), streams changes up to
it, then exits ("bounded drain"). Exactly-once comes from at-least-once
delivery + idempotent upsert + committing the applied position atomically
with the data (2PC reconciliation: drivers/postgres/internal/cdc.go:69-179).

Spark-first mapping:

- ``replay_batches``   — driver-side loop over LSN-ordered batches feeding
  ``ManagedTable.upsert``; the table's ``last_lsn`` property is the committed
  position, checked before every batch (redelivered/stale batches are
  filtered by LSN, so crash-replay cannot double-apply or resurrect rows).
- ``stream_drain``     — the same loop as real Structured Streaming:
  ``readStream`` file source → ``foreachBatch(upsert)`` with
  ``Trigger.AvailableNow`` (bounded: drains what exists, then stops) and a
  checkpoint dir. Kafka sources plug in identically
  (``readStream.format("kafka")`` + AvailableNow) when the connector jar is
  present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olake_spark.sinks.table import ManagedTable

__all__ = ["replay_batches", "stream_drain", "LAST_LSN_PROP"]

LAST_LSN_PROP = "olake.cdc.last_lsn"


def _apply_batch(
    table: ManagedTable,
    batch: DataFrame,
    key_cols: list[str],
    lsn_col: str,
    mor: bool = False,
    order_cols: list[str] | None = None,
    foreach_batch: bool = False,
) -> int | None:
    """Filter already-applied LSNs, upsert, commit max LSN with the data.

    Driver-loop path: the applied position is collected with an
    ``Observation`` attached to the batch plan, so the max-LSN aggregation
    rides the write job itself — one pass over the changelog instead of a
    separate aggregation job per batch (the reference likewise tracks the
    running max cursor inside the scan loop,
    drivers/abstract/incremental.go:182-192). A batch whose rows were all
    applied before (crash replay) observes ``max = null`` and the commit is
    aborted — no manifest version, no state change.

    ``foreach_batch=True`` (Structured Streaming): a micro-batch DataFrame
    belongs to the stream's CLONED session, but the upsert's merged plan is
    rooted on the table's session — the observation listener and the write
    action land on different listener buses and ``obs.get`` can block
    forever. Micro-batches are bounded by construction, so the position is
    taken with one tiny aggregation over the persisted batch instead.
    """
    last = table.properties().get(LAST_LSN_PROP)
    if last is not None:
        batch = batch.filter(F.col(lsn_col) > F.lit(int(last)))

    write = table.upsert_mor if mor else table.upsert

    if foreach_batch:
        batch = batch.persist()
        try:
            mx = batch.agg(F.max(F.col(lsn_col)).alias("mx")).first()["mx"]
            if mx is None:
                return None  # nothing new — no write, no commit
            write(batch, key_cols, order_cols or [lsn_col],
                  properties={LAST_LSN_PROP: int(mx)})
            return int(mx)
        finally:
            batch.unpersist()

    from pyspark.sql import Observation

    obs = Observation()
    batch = batch.observe(obs, F.max(F.col(lsn_col)).alias("mx"))
    applied: dict[str, int] = {}

    def props_fn() -> dict | None:
        mx = obs.get["mx"]  # blocks until the write action completes
        if mx is None:
            return None  # nothing new — abort the commit entirely
        applied["mx"] = int(mx)
        return {LAST_LSN_PROP: int(mx)}

    write(batch, key_cols, order_cols or [lsn_col], properties_fn=props_fn)
    return applied.get("mx")


def replay_batches(
    table: ManagedTable,
    batches: list[DataFrame],
    key_cols: list[str],
    lsn_col: str,
    mor: bool = False,
    order_cols: list[str] | None = None,
) -> dict:
    """Apply LSN-ordered change batches exactly-once; returns drain stats.

    ``mor=True`` appends each batch as a merge-on-read delta (O(|batch|)
    per commit — the 100 TB-table CDC path) instead of rewriting the
    snapshot; resolution happens in ``table.read()`` / ``table.compact()``.
    ``order_cols`` adds tie-breaks below the LSN (e.g. ``["lsn", "seq"]``)
    for logs whose position is not unique per key.
    """
    applied = 0
    last_lsn = None
    for b in batches:
        mx = _apply_batch(table, b, key_cols, lsn_col, mor=mor, order_cols=order_cols)
        if mx is not None:
            applied += 1
            last_lsn = mx
    return {"batches_applied": applied, "last_lsn": last_lsn}


def stream_drain(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    table: ManagedTable,
    key_cols: list[str],
    lsn_col: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Structured-Streaming bounded drain of a file-drop changelog.

    ``Trigger.AvailableNow`` processes everything present at start across
    rate-limited micro-batches, then stops — the reference's "drain to the
    captured end position then exit" contract. The checkpoint makes restarts
    resume at the first unprocessed file; the LSN guard in ``_apply_batch``
    makes the overlap batch idempotent (checkpoint lag ⇒ at-least-once ⇒
    LSN filter ⇒ exactly-once).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_dir)

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        _apply_batch(table, batch_df, key_cols, lsn_col, foreach_batch=True)

    (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
