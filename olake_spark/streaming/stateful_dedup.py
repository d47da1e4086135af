"""Streaming exact dedup — custom stateful operator via
``applyInPandasWithState``.

The at-scale CDC problem the reference solves with equality deletes inside
the sink (BaseDeltaTaskWriter.java:51-68): redelivered records must not
land twice. The MERGE path dedups at write; this operator dedups
IN THE STREAM, so downstream stages never see the duplicate at all —
useful when the sink is append-only (files, a message bus) or when dedup
must happen before an expensive transform.

Design: group by the record key; keyed state = a single seen-flag (O(1)
state per key, not a growing set — state stores survive billions of keys
because each entry is one row). First occurrence passes through, every
later occurrence drops. Watermark-less NoTimeout state here; production
would set a TTL timeout matching the redelivery window so state is bounded
by (keys seen within TTL), the same bounded-overlap reasoning as the
reference's dedup-inserts window (drivers/abstract/cdc.go:117-136).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stream_dedup_first_wins", "stream_dedup_first_wins_tws", "_dedup_fn_ttl"]

_STATE_SCHEMA = T.StructType([T.StructField("seen", T.LongType())])


def _dedup_fn(output_columns: list[str]):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # key already emitted in an earlier batch — drop all
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]][output_columns]
        if first is not None:
            state.update((1,))
            yield first

    return fn


def _dedup_fn_ttl(output_columns: list[str], ttl_ms: int):
    """First-wins dedup with per-key processing-time TTL (bounded state).

    Requires ``GroupStateTimeout.ProcessingTimeTimeout``. Each sighting
    refreshes the deadline, so a key's state expires ``ttl_ms`` after its
    LAST delivery — state size is bounded by keys seen within the TTL, not
    keys ever seen (the reference's bounded-overlap reasoning,
    drivers/abstract/cdc.go:117-136). A duplicate redelivered after the TTL
    passes through again — the documented trade for bounded state; size the
    TTL to the source's redelivery window."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # deadline passed with no new delivery — forget
            return
        if state.exists:
            state.setTimeoutDuration(ttl_ms)  # refresh on redelivery
            return
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]][output_columns]
        if first is not None:
            state.update((1,))
            state.setTimeoutDuration(ttl_ms)
            yield first

    return fn


def stream_dedup_first_wins(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    key_col: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Bounded drain of a file-drop stream keeping only the FIRST record per
    key across all micro-batches. Returns the deduped snapshot (memory sink
    is test plumbing; production writes foreachBatch/files)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_dir)
    cols = [f.name for f in schema.fields]
    deduped = stream.groupBy(key_col).applyInPandasWithState(
        _dedup_fn(cols),
        outputStructType=schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = "olake_stream_dedup"
    (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(name)


def stream_dedup_first_wins_tws(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    key_col: str,
    checkpoint_dir: str,
    ttl_ms: int | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``transformWithStateInPandas`` form of first-wins dedup — the Spark 4
    arbitrary-state API whose per-state TTL makes the bounded-state story
    real: with ``ttl_ms`` set to the redelivery window, state size is
    bounded by keys seen within the TTL instead of all keys ever (the same
    bounded-overlap reasoning as the reference's dedup-inserts window,
    drivers/abstract/cdc.go:117-136). Semantics identical to
    ``stream_dedup_first_wins``; state layout identical (one row per key).

    Env note: the transformWithState Python worker speaks protobuf to the
    JVM state server — requires ``google.protobuf`` on the Python path and
    the RocksDB state store provider (set below). Tests skip, never fake,
    where protobuf is absent.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    cols = [f.name for f in schema.fields]

    class _FirstWins(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState("seen", "seen LONG", ttl_ms)

        def handleInputRows(self, key, rows, timer_values):
            if self._seen.exists():
                return
            for pdf in rows:
                if len(pdf):
                    self._seen.update((1,))
                    yield pdf.iloc[[0]][cols]
                    return

        def close(self) -> None:
            pass

    # transformWithState requires the RocksDB state store provider (the
    # HDFS-backed default does not implement multiple column families)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_dir)
    deduped = stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_FirstWins(),
        outputStructType=schema,
        outputMode="append",
        timeMode="processingTime" if ttl_ms is not None else "none",
    )
    name = "olake_stream_dedup_tws"
    (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(name)
