"""Chunk-level backfill runner: retry with a FRESH writer per attempt.

Spark task retries re-run *tasks*, not the commit path — a chunk whose
writer died mid-commit needs the whole (read → write → commit) re-driven.
The reference does this with per-chunk writer threads retried whole
(drivers/abstract/backfill.go:46-97 chunkProcessor +
utils/concurrent.go:158-170 ConcurrentInGroupWithRetry), made idempotent by
a deterministic per-chunk thread id recorded in destination metadata
(FullRefreshCommittedIDs): a retried or resumed chunk whose id is already
committed is skipped.

Here the same contract rides the ManagedTable manifest: every chunk append
commits its data files AND its chunk id in ONE atomic manifest version, so

- a failed attempt leaves no manifest → its data files are invisible; the
  next attempt re-reads the chunk with a fresh plan and a fresh data dir
  (the "fresh writer")
- a crash after commit but before the state write is healed on resume by
  the committed-ids check — the chunk skips, no duplicate rows
- the pending-chunk state drains per chunk (types/state.go:192-255), so a
  killed backfill resumes from the surviving set

Chunks run sequentially on the driver; the parallelism lives INSIDE each
chunk's Spark job (a chunk maps to many partitions via
``read_chunked(predicates=...)``). That matches the 100 TB shape: the
cluster is saturated by one chunk's scan, and chunk granularity exists for
retry/resume bounds, not for concurrency.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame

from olake_spark.plans.chunks import Chunk
from olake_spark.sinks.table import ManagedTable

__all__ = ["COMMITTED_IDS_PROP", "chunk_thread_id", "run_chunked_backfill", "BackfillReport"]

COMMITTED_IDS_PROP = "olake.backfill.committed_ids"


def chunk_thread_id(stream: str, chunk: Chunk) -> str:
    """Deterministic chunk identity (backfill.go:51 generateThreadID shape):
    survives process restarts, keys the committed-ids idempotence check."""
    return f"{stream}_min[{chunk.min}]-max[{chunk.max}]"


def _committed(table: ManagedTable) -> set[str]:
    if not table.exists():
        return set()
    return set(json.loads(table.properties().get(COMMITTED_IDS_PROP, "[]")))


@dataclass
class BackfillReport:
    chunks_done: int = 0
    chunks_skipped: int = 0
    retries: int = 0


def run_chunked_backfill(
    table: ManagedTable,
    stream: str,
    chunks: list[Chunk],
    read_chunk: Callable[[Chunk], DataFrame],
    state=None,
    max_retries: int = 3,
) -> BackfillReport:
    """Drive every chunk through (fresh read → append → atomic commit),
    retrying failed chunks whole.

    ``read_chunk`` must build a FRESH DataFrame per call — each attempt
    re-plans the scan (new JDBC connections, new data dir), never reuses a
    possibly-poisoned plan. ``state`` (a ``SyncState``) drains its pending
    chunk set as chunks land, enabling resume-from-kill.
    """
    report = BackfillReport()
    ordered = sorted(chunks, key=lambda c: (c.min is not None, c.min))
    for chunk in ordered:
        tid = chunk_thread_id(stream, chunk)
        done = _committed(table)
        if tid in done:
            # committed in a previous run/attempt — the crash happened after
            # the table commit; skipping is what makes replay exactly-once
            report.chunks_skipped += 1
            if state is not None:
                state.complete_chunk(stream, chunk)
            continue
        attempt = 0
        while True:
            try:
                df = read_chunk(chunk)  # fresh plan every attempt
                table.append(
                    df,
                    properties={COMMITTED_IDS_PROP: json.dumps(sorted(done | {tid}))},
                )
                break
            except Exception:
                attempt += 1
                report.retries += 1
                if attempt > max_retries:
                    raise
        report.chunks_done += 1
        if state is not None:
            state.complete_chunk(stream, chunk)
    return report
