"""Chunk-level retry with a fresh writer per attempt (plans/chunk_runner.py
vs drivers/abstract/backfill.go:46-97 + utils/concurrent.go:158-170)."""

from __future__ import annotations

import json

import pytest

from olake_spark.plans.chunk_runner import (
    COMMITTED_IDS_PROP,
    chunk_thread_id,
    run_chunked_backfill,
)
from olake_spark.plans.chunks import Chunk
from olake_spark.plans.state import SyncState
from olake_spark.sinks.table import ManagedTable

CHUNKS = [Chunk(None, 100), Chunk(100, 200), Chunk(200, None)]


def _reader(spark, fail_plan=None):
    """Chunk reader over a synthetic id range; ``fail_plan`` maps a chunk
    min to how many attempts should blow up before succeeding."""
    fail_plan = dict(fail_plan or {})
    calls: list = []

    def read(chunk: Chunk):
        calls.append(chunk)
        left = fail_plan.get(chunk.min, 0)
        if left > 0:
            fail_plan[chunk.min] = left - 1
            raise RuntimeError(f"simulated writer death for {chunk}")
        lo = chunk.min if chunk.min is not None else 0
        hi = chunk.max if chunk.max is not None else 300
        return spark.range(lo, hi).toDF("id")

    read.calls = calls
    return read


def test_retry_reruns_whole_chunk_with_fresh_plan(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"))
    state = SyncState()
    state.get_or_plan_chunks("s", lambda: CHUNKS)
    read = _reader(spark, fail_plan={100: 2})  # middle chunk dies twice

    report = run_chunked_backfill(t, "s", CHUNKS, read, state=state, max_retries=3)
    assert report.chunks_done == 3 and report.retries == 2 and report.chunks_skipped == 0
    # every row exactly once despite the two mid-chunk failures
    assert t.read().count() == 300
    assert t.read().select("id").distinct().count() == 300
    # middle chunk re-read on every attempt (fresh plan), 3+2 calls total
    assert len(read.calls) == 5
    # state drained → resumable bookkeeping complete
    assert state.streams["s"].chunks == []
    # all three thread ids committed atomically with the data
    ids = set(json.loads(t.properties()[COMMITTED_IDS_PROP]))
    assert ids == {chunk_thread_id("s", c) for c in CHUNKS}


def test_committed_chunk_skips_on_resume(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"))
    read = _reader(spark)
    run_chunked_backfill(t, "s", CHUNKS[:2], read)
    n = t.read().count()

    # crash-after-commit simulation: state lost, table kept — a full re-run
    # must skip the committed chunks and add only the missing one
    report = run_chunked_backfill(t, "s", CHUNKS, _reader(spark))
    assert report.chunks_skipped == 2 and report.chunks_done == 1
    assert t.read().count() == n + 100
    assert t.read().select("id").distinct().count() == 300


def test_exhausted_retries_raise_and_leave_no_partial_commit(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"))
    read = _reader(spark, fail_plan={None: 99})  # first chunk never succeeds
    with pytest.raises(RuntimeError, match="simulated"):
        run_chunked_backfill(t, "s", CHUNKS, read, max_retries=2)
    # nothing committed: failed attempts publish no manifest
    assert not t.exists()
