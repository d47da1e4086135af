"""Streaming observability: per-micro-batch progress → JSONL artifact.

The batch side reports through ``stats.py`` and ``bench.py``; this gives
the streaming path the same discipline. Structured Streaming already
meters every micro-batch (rows in/out, processing rate, state rows and
bytes) through the query's progress events — this module harvests
``query.recentProgress`` after a bounded drain (or on a listener-free
schedule for long-lived queries) and appends one compact JSON line per
micro-batch, so throughput and state growth are inspectable artifacts
rather than guesses.

A post-drain harvest is used instead of a live ``StreamingQueryListener``
because bounded ``availableNow`` drains (this repo's replay/curation
shape) complete in one call — the full progress history is still in
memory when the drain returns, and a listener's extra thread + queue buy
nothing. ``spark.sql.streaming.numRecentProgressUpdates`` bounds the
in-memory history (default 100 batches); raise it for drains with more
micro-batches than that.
"""

from __future__ import annotations

import json
import os

__all__ = ["harvest_progress", "write_progress_jsonl", "drain_summary"]


def harvest_progress(query) -> list[dict]:
    """Compact per-micro-batch metrics from ``query.recentProgress``."""
    out = []
    for p in query.recentProgress or []:
        if isinstance(p, str):  # older PySpark surfaces JSON strings
            p = json.loads(p)
        state = (p.get("stateOperators") or [{}])[0]
        out.append(
            {
                "batch_id": p.get("batchId"),
                "timestamp": p.get("timestamp"),
                "input_rows": p.get("numInputRows"),
                "rows_per_sec": p.get("processedRowsPerSecond"),
                "batch_duration_ms": (p.get("durationMs") or {}).get(
                    "triggerExecution"
                ),
                "state_rows": state.get("numRowsTotal"),
                "state_rows_updated": state.get("numRowsUpdated"),
                "state_rows_removed": state.get("numRowsRemoved"),
                "state_memory_bytes": state.get("memoryUsedBytes"),
                "sink_output_rows": (p.get("sink") or {}).get("numOutputRows"),
            }
        )
    return out


def write_progress_jsonl(query, path: str) -> list[dict]:
    """Append one JSON line per micro-batch to ``path``; returns the
    harvested records (empty when the drain processed no data)."""
    records = harvest_progress(query)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")
    return records


def drain_summary(records: list[dict]) -> dict:
    """Whole-drain rollup of a harvest: totals + peak state footprint."""
    rows = sum(r["input_rows"] or 0 for r in records)
    ms = sum(r["batch_duration_ms"] or 0 for r in records)
    return {
        "micro_batches": len(records),
        "input_rows": rows,
        "busy_ms": ms,
        "rows_per_sec_busy": round(rows / (ms / 1000.0)) if ms else None,
        "peak_state_rows": max(
            (r["state_rows"] or 0 for r in records), default=0
        ),
        "peak_state_memory_bytes": max(
            (r["state_memory_bytes"] or 0 for r in records), default=0
        ),
        # file sinks report -1 ("unknown") for numOutputRows; summing the
        # sentinel would yield a nonsense negative total — unknown batches
        # contribute nothing, and all-unknown rolls up as None
        "sink_output_rows": (
            sum(v)
            if (v := [r["sink_output_rows"] for r in records
                      if r["sink_output_rows"] is not None
                      and r["sink_output_rows"] >= 0])
            else None
        ),
    }
