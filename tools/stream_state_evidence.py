"""Streaming stateful-dedup state-growth evidence (r6 verdict #7).

The TTL'd first-wins dedup (streaming/stateful_dedup.py) claims bounded
state: with a processing-time TTL sized to the source's redelivery
window, state rows track keys seen WITHIN the TTL, not keys ever seen.
The rollup already has delta-commit evidence; this tool gives the dedup
index the same measured story across a ≥20-micro-batch drain:

- 24 file drops, one micro-batch each (maxFilesPerTrigger=1); drop i
  carries a SLIDING key window (300 new keys + 600 carried), so the
  distinct-keys-ever line grows linearly all run long;
- run A (no TTL): state_rows grows with keys ever seen — the unbounded
  baseline;
- run B (TTL): expired keys drop out of the store, state_rows plateaus.

Each micro-batch's progress (input rows, state rows/bytes, removals) is
appended to STREAM_PROGRESS.jsonl with a ``run`` tag, and a summary
block prints at the end: peak state for both runs + the plateau
evidence (late-run TTL state ≪ keys ever seen, state_rows_removed > 0).

Run:  python tools/stream_state_evidence.py [--out STREAM_PROGRESS.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DROPS = 24
NEW_PER_DROP = 300
WINDOW = 900  # keys per drop: 300 new + 600 carried from prior drops
TTL_MS = 2_500


def _write_drops(spark, src: str) -> int:
    """Sequentially-named drops; key windows slide so every key appears in
    exactly 3 consecutive drops (the redelivery-overlap shape the TTL is
    sized for). Returns total distinct keys."""
    from pyspark.sql import functions as F

    for i in range(N_DROPS):
        lo = i * NEW_PER_DROP
        df = spark.range(lo, lo + WINDOW).select(
            F.col("id").alias("k"),
            (F.col("id") * 17 + i).alias("v"),
        )
        # append each drop as ONE part file into the flat source dir — the
        # file stream picks them up oldest-first, one per micro-batch
        df.coalesce(1).write.mode("append").parquet(src)
    return (N_DROPS - 1) * NEW_PER_DROP + WINDOW


def _drain(spark, src: str, schema, ttl_ms: int | None, tag: str, out: str):
    from pyspark.sql.streaming.state import GroupStateTimeout

    from olake_spark.streaming.observe import harvest_progress
    from olake_spark.streaming.stateful_dedup import _dedup_fn, _dedup_fn_ttl

    ckpt = tempfile.mkdtemp(prefix=f"olake_sse_ckpt_{tag}_")
    cols = [f.name for f in schema.fields]
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(src)
    )
    if ttl_ms is None:
        fn, timeout = _dedup_fn(cols), GroupStateTimeout.NoTimeout
    else:
        fn, timeout = (
            _dedup_fn_ttl(cols, ttl_ms),
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    deduped = stream.groupBy("k").applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=timeout,
    )
    name = f"olake_sse_{tag}"
    writer = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
    )
    if ttl_ms is None:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        # availableNow + ProcessingTimeTimeout never terminates on its own:
        # after the data drains, Spark keeps firing empty micro-batches to
        # expire timers (hundreds of them). Run a fast processing-time
        # trigger instead and stop once every data file has been consumed —
        # the TTL expiries we're measuring happen DURING the data batches.
        import time as _time

        q = writer.trigger(processingTime="50 milliseconds").start()
        deadline = _time.time() + 300
        while _time.time() < deadline:
            p = q.lastProgress
            done = (
                p is not None
                and (p.get("batchId") or 0) >= N_DROPS
                and (p.get("numInputRows") or 0) == 0
            )
            if done:
                break
            _time.sleep(0.5)
        q.stop()
        q.awaitTermination()
    records = harvest_progress(q)
    # drop trailing empty batches (TTL drain-out); keep data batches + the
    # first empties where expiries land
    while records and (records[-1]["input_rows"] or 0) == 0 and (
        records[-1]["state_rows_removed"] or 0
    ) == 0:
        records.pop()
    for r in records:
        r["run"] = tag
    with open(out, "a") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")
    n_out = spark.table(name).count()
    shutil.rmtree(ckpt, ignore_errors=True)
    return records, n_out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="STREAM_PROGRESS.jsonl")
    args = ap.parse_args()

    from olake_spark.session import get_spark

    spark = get_spark(
        "olake_stream_state_evidence",
        # 4 shuffle partitions: each micro-batch touches |partitions| state
        # store instances, and at 48 batches x 32 stores the store overhead
        # IS the wall; 4 keeps every batch honest and the run under a minute
        shuffle_partitions=4,
        extra_conf={
            # keep the full 24-batch history harvestable
            "spark.sql.streaming.numRecentProgressUpdates": "64",
        },
    )
    src = tempfile.mkdtemp(prefix="olake_sse_src_")
    try:
        total_keys = _write_drops(spark, src)
        schema = spark.read.parquet(src).schema

        # fresh artifact: both runs, tagged per line
        open(args.out, "w").close()
        rec_a, out_a = _drain(spark, src, schema, None, "no_ttl", args.out)
        rec_b, out_b = _drain(spark, src, schema, TTL_MS, f"ttl_{TTL_MS}ms", args.out)

        last_a = rec_a[-1]["state_rows"]
        last_b = rec_b[-1]["state_rows"]
        peak_b = max(r["state_rows"] or 0 for r in rec_b)
        removed_b = sum(r["state_rows_removed"] or 0 for r in rec_b)
        summary = {
            "micro_batches": [len(rec_a), len(rec_b)],
            "distinct_keys_ever": total_keys,
            "dedup_output_rows": [out_a, out_b],
            "no_ttl_final_state_rows": last_a,
            "ttl_final_state_rows": last_b,
            "ttl_peak_state_rows": peak_b,
            "ttl_state_rows_removed": removed_b,
            "ttl_ms": TTL_MS,
            "bounded": bool(removed_b > 0 and peak_b < last_a),
        }
        with open(args.out, "a") as fh:
            fh.write(json.dumps({"summary": summary}) + "\n")
        print(json.dumps(summary, indent=2))
    finally:
        shutil.rmtree(src, ignore_errors=True)


if __name__ == "__main__":
    main()
