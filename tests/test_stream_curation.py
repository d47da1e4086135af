"""Streaming curation e2e: quality gate → stateful dedup → parquet sink."""

from __future__ import annotations

import time

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


def _case_curate_filters_dedups_and_resumes(spark, tmp_path):
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


def _state_rows(query) -> int | None:
    """numRowsTotal from the drain's last batch that reported state metrics."""
    for progress in reversed(query.recentProgress):
        ops = progress.get("stateOperators") or []
        if ops:
            return ops[0]["numRowsTotal"]
    return None


def _case_curate_ttl_expires_and_bounds_state(spark, tmp_path):
    """Bounded-state contract: redeliveries within the TTL keep state flat
    (one row per live fingerprint, refreshed not duplicated); a fingerprint
    with no sighting for > TTL is REMOVED from the store at the next batch,
    and a redelivery after expiry passes through again — the documented
    trade that keeps state ∝ fingerprints-within-TTL on a continuous crawl."""
    src = str(tmp_path / "drops")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    good = "a sufficiently long document about spark streaming state"
    other = "another long unique document that triggers the timeout batch"
    ttl = 500  # ms — tiny so the test can watch expiry

    _write_drop(spark, f"{src}/d0000", [(1, good)])
    q = stream_curate(spark, f"{src}/d*", SCHEMA, "text", out, ckpt,
                      min_tokens=5, ttl_ms=ttl)
    assert _state_rows(q) == 1

    # redelivery WITHIN the TTL: dropped, and state stays flat (refresh, not grow)
    _write_drop(spark, f"{src}/d0001", [(2, good)])
    q = stream_curate(spark, f"{src}/d*", SCHEMA, "text", out, ckpt,
                      min_tokens=5, ttl_ms=ttl)
    assert _state_rows(q) == 1
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1}

    # deadline lapses; the next batch (new unrelated doc) fires the timeout
    # and REMOVES the expired fingerprint — state holds only the live one
    time.sleep(2.0)
    _write_drop(spark, f"{src}/d0002", [(3, other)])
    q = stream_curate(spark, f"{src}/d*", SCHEMA, "text", out, ckpt,
                      min_tokens=5, ttl_ms=ttl)
    assert _state_rows(q) == 1
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 3}

    # redelivery AFTER expiry passes again — bounded state's documented trade
    time.sleep(2.0)
    _write_drop(spark, f"{src}/d0003", [(4, good)])
    stream_curate(spark, f"{src}/d*", SCHEMA, "text", out, ckpt,
                  min_tokens=5, ttl_ms=ttl)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 3, 4}


def _case_composed_curate_then_incremental_dedup(spark, tmp_path):
    """The production daily shape composed end-to-end: streaming curation
    gate → daily incremental MinHash against the persisted corpus index.
    Pins (a) the streamed curation output equal to ``curate_batch`` (the
    batch equivalent the oracle query verifies), and (b) the incremental
    dedup consuming the stream's output schema directly — interface drift
    between the streaming and batch halves fails here."""
    from olake_spark.operators.dedup import incremental_minhash_dedup, minhash_index
    from olake_spark.streaming.curation import curate_batch, stream_curate

    corpus = spark.createDataFrame(
        [
            (100 + i, f"corpus document number {100 + i} holding several distinct tokens")
            for i in range(20)
        ],
        SCHEMA,
    )
    idx = minhash_index(corpus, "doc_id", "text")

    arrivals = [
        (1, "a sufficiently long document about spark streaming state"),
        (2, "too short"),  # quality-gated
        (3, "a sufficiently long document about spark streaming state"),  # dup of 1
        (4, "corpus document number 105 holding several distinct tokens"),  # in corpus
        (5, "another long unique arrival that survives every stage today"),
    ]
    src = str(tmp_path / "drops")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_drop(spark, f"{src}/d0000", arrivals[:3])
    _write_drop(spark, f"{src}/d0001", arrivals[3:])
    stream_curate(spark, f"{src}/d*", SCHEMA, "text", out, ckpt, min_tokens=5,
                  max_files_per_trigger=1)
    streamed = spark.read.parquet(out)

    arr_df = spark.createDataFrame(arrivals, SCHEMA)
    batch = curate_batch(arr_df, "doc_id", "text", min_tokens=5)
    assert {r.doc_id for r in streamed.collect()} == {
        r.doc_id for r in batch.collect()
    } == {1, 4, 5}

    final = incremental_minhash_dedup(streamed, idx, "doc_id", "text", threshold=0.7)
    assert {r.doc_id for r in final.collect()} == {1, 5}  # 4 matches the corpus


def test_progress_artifact_written(spark, tmp_path):
    """stream_curate(progress_path=) appends one JSON line per micro-batch
    with the state/throughput fields drain_summary rolls up."""
    import json

    from pyspark.sql import types as T

    from olake_spark.streaming.curation import stream_curate
    from olake_spark.streaming.observe import drain_summary

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    rows = [(i, f"unique document body number {i} with enough tokens here")
            for i in range(20)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f"{src}/drop_0000")
    prog = str(tmp_path / "progress.jsonl")
    stream_curate(
        spark, f"{src}/drop_*", schema, "text",
        str(tmp_path / "out"), str(tmp_path / "ckpt"), progress_path=prog,
    )
    recs = [json.loads(line) for line in open(prog)]
    assert recs, "no progress lines written"
    s = drain_summary(recs)
    assert s["input_rows"] == 20
    assert s["peak_state_rows"] == 20  # one fingerprint per unique doc
    assert s["peak_state_memory_bytes"] > 0
    assert s["rows_per_sec_busy"] > 0
