"""Streaming curation: quality gate → stateful dedup → parquet sink.

The continuous-ingest form of the batch ``curation_pipeline``: documents
arrive as file drops (the landing pattern of every crawl/export pipeline),
each micro-batch is quality-gated with the same codegen expressions the
batch operators use, content fingerprints key a first-wins stateful dedup
(``applyInPandasWithState`` — state = one seen-flag per fingerprint), and
survivors append to parquet under a checkpoint, so restarts are
exactly-once and a re-delivered file changes nothing within the TTL.

Scale notes: the quality filter is stateless and runs scan-side; the only
stateful shuffle keys on the content fingerprint (uniform by construction
— md5); ``availableNow`` triggers bounded drains (the reference's bounded
Kafka consume shape, see streaming/replay.py) while the same query without
a trigger runs continuously. State is BOUNDED by default: each fingerprint
carries a processing-time TTL refreshed on every sighting, so on a
continuous crawl state size tracks fingerprints seen within the TTL — not
every fingerprint ever — mirroring the reference's bounded-overlap dedup
window (drivers/abstract/cdc.go:117-136). ``ttl_ms=None`` opts into
NoTimeout (state = all fingerprints ever) for bounded corpora where a
global forever-dedup is affordable and wanted.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

from olake_spark.operators.dedup import normalize_text
from olake_spark.operators.text import tokens
from olake_spark.streaming.stateful_dedup import _dedup_fn, _dedup_fn_ttl, _STATE_SCHEMA

__all__ = ["stream_curate", "curate_batch"]


def curate_batch(df, id_col: str, text_col: str, min_tokens: int = 5):
    """Batch-equivalent of ``stream_curate``'s gate + dedup: rows with ≥
    ``min_tokens`` tokens, one survivor (min id) per normalized-content
    fingerprint. The streaming path's first-wins equals this when arrivals
    are id-ordered; the composed-pipeline tests pin the two equal so the
    streaming and batch halves of a curation pipeline cannot drift apart."""
    from pyspark.sql import Window as W

    gated = df.filter(F.size(tokens(F.col(text_col))) >= min_tokens)
    fp = F.md5(normalize_text(F.col(text_col)))
    keep = F.col(id_col) == F.min(id_col).over(W.partitionBy("_fp"))
    return (
        gated.withColumn("_fp", fp)
        .withColumn("_keep", keep)
        .filter("_keep")
        .drop("_fp", "_keep")
    )

# default TTL: 24h — generous vs the redelivery windows of the sources this
# pipeline fronts (file-drop re-uploads, Kafka redelivery, CDC re-sends are
# minutes-to-hours); state holds only fingerprints seen in the last day
DEFAULT_DEDUP_TTL_MS = 24 * 3600 * 1000


def _cloned_session(spark: SparkSession) -> SparkSession:
    """A session sharing the SparkContext with the caller's session-level
    SQL confs COPIED (``newSession()`` would drop them — a session patched
    with e.g. ``nanosAsLong`` or a session timezone would silently read
    differently in the drain). The JVM's ``cloneSession`` copies session
    state; PySpark doesn't expose it, so this reaches through py4j and
    falls back to ``newSession()`` + copying the known load-bearing confs."""
    try:
        jclone = spark._jsparkSession.cloneSession()
        return SparkSession(spark.sparkContext, jclone)
    except Exception:
        clone = spark.newSession()
        for key in (
            "spark.sql.session.timeZone",
            "spark.sql.legacy.parquet.nanosAsLong",
            "spark.sql.execution.arrow.pyspark.enabled",
            "spark.sql.shuffle.partitions",
        ):
            try:
                clone.conf.set(key, spark.conf.get(key))
            except Exception:  # conf unset in the source session
                pass
        return clone


def stream_curate(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    text_col: str,
    out_dir: str,
    checkpoint_dir: str,
    min_tokens: int = 5,
    max_files_per_trigger: int | None = None,
    ttl_ms: int | None = DEFAULT_DEDUP_TTL_MS,
    progress_path: str | None = None,
):
    """Drain ``source_dir`` file drops through the curation stream once
    (``availableNow``): rows with ≥ ``min_tokens`` whitespace tokens and an
    unseen normalized-content fingerprint append to ``out_dir``. Re-running
    with the same ``checkpoint_dir`` picks up only new files; dedup state
    persists across runs, so a duplicate delivered tomorrow still loses
    (within ``ttl_ms`` of the last sighting — the fingerprint's state then
    expires and a later redelivery passes; size ``ttl_ms`` to the source's
    redelivery window, or pass ``None`` for unbounded forever-dedup).
    Returns the finished ``StreamingQuery`` (for ``lastProgress`` state
    metrics); the drain itself has already completed. ``progress_path``
    appends one JSON line per micro-batch (rows/sec, state rows, state
    memory — ``streaming/observe.py``) so drain throughput and state
    growth are artifacts, not guesses."""
    # expiry is LAZY: timers fire only when a DATA batch runs. With the
    # default no-data micro-batches, a pending processing-time timer makes
    # the engine spin empty batches until the deadline — under availableNow
    # that means a bounded drain parks for up to a full TTL (observed: hangs
    # the drain). Lazy expiry keeps the drain bounded; state cleanup rides
    # the next delivery, which is when it matters anyway. The conf is set on
    # a CLONED session (same SparkContext, isolated SQL conf) so other
    # streaming queries in the caller's session — which may rely on no-data
    # batches for their own timers/watermarks — never see it, and concurrent
    # drains cannot race on a set/restore of session-global state.
    if ttl_ms is not None:
        spark = _cloned_session(spark)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_dir)
    gated = stream.filter(F.size(tokens(F.col(text_col))) >= min_tokens)
    keyed_schema = T.StructType(
        list(schema.fields) + [T.StructField("_fp", T.StringType())]
    )
    keyed = gated.withColumn("_fp", F.md5(normalize_text(F.col(text_col))))
    out_cols = [f.name for f in keyed_schema.fields]
    if ttl_ms is None:
        fn, timeout = _dedup_fn(out_cols), GroupStateTimeout.NoTimeout
    else:
        fn, timeout = _dedup_fn_ttl(out_cols, ttl_ms), GroupStateTimeout.ProcessingTimeTimeout
    deduped = keyed.groupBy("_fp").applyInPandasWithState(
        fn,
        outputStructType=keyed_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
    query = (
        deduped.drop("_fp")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    if progress_path is not None:
        from olake_spark.streaming.observe import write_progress_jsonl

        write_progress_jsonl(query, progress_path)
    return query
