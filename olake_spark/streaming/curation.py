"""Streaming curation: quality gate → stateful dedup → parquet sink.

The continuous-ingest form of the batch ``curation_pipeline``: documents
arrive as file drops (the landing pattern of every crawl/export pipeline),
each micro-batch is quality-gated with the same codegen expressions the
batch operators use, content fingerprints key a first-wins stateful dedup
(``applyInPandasWithState`` — state = one 60-bit flag per seen fingerprint,
bounded by distinct content), and survivors append to parquet under a
checkpoint, so restarts are exactly-once and a re-delivered file changes
nothing.

Scale notes: the quality filter is stateless and runs scan-side; the only
stateful shuffle keys on the content fingerprint (uniform by construction
— md5); ``availableNow`` triggers bounded drains (the reference's bounded
Kafka consume shape, see streaming/replay.py) while the same query without
a trigger runs continuously.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

from olake_spark.operators.dedup import normalize_text
from olake_spark.operators.text import tokens
from olake_spark.streaming.stateful_dedup import _dedup_fn, _STATE_SCHEMA

__all__ = ["stream_curate"]


def stream_curate(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    text_col: str,
    out_dir: str,
    checkpoint_dir: str,
    min_tokens: int = 5,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain ``source_dir`` file drops through the curation stream once
    (``availableNow``): rows with ≥ ``min_tokens`` whitespace tokens and an
    unseen normalized-content fingerprint append to ``out_dir``. Re-running
    with the same ``checkpoint_dir`` picks up only new files; dedup state
    persists across runs, so a duplicate delivered tomorrow still loses."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_dir)
    gated = stream.filter(F.size(tokens(F.col(text_col))) >= min_tokens)
    keyed_schema = T.StructType(
        list(schema.fields) + [T.StructField("_fp", T.StringType())]
    )
    keyed = gated.withColumn("_fp", F.md5(normalize_text(F.col(text_col))))
    deduped = keyed.groupBy("_fp").applyInPandasWithState(
        _dedup_fn([f.name for f in keyed_schema.fields]),
        outputStructType=keyed_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    (
        deduped.drop("_fp")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
