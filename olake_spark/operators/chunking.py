"""Document chunking: overlapping token windows with provenance.

The retrieval/embedding preprocessing step: split every document into
fixed-size token windows (``window`` tokens, advancing ``stride`` tokens),
keeping (doc id, chunk index, 1-based start token, chunk length, text) so
chunks can be traced back to their source span.

Chunk-count rule (exact integer arithmetic, shared verbatim with the SQL
oracle): a doc with ``n`` tokens yields ``1`` chunk when ``n <= window``,
else ``(n - window + stride - 1) // stride + 1`` — i.e. start positions
``1, 1+stride, ...`` until the window reaches the end; the final chunk may
be shorter than ``window`` (token-array slicing clamps).

Scale shape: one ``explode`` of a per-row integer sequence — narrow,
zero-shuffle, embarrassingly parallel; output size is input tokens ×
``window/stride`` overlap factor, visible up front. Everything is built-in
array functions (sequence/slice/array_join) — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olake_spark.operators.text import tokens

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 128,
    stride: int = 96,
) -> DataFrame:
    """(id, chunk_id, start_token, n_tokens, chunk_text) per token window.

    ``chunk_id`` is 0-based and dense per document; ``start_token`` is the
    1-based token offset of the window. Empty documents yield one empty
    chunk (chunk_id 0) so every input row is represented downstream.
    """
    if window <= 0 or stride <= 0:
        raise ValueError(f"window and stride must be positive, got {window}/{stride}")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        ((n - window + stride - 1) / stride).cast("long") + 1
    )
    base = df.select(F.col(id_col), toks.alias("_toks"), n.alias("_n"), n_chunks.alias("_nc"))
    exploded = base.select(
        id_col,
        "_toks",
        F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
    )
    start = (F.col("chunk_id") * stride + 1).cast("int")
    piece = F.slice(F.col("_toks"), start, window)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("int"),
        start.alias("start_token"),
        F.size(piece).cast("int").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
