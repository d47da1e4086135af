"""Sharded JSONL export sink for training-data delivery.

Training frameworks consume corpora as directories of size-bounded
``.jsonl(.gz)`` shards (WebDataset/Megatron/llm-foundry loaders all shard
this way): predictable shard sizes drive loader parallelism and shuffle
buffers. This sink is Spark's native JSON writer plus:

- **row-bounded shards** via ``maxRecordsPerFile`` (the writer rolls files
  while streaming — no repartition pass needed);
- **byte-targeted shards**: estimate bytes/row from a driver-side sample of
  ``to_json`` lengths, convert the byte target to a row cap, then let the
  same rolling writer enforce it (documented estimate, not a hard limit —
  exact byte packing would force a serial pass);
- a **manifest.json** next to the shards (file name, bytes, total rows from
  an ``Observation`` riding the write job — no post-write re-scan).

Scale: the write is one job, shards roll per task; with K output tasks and
R-row caps the layout is deterministic given partitioning. Compression
(gzip/zstd) is the writer codec option — decompression transparency on
read-back matches the file source's behavior.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

__all__ = ["estimate_bytes_per_row", "write_jsonl_shards"]


def estimate_bytes_per_row(df: DataFrame, sample_rows: int = 256) -> float:
    """Mean serialized JSONL row size (bytes, incl. newline) from a bounded
    head sample — one tiny job, never a full scan."""
    sample = (
        df.select((F.length(F.to_json(F.struct(*df.columns))) + 1).alias("b"))
        .limit(sample_rows)
        .agg(F.avg("b").alias("avg_b"))
        .first()
    )
    avg = sample["avg_b"]
    return float(avg) if avg is not None else 0.0


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    max_rows_per_shard: int | None = None,
    target_shard_bytes: int | None = None,
    compression: str | None = None,
    write_manifest: bool = True,
) -> dict:
    """Write ``df`` as JSONL shards under ``path``; returns the manifest dict
    ``{"files": [{"name", "bytes"}...], "n_rows", "rows_per_shard"}``.

    Exactly one of ``max_rows_per_shard`` / ``target_shard_bytes`` sizes the
    shards (both None = one file per task). Byte targets are converted to a
    row cap via ``estimate_bytes_per_row``.
    """
    if max_rows_per_shard is not None and target_shard_bytes is not None:
        raise ValueError("pass max_rows_per_shard OR target_shard_bytes, not both")
    rows_cap = max_rows_per_shard
    if target_shard_bytes is not None:
        bpr = estimate_bytes_per_row(df)
        rows_cap = max(1, int(target_shard_bytes / bpr)) if bpr > 0 else None

    obs = Observation("jsonl_export")
    observed = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    writer = observed.write.mode("overwrite")
    if rows_cap is not None:
        writer = writer.option("maxRecordsPerFile", str(rows_cap))
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
    n_rows = int(obs.get["n_rows"])

    files = []
    for name in sorted(os.listdir(path)):
        if name.startswith("part-"):
            files.append({"name": name, "bytes": os.path.getsize(os.path.join(path, name))})
    manifest = {"files": files, "n_rows": n_rows, "rows_per_shard": rows_cap}
    if write_manifest:
        with open(os.path.join(path, "manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=2)
    return manifest
