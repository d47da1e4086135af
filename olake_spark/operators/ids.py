"""Distributed dense row ids — global ROW_NUMBER without a global sort.

``row_number() OVER (ORDER BY key)`` funnels every row through ONE
partition — the classic scale trap. The two-phase form here is how you
assign contiguous ids (vocab ids, compact entity ids, file-split
ordinals) to 100 TB:

1. ``repartitionByRange`` on the order columns — each partition owns a
   contiguous key range (Spark samples boundaries; sampling placement
   does not affect the RESULT, only balance) — then an eager
   ``localCheckpoint`` pins the partitioning, because phases 2 and 3
   must see the SAME physical partitions (a recomputed range exchange
   may re-sample different boundaries).
2. per-partition row counts → collect |partitions| tiny rows → prefix
   offsets on the driver.
3. ``row_number`` windowed WITHIN each partition (parallel — the window
   key is the partition id) + the partition's offset = the global dense
   id.

The order columns must form a TOTAL order (pass a tiebreaker);
otherwise ties would land nondeterministically across the partition
boundary. Ids are 1-based and dense: max(id) == count(*).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from olake_spark.materialize import materialize

__all__ = ["dense_ids"]


def dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    if not order_cols:
        raise ValueError("order_cols must be non-empty (and a total order)")
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        # eager: phases 2/3 must observe ONE boundary sampling
        .transform(lambda d: materialize(d, eager=True))
    )
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(counts)]),
            F.array(*[F.lit(offsets[p]) for p in sorted(counts)]),
        ),
        F.col("_pid"),
    )
    w = W.partitionBy("_pid").orderBy(*[F.col(c).asc() for c in order_cols])
    return ranged.withColumn(
        id_col, (F.row_number().over(w) + off_expr).cast("long")
    ).drop("_pid")
