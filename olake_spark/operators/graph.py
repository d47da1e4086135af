"""Iterative graph algorithms as fixed-iteration DataFrame dataflows —
integer PageRank (connected components lives in operators/dedup.py).

PageRank here is the Pregel dataflow expressed as K unrolled join+agg
rounds, with ALL arithmetic in integer micro-units (rank mass of 10^12
split by floor division, damping as ·85//100): every intermediate is an
exact BIGINT, so the result is partition-order-free and bit-identical in
the DuckDB oracle (K unrolled CTEs). Dangling nodes (no out-edges)
intentionally leak their mass — the standard simplification; they still
RECEIVE rank. Nodes with no in-edges hold the base term.

Scale shape per round: edges ⋈ ranks on src (hash, reusable
partitioning), ⋈ outdeg on src (same key — AQE coalesces), groupBy dst
with a map-side-combinable integer sum, left join back to the node set.
K is a constant (plan grows linearly in K); for 100+ iterations you'd
checkpoint every ~10 rounds to cut lineage, which ``checkpoint_every``
exposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]

TOTAL_MASS = 10**12
DAMP_NUM = 85  # damping 0.85 as the exact rational 85/100


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """(node, pr) after ``iters`` exact-integer PageRank rounds.

    Construction is fully lazy (the node count enters via a 1-row
    broadcast, never an eager .count()).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ncnt = nodes.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    nodes = nodes.crossJoin(F.broadcast(ncnt)).select(
        "node",
        F.expr(f"{TOTAL_MASS} div _n").alias("_r0"),
        F.expr(f"(15 * ({TOTAL_MASS} div _n)) div 100").alias("_base"),
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    ranks = nodes.select("node", F.col("_r0").alias("pr"))
    for it in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"), F.expr("pr div _d").alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_cs"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.col("_base")
                + F.expr(f"({DAMP_NUM} * coalesce(_cs, 0L)) div 100")
            ).alias("pr"),
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
