"""Exact pairwise set-overlap (Jaccard) between group member sets.

The audience-overlap question ("how much do the signup and purchase
user bases intersect?") asked exactly, for every pair of groups at
once. The naive form — collect each group's member set and intersect —
is memory-quadratic; the distributed form rides one observation:
an intersection element IS a member row shared by two groups, so

    |A ∩ B| = count of (a, b) pairs produced by self-joining the
              distinct (group, member) relation ON THE MEMBER

and |A ∪ B| = |A| + |B| − |A ∩ B| needs only the per-group sizes.

Plan shape: one distinct shuffle on (group, member), a member-
co-partitioned self-join whose fan-out per member is C(g_m, 2) with
g_m = groups that member belongs to — bounded by the GROUP COUNT (an
enum-sized constant), never corpus-sized — then a map-side-combinable
pair count with the tiny size relation broadcast back. The Jaccard
double is a ratio of exact longs (one divide), hash-stable at round 6.

Related: sketch_kmv_overlap answers the same question approximately in
one pass when the group count is too large to pair exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["set_overlap_matrix"]


def set_overlap_matrix(
    df: DataFrame,
    group_col: str,
    member_col: str,
    min_inter: int = 1,
) -> DataFrame:
    """(group_a, group_b, n_a, n_b, n_inter, jaccard) for every
    unordered group pair intersecting in >= ``min_inter`` members."""
    gm = df.select(
        F.col(group_col).alias("_g"), F.col(member_col).alias("_m")
    ).distinct()
    sizes = gm.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
    a = gm.select(F.col("_g").alias("group_a"), "_m")
    b = gm.select(F.col("_g").alias("group_b"), "_m")
    inter = (
        a.join(b, "_m")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .filter(F.col("n_inter") >= min_inter)
    )
    sa = sizes.select(F.col("_g").alias("group_a"), F.col("_n").alias("n_a"))
    sb = sizes.select(F.col("_g").alias("group_b"), F.col("_n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "group_a")
        .join(F.broadcast(sb), "group_b")
        .select(
            "group_a",
            "group_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_inter").cast("long").alias("n_inter"),
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )
