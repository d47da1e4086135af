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
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from olake_spark.materialize import materialize

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
    # the deduped (basket, item) relation feeds FOUR consumers (total,
    # support, both sides of the within-basket self-join); unmaterialized,
    # each re-runs the scan + distinct shuffle (r11 audit: 10 scans / 26
    # Exchanges in basket_pair_lift's plan). Hash-partition on the basket
    # key once so the self-join reuses the partitioning (guide §2.4), then
    # materialize lazily. NOTE: under AQE the lazy local checkpoint still
    # materializes its upstream shuffle stages when the plan is first
    # BUILT (the pagerank/curation_pipeline caveat) — construction is not
    # zero-jobs here; in the bench that work runs inside the timed rep.
    bi = bi.repartition(F.col("_basket")).transform(materialize)
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


def item_neighbors_topk(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 3,
    min_count: int = 2,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Top-k most-similar items per item by co-occurrence cosine — the
    classic item-item collaborative-filtering neighborhood ("customers
    who bought X also bought"), scored as

        cos(a, b) = c_ab / sqrt(c_a · c_b)

    over basket counts (c_a = baskets containing a, c_ab = baskets
    containing both). The pair relation reuses the within-basket
    self-join shape of :func:`pair_counts_with_lift` (co-partitioned on
    the basket, fan-out bounded by basket size, never catalog-scale);
    per-item supports broadcast back; the undirected pair set mirrors
    into both directions and a row_number ≤ k per item compiles to
    Spark's map-side WindowGroupLimit — no global sort.

    The cosine double is a ratio of exact longs finished by one IEEE
    sqrt + divide (identical in any engine), so ORDER BY (cos DESC,
    neighbor ASC) ranks identically cross-engine; the emitted ``cosine``
    is rounded to 6 for hash-stable output. ``min_count`` bounds the
    candidate set (support pruning — below it a neighbor is noise and
    the output would be |catalog|² at worst).

    Returns (item, neighbor, n_co, cosine, rnk) with rnk in 1..k.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    bi = df.select(
        F.col(basket_col).alias("_basket"), F.col(item_col).alias("_item")
    ).distinct()
    if max_basket_size is not None:
        sizes = bi.groupBy("_basket").agg(F.count(F.lit(1)).alias("_bsz"))
        bi = bi.join(
            sizes.filter(F.col("_bsz") <= max_basket_size).select("_basket"),
            "_basket",
        )
    # same materialize-once as pair_counts_with_lift: bi feeds support and
    # both self-join sides; pairs feeds both mirror directions of ``und``
    bi = bi.repartition(F.col("_basket")).transform(materialize)
    support = bi.groupBy("_item").agg(F.count(F.lit(1)).alias("_c"))
    a = bi.select("_basket", F.col("_item").alias("_ia"))
    b = bi.select("_basket", F.col("_item").alias("_ib"))
    pairs = (
        a.join(b, "_basket")
        .filter(F.col("_ia") < F.col("_ib"))
        .groupBy("_ia", "_ib")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= min_count)
        .transform(materialize)
    )
    und = pairs.select(
        F.col("_ia").alias("item"), F.col("_ib").alias("neighbor"), "n_co"
    ).unionByName(
        pairs.select(
            F.col("_ib").alias("item"), F.col("_ia").alias("neighbor"), "n_co"
        )
    )
    sup_i = support.select(F.col("_item").alias("item"), F.col("_c").alias("_ci"))
    sup_n = support.select(
        F.col("_item").alias("neighbor"), F.col("_c").alias("_cn")
    )
    # no broadcast hint: support is catalog-sized (one row per distinct
    # item) — at billion-item catalogs broadcasting it would blow the
    # driver, while the und relation is already pair-sized so a plain
    # shuffle hash join on the item key is cheap and 100×-safe. AQE
    # still auto-broadcasts when the catalog actually is small.
    scored = (
        und.join(sup_i, "item")
        .join(sup_n, "neighbor")
        .withColumn(
            "_cos",
            F.col("n_co").cast("double")
            / F.sqrt((F.col("_ci") * F.col("_cn")).cast("double")),
        )
    )
    w = W.partitionBy("item").orderBy(F.col("_cos").desc(), F.col("neighbor"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "item", "neighbor", "n_co",
            F.round(F.col("_cos"), 6).alias("cosine"), "rnk",
        )
    )
