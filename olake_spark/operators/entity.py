"""Entity resolution: fuzzy blocking → connected components → survivorship.

The record-linkage staple a warehouse team builds the week after CDC lands
dirty copies of the same entity from N sources: find records that are the
same real-world thing (approximate match), group them transitively
(A~B, B~C ⇒ one entity), and emit one GOLDEN record per group with the
best value per attribute.

Composition of machinery this repo already proves at scale:

- matching reuses ``operators.fuzzy.fuzzy_join`` — the prefix-filtered
  q-gram index (Xiao et al. PPJoin lineage), lossless for the claimed edit
  distance, no cross join ever materializes;
- grouping reuses ``operators.dedup.connected_components`` — hybrid
  union-find (confirmed-match edges are corpus-orders-of-magnitude smaller
  than the records);
- survivorship here is one window + one aggregate per cluster, all
  codegen: most-complete-string wins (length desc, value asc tie-break),
  MAX for numerics (nulls lose), MIN for names — every rule deterministic
  so the golden record is reproducible run-to-run and engine-to-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from olake_spark.operators.dedup import connected_components
from olake_spark.operators.fuzzy import fuzzy_join

__all__ = ["match_pairs", "resolve_entities", "golden_records"]


def match_pairs(
    records: DataFrame, id_col: str, match_col: str, max_dist: int = 2, q: int = 3
) -> DataFrame:
    """Unordered (id_a, id_b, dist) record pairs with edit distance <=
    max_dist on ``match_col`` — self fuzzy-join through the q-gram prefix
    index, then de-mirrored to id_a < id_b."""
    left = records.select(F.col(id_col).alias("id_a"), F.col(match_col))
    right = records.select(F.col(id_col).alias("id_b"), F.col(match_col))
    return fuzzy_join(
        left, right, "id_a", match_col, "id_b", match_col, q=q, max_dist=max_dist
    ).filter(F.col("id_a") < F.col("id_b"))


def resolve_entities(
    records: DataFrame, id_col: str, match_col: str, max_dist: int = 2
) -> DataFrame:
    """records + a ``cluster_id`` column (min record id reachable through
    the match graph; unmatched records cluster alone)."""
    pairs = match_pairs(records, id_col, match_col, max_dist=max_dist)
    labels = connected_components(
        records.select(id_col), pairs, id_col=id_col
    )
    return records.join(labels, id_col)


def golden_records(
    resolved: DataFrame,
    id_col: str,
    longest_cols: list[str],
    min_cols: list[str],
    max_cols: list[str],
) -> DataFrame:
    """One golden row per cluster_id from survivorship rules:

    - ``longest_cols``: the most complete string wins (length desc, then
      value asc — deterministic under ties);
    - ``min_cols`` / ``max_cols``: plain MIN/MAX (SQL semantics: NULLs
      never win against a non-null value).

    Returns (cluster_id, n_records, *longest, *min, *max).
    """
    per_cluster = [F.count(F.lit(1)).alias("n_records")]
    per_cluster += [F.min(c).alias(c) for c in min_cols]
    per_cluster += [F.max(c).alias(c) for c in max_cols]
    agg = resolved.groupBy("cluster_id").agg(*per_cluster)

    out = agg
    for c in longest_cols:
        w = W.partitionBy("cluster_id").orderBy(
            F.length(F.col(c)).desc(), F.col(c).asc()
        )
        best = (
            resolved.select("cluster_id", c)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        out = out.join(best, "cluster_id")
    return out
