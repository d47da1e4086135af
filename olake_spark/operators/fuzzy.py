"""Q-gram indexed fuzzy string join — edit-distance matching without the
cross join.

The classic approximate-string-join (Gravano et al., VLDB 2001): two
strings within Levenshtein distance d of each other share at least
max(len) - q + 1 - q·d q-grams, so an inverted index on q-grams plus a
shared-gram count threshold generates a CANDIDATE set that provably
contains every true match — then the exact distance verifies only the
candidates. At 100 TB the plan is: explode distinct grams (linear),
equi-join on the gram (hash shuffle on gram — the inverted index), count
shared grams per pair (map-side combinable), verify survivors with
``levenshtein`` (built-in, JVM-side). The cross join never exists.

Skew note: ultra-common grams create hot partitions; ``max_df`` drops
grams whose document frequency on the RIGHT exceeds the cap before the
join (the same df-cap the n-gram dedup family uses). Dropping a gram can
only shrink the candidate set, so pair it with a min_shared that still
guarantees the distance bound you verify at.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["qgram_set", "fuzzy_join"]


def qgram_set(col, q: int = 3):
    """Distinct lowercase q-grams; empty array below q chars (mirrors the
    oracle's CASE guard exactly — no descending-sequence surprises)."""
    s = F.lower(col)
    n = F.length(s)
    grams = F.transform(
        F.sequence(F.lit(1), n - (q - 1)), lambda i: s.substr(i, F.lit(q))
    )
    return F.when(n >= q, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    q: int = 3,
    min_shared: int = 2,
    max_dist: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """(left_id, right_id, n_shared, dist) pairs with
    shared-distinct-grams >= min_shared, |len diff| <= max_dist, and
    levenshtein(lower(l), lower(r)) <= max_dist."""
    lg = left.select(
        F.col(left_id),
        F.lower(F.col(left_col)).alias("_ls"),
        F.explode(qgram_set(F.col(left_col), q)).alias("_g"),
    )
    rg = right.select(
        F.col(right_id),
        F.lower(F.col(right_col)).alias("_rs"),
        F.explode(qgram_set(F.col(right_col), q)).alias("_g"),
    )
    if max_df is not None:
        hot = (
            rg.groupBy("_g")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("_g")
        )
        lg = lg.join(F.broadcast(hot), "_g", "left_anti")
        rg = rg.join(F.broadcast(hot), "_g", "left_anti")
    pairs = (
        lg.join(rg, "_g")
        .groupBy(left_id, right_id)
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.first("_ls").alias("_ls"),
            F.first("_rs").alias("_rs"),
        )
        .filter(F.col("n_shared") >= min_shared)
        .filter(
            F.abs(F.length("_ls") - F.length("_rs")) <= max_dist
        )
    )
    return (
        pairs.withColumn("dist", F.levenshtein("_ls", "_rs"))
        .filter(F.col("dist") <= max_dist)
        .select(left_id, right_id, "n_shared", "dist")
    )
