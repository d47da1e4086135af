"""Q-gram fuzzy string join with prefix filtering — edit-distance matching
without the cross join, at index volume O(q·d) per string.

Candidate generation (Gravano et al. VLDB'01 + the prefix-filtering
principle of Chaudhuri et al. ICDE'06 / Xiao et al. PPJoin): two strings
within Levenshtein distance d share all but at most q·d of their q-grams,
so under ANY global total order on grams, their first q·d+1 grams (the
"prefix") must intersect — it suffices to index only each string's q·d+1
RAREST grams (rarity = document frequency on the right side; ties on the
gram). Hot grams almost never reach a prefix, so the inverted-index join
stays skew-free without any df-cap, and every true match is still
guaranteed to surface (the filter is lossless for the claimed distance).

Plan shape at 100 TB: one agg for the gram df table, one window per side
to rank grams (partitioned by the string id — parallel), an equi-join on
the prefix grams (the only pairwise shuffle, with per-string fan-in
bounded by q·d+1), distinct pairs, then ``levenshtein`` verification on
candidates only. The cross join never exists; candidate volume scales
with how many strings genuinely share RARE grams, not with vocabulary
popularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
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
    max_dist: int = 2,
) -> DataFrame:
    """(left_id, right_id, dist) pairs with |len diff| <= max_dist and
    levenshtein(lower(l), lower(r)) <= max_dist, found through a
    prefix-filtered q-gram index (lossless for the claimed distance).

    Strings shorter than q chars produce no grams and therefore no
    candidates — pre-filter or pad if sub-q probes must match."""
    pref = q * max_dist + 1
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
    # global rarity order = document frequency on the RIGHT (distinct
    # grams per string, so count(*) is df); unseen grams rank first on
    # the left — harmless (they cannot join) but keeps one total order
    df_tbl = rg.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    lw = W.partitionBy(left_id).orderBy("_df", "_g")
    rw = W.partitionBy(right_id).orderBy("_df", "_g")
    lpref = (
        lg.join(df_tbl, "_g", "left")
        .withColumn("_df", F.coalesce("_df", F.lit(0)))
        .withColumn("_rn", F.row_number().over(lw))
        .filter(F.col("_rn") <= pref)
        .select(left_id, "_ls", "_g")
    )
    rpref = (
        rg.join(df_tbl, "_g")
        .withColumn("_rn", F.row_number().over(rw))
        .filter(F.col("_rn") <= pref)
        .select(right_id, "_rs", "_g")
    )
    cand = (
        lpref.join(rpref, "_g")
        .select(left_id, right_id, "_ls", "_rs")
        .distinct()
        .filter(F.abs(F.length("_ls") - F.length("_rs")) <= max_dist)
    )
    return (
        cand.withColumn("dist", F.levenshtein("_ls", "_rs"))
        .filter(F.col("dist") <= max_dist)
        .select(left_id, right_id, "dist")
    )
