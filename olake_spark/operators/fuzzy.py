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

from olake_spark.materialize import materialize

__all__ = ["editdist1_join", "editdist2_join", "qgram_set", "fuzzy_join", "jaccard_join"]


def jaccard_join(
    df: DataFrame,
    id_col: str,
    set_col: str,
    threshold: float = 0.5,
    audit: bool = True,
) -> DataFrame:
    """Token-set similarity SELF-join (PPJoin, Xiao et al. WWW'08): all
    (id_a < id_b) pairs whose element sets have Jaccard ≥ ``threshold``,
    without the cross join — the record-linkage form of prefix filtering.

    Filters, all lossless for the claimed threshold:

    - **prefix**: under the global (df, token) rarity order, a record of
      size l indexes only its first ``l − ⌈t·l⌉ + 1`` tokens — two
      t-similar sets MUST share a prefix token;
    - **length**: ``t·max(la, lb) ≤ min(la, lb)``;
    - **positional**: a shared prefix token at positions (pa, pb) bounds
      the remaining overlap by ``1 + min(la−pa, lb−pb)``, which must
      reach the required overlap ``t/(1+t)·(la+lb)``.

    Float boundaries in the pruning bounds are relaxed by 1e-9 (pruning
    slightly less never loses a match); the final verification is the
    EXACT integer-scaled form ``o·(1+t) ≥ t·(la+lb)`` on the true
    intersection size, so the emitted pairs equal a brute-force scan.

    Plan shape at 100 TB: one agg for the token df table, one ranking
    window per record id (parallel), an equi-join on prefix tokens (the
    only pairwise shuffle, fan-in bounded by prefix length), distinct
    pairs, then exact ``array_intersect`` verification on candidates
    only. ``audit=True`` appends two constant columns — the filtered
    candidate-pair count and the uncapped share-any-token pair count —
    as 1-row broadcast joins, so the pruning ratio is measured in-band.

    Output: (id_a, id_b, overlap, jaccard[, n_candidates,
    n_uncapped_candidates))."""
    t = float(threshold)
    if not 0.0 < t <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            F.array_distinct(F.col(set_col)).alias("_tk"),
        )
        .withColumn("_l", F.size("_tk"))
        .filter(F.col("_l") > 0)
    )
    expl = base.select("_id", "_l", F.explode("_tk").alias("_t"))
    df_tbl = expl.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    wpos = W.partitionBy("_id").orderBy("_df", "_t")
    pos = expl.join(df_tbl, "_t").withColumn("_p", F.row_number().over(wpos))
    # prefix length l − ⌈t·l⌉ + 1; the −1e-9 keeps a float ⌈⌉ at an exact
    # integer boundary from rounding UP (which would shrink the prefix
    # and lose matches) — relaxing DOWN only indexes one extra token
    pref = pos.filter(
        F.col("_p")
        <= F.col("_l") - F.ceil(F.lit(t) * F.col("_l") - F.lit(1e-9)) + 1
    ).select("_id", "_l", "_t", "_p")
    a = pref.select(
        F.col("_id").alias("id_a"), F.col("_l").alias("_la"),
        "_t", F.col("_p").alias("_pa"),
    )
    b = pref.select(
        F.col("_id").alias("id_b"), F.col("_l").alias("_lb"),
        "_t", F.col("_p").alias("_pb"),
    )
    need = F.lit(t / (1.0 + t)) * (F.col("_la") + F.col("_lb")) - F.lit(1e-9)
    cand = (
        a.join(b, "_t")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.lit(t) * F.greatest("_la", "_lb") - F.lit(1e-9)
            <= F.least("_la", "_lb")
        )
        .filter(
            F.lit(1) + F.least(
                F.col("_la") - F.col("_pa"), F.col("_lb") - F.col("_pb")
            )
            >= need
        )
        .select("id_a", "id_b")
        .distinct()
    )
    ver = (
        cand.join(
            base.select(
                F.col("_id").alias("id_a"), F.col("_tk").alias("_ta"),
                F.col("_l").alias("_la"),
            ),
            "id_a",
        )
        .join(
            base.select(
                F.col("_id").alias("id_b"), F.col("_tk").alias("_tb"),
                F.col("_l").alias("_lb"),
            ),
            "id_b",
        )
        .withColumn("overlap", F.size(F.array_intersect("_ta", "_tb")))
        # exact verification: o·(1+t) ≥ t·(la+lb) ⟺ Jaccard ≥ t
        .filter(
            F.col("overlap") * F.lit(1.0 + t)
            >= F.lit(t) * (F.col("_la") + F.col("_lb"))
        )
    )
    out = ver.select(
        "id_a",
        "id_b",
        F.col("overlap").cast("int").alias("overlap"),
        F.round(
            F.col("overlap")
            / (F.col("_la") + F.col("_lb") - F.col("overlap")),
            6,
        ).alias("jaccard"),
    )
    if not audit:
        return out
    n_cand = cand.groupBy().agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    uncapped = (
        expl.select(F.col("_id").alias("_ua"), "_t")
        .join(expl.select(F.col("_id").alias("_ub"), "_t"), "_t")
        .filter(F.col("_ua") < F.col("_ub"))
        .select("_ua", "_ub")
        .distinct()
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_uncapped_candidates"))
    )
    return out.crossJoin(F.broadcast(n_cand)).crossJoin(F.broadcast(uncapped))


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
    # rg feeds the df aggregate AND the prefix selection; df_tbl feeds both
    # prefix joins — materialize each once instead of re-running the gram
    # explode up to 3x (guide §2.1; r11 audit: 8 scans in fuzzy_join_qgram)
    rg = rg.transform(materialize)
    # global rarity order = document frequency on the RIGHT (distinct
    # grams per string, so count(*) is df); unseen grams rank first on
    # the left — harmless (they cannot join) but keeps one total order
    df_tbl = rg.groupBy("_g").agg(F.count(F.lit(1)).alias("_df")).transform(materialize)
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


def editdist1_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Self-join on Levenshtein distance ≤ 1 via DELETION NEIGHBORHOODS
    (the FastSS family — Bocek et al., "Fast Similarity Search in Large
    Dictionaries", 2007): two strings are within edit distance 1 iff
    their variant sets {s} ∪ deletions(s) intersect —

        substitution: both delete the differing position,
        insert/delete: the shorter string IS a deletion of the longer,
        equality: excluded here (pairs are id_a < id_b on DISTINCT ids;
                  duplicate texts under different ids match at dist 0).

    Candidate volume is |rows|·(len+1) index entries and the join key is
    the variant string — skew-bounded by how many strings truly share a
    neighborhood, never a cross join, never per-pair trigram algebra
    (the complement to :func:`fuzzy_join`, which pays O(q·d) grams per
    string to reach LARGER distances; at d = 1 the deletion index is
    both smaller and exactly lossless). False positives (variant
    collision at true distance 2, e.g. "ab"/"ba") are killed by one
    ``levenshtein`` verification on the candidate pairs only.

    Returns (id_a, id_b, text_a, text_b, dist) with dist ∈ {0, 1}.
    """
    s = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    # variants: the string itself (tag len+1) plus every 1-deletion
    pos = F.explode(
        F.sequence(F.lit(0), F.length(F.col("_t")))
    ).alias("_i")
    var = s.select(
        "_id",
        "_t",
        pos,
    ).select(
        "_id",
        "_t",
        F.when(F.col("_i") == F.length(F.col("_t")), F.col("_t"))
        .otherwise(
            F.concat(
                F.expr("substring(_t, 1, _i)"),
                F.expr("substring(_t, _i + 2)"),
            )
        )
        .alias("_v"),
    ).distinct()
    a = var.select(
        F.col("_id").alias("id_a"), F.col("_t").alias("text_a"), "_v"
    )
    b = var.select(
        F.col("_id").alias("id_b"), F.col("_t").alias("text_b"), "_v"
    )
    cand = (
        a.join(b, "_v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "text_a", "text_b")
        .distinct()
    )
    dist = F.levenshtein(F.col("text_a"), F.col("text_b"))
    return cand.filter(dist <= 1).select(
        "id_a", "id_b", "text_a", "text_b", dist.alias("dist")
    )


# all distinct strings reachable by deleting at most TWO characters —
# D0 ∪ D1 ∪ D2 as one SQL higher-order-function expression (guarded so
# sequence() never sees a descending range on short strings)
_DEL2_SQL = """
array_distinct(concat(
  array(_t),
  CASE WHEN length(_t) >= 1 THEN
    transform(sequence(0, length(_t) - 1),
              i -> concat(substring(_t, 1, i), substring(_t, i + 2)))
  ELSE array() END,
  CASE WHEN length(_t) >= 2 THEN
    flatten(transform(sequence(0, length(_t) - 1), i ->
      transform(sequence(0, length(_t) - 2), j ->
        concat(
          substring(concat(substring(_t, 1, i), substring(_t, i + 2)), 1, j),
          substring(concat(substring(_t, 1, i), substring(_t, i + 2)), j + 2)
        ))))
  ELSE array() END
))
"""


def editdist2_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Self-join on Levenshtein distance ≤ 2 — :func:`editdist1_join`
    generalized to depth-2 deletion neighborhoods (FastSS, Bocek et al.
    2007): ed(a, b) ≤ k implies the k-deletion variant sets intersect
    (align the strings and delete the ≤k mismatching positions from
    each side), so the variant equi-join is a LOSSLESS candidate
    generator and one ``levenshtein`` evaluation on candidates only
    kills the false positives (variant collisions at true distance
    3-4). Index size is |rows|·(1 + L + C(L,2)) ≈ |rows|·L²/2 entries —
    quadratic in string LENGTH, never in row count; the join key is the
    variant string, skew-bounded by how many strings truly share a
    2-deletion neighborhood.

    Returns (id_a, id_b, text_a, text_b, dist) with dist ∈ {0, 1, 2},
    pairs on distinct ids (id_a < id_b).
    """
    s = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    var = s.select(
        "_id", "_t", F.explode(F.expr(_DEL2_SQL)).alias("_v")
    ).distinct()
    a = var.select(
        F.col("_id").alias("id_a"), F.col("_t").alias("text_a"), "_v"
    )
    b = var.select(
        F.col("_id").alias("id_b"), F.col("_t").alias("text_b"), "_v"
    )
    cand = (
        a.join(b, "_v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "text_a", "text_b")
        .distinct()
    )
    dist = F.levenshtein(F.col("text_a"), F.col("text_b"))
    return cand.filter(dist <= 2).select(
        "id_a", "id_b", "text_a", "text_b", dist.alias("dist")
    )
