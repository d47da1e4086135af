"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023) over hashed n-gram features.

The training-data curation question: given a huge RAW pool and a small
TARGET corpus that exemplifies the distribution you want, score every raw
document by how target-like it is and resample proportionally. DSIR's
estimator is a pair of bag-of-hashed-ngrams unigram models:

    log w(doc) = sum_b  count_b(doc) * [ ln p_target(b) - ln p_raw(b) ]

with add-1 smoothed bucket probabilities p(b) = (cnt_b + 1) / (total + m).

Scale shape (what survives 100 TB):

- features are HASHED into m buckets (default 1024), so both corpus models
  are m-row tables built by one map-side-combinable groupBy each — corpus
  size never enters the model's footprint;
- the per-bucket log-ratio table is tiny and broadcast; scoring is a
  broadcast join against each doc's bucket counts — raw data shuffles once
  (the per-doc feature groupBy) and never again;
- the per-doc sum is EXACT INTEGER arithmetic: log-ratios are fixed to
  micro-units (round(1e6 * ln(...)) as BIGINT) before the sum, so the
  score is partition-order-free and oracle-reproducible (the repo's
  micro-unit pattern; the single ln() per bucket takes one correctly-
  rounded double division of exact integer products as its argument, so
  both engines feed libm the same bits).

Features are word unigrams + adjacent bigrams of the repo-standard
normalization (trim/lower/whitespace-collapse), built array-natively
(zip_with on the token array — no positional self-join, no extra shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hashed_feature_counts", "dsir_log_weights", "DSIR_BUCKETS"]

DSIR_BUCKETS = 1024
_MICROS = 1_000_000


def _h60(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _features(text_col: str) -> F.Column:
    """Unigram + adjacent-bigram feature strings of normalized text."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    toks = F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )
    unis = F.transform(toks, lambda t: F.concat(F.lit("u|"), t))
    # zip_with pads the shorter side with NULL -> the trailing (last, NULL)
    # pair maps to NULL and is filtered: exactly the n-1 adjacent bigrams
    bis = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.when(
                b.isNotNull(), F.concat(F.lit("b|"), a, F.lit(" "), b)
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return F.concat(unis, bis)


def hashed_feature_counts(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """Per-doc hashed feature-bucket counts: (id, bucket, cnt)."""
    feats = df.select(
        F.col(id_col), F.explode(_features(text_col)).alias("_f")
    )
    return (
        feats.select(
            id_col, F.pmod(_h60(F.col("_f")), F.lit(n_buckets)).alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Importance score per raw document against the target distribution.

    Returns (id, n_features, score_micros, log_weight): ``score_micros``
    is the exact-integer micro-unit sum (the gate-compared state),
    ``log_weight`` its double form rounded to 6 — higher = more
    target-like. Docs with no features score 0 (weight 1 under exp).
    """
    raw_b = hashed_feature_counts(raw, id_col, text_col, n_buckets)
    tgt_b = hashed_feature_counts(target, id_col, text_col, n_buckets)

    raw_tot = raw_b.groupBy("bucket").agg(F.sum("cnt").alias("r_cnt"))
    tgt_tot = tgt_b.groupBy("bucket").agg(F.sum("cnt").alias("t_cnt"))

    # model sizes as 1-row frames -> literal-free, fully lazy
    totals = raw_tot.agg(F.sum("r_cnt").alias("R")).crossJoin(
        tgt_tot.agg(F.coalesce(F.sum("t_cnt"), F.lit(0)).alias("T"))
    )
    # log-ratio per bucket, fixed to micro-units as BIGINT:
    #   ln( (t+1)(R+m) / ((r+1)(T+m)) ) — numerator/denominator are exact
    # integer products; ONE double division feeds ln identical bits in any
    # IEEE engine. Buckets absent from the raw pool can't be probed by a
    # raw doc, so the ratio table only needs raw buckets (left join target).
    ratio = (
        raw_tot.join(tgt_tot, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("t_cnt"), F.lit(0)) + 1)
                        * (F.col("R") + n_buckets)
                    ).cast("double")
                    / ((F.col("r_cnt") + 1) * (F.col("T") + n_buckets)).cast(
                        "double"
                    )
                )
                * _MICROS,
                0,
            )
            .cast("long")
            .alias("lr_micros"),
        )
    )
    scored = (
        raw_b.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_features"),
            F.sum(F.col("cnt") * F.col("lr_micros")).alias("score_micros"),
        )
    )
    ids = raw.select(id_col).distinct()
    return (
        ids.join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_features"), F.lit(0)).alias("n_features"),
            F.coalesce(F.col("score_micros"), F.lit(0)).alias("score_micros"),
        )
        .withColumn(
            "log_weight",
            F.round(F.col("score_micros") / F.lit(float(_MICROS)), 6),
        )
    )
