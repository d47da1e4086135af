"""ML feature engineering: leakage-safe target encoding and per-key lag
feature matrices.

Both operators keep the repo's exactness discipline — targets and values
move as round(v * 10^6) BIGINT micro-units, encodings are exact integer
floor divisions — so results are partition-order-free and hash-identical
to the SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["target_encode_loo", "lag_features", "rfm_segments"]

_MICROS = 1_000_000


def target_encode_loo(
    df: DataFrame,
    category_col: str,
    target_col: str,
) -> DataFrame:
    """Leave-one-out target encoding: each row's encoding is the mean
    target of its category EXCLUDING the row itself — the standard
    leakage guard (a plain category mean lets every row see its own
    label; LOO is what production feature stores ship for train-time
    encodings). Singleton categories (no peers to average) fall back to
    the global leave-one-out mean.

    Exact arithmetic: te_micro = (sum_micro - own_micro) div (cnt - 1)
    over BIGINT micro-units — iterated floor division, deterministic in
    any engine.

    Scale shape: the per-category (sum, cnt) relation is categorical-
    tiny and BROADCASTS onto the fact rows; the global (sum, cnt) is a
    1-row broadcast. The fact table never shuffles and never meets a
    window — the plan is scan -> two broadcast joins -> project, which
    survives any fact-table size (a partitionBy(category) window would
    shuffle everything and serialize on hot categories).

    NULL handling: rows with a NULL target are excluded from BOTH the
    leave-one-out sums and the peer counts (the encoding is the mean of
    the non-null peers; a count(*) denominator would silently dilute
    it), and their own te_micro is NULL. Rows with a NULL category drop
    out of the output entirely (equi-join semantics in every engine) —
    impute a sentinel category upstream if they matter.
    """
    own = F.round(F.col(target_col) * _MICROS).cast("long")
    facts = df.withColumn("_own", own)
    cat = facts.groupBy(category_col).agg(
        F.sum("_own").alias("_csum"), F.count("_own").alias("_ccnt")
    )
    glob = facts.groupBy().agg(
        F.sum("_own").alias("_gsum"), F.count("_own").alias("_gcnt")
    )
    num = F.when(
        F.col("_ccnt") > 1, F.col("_csum") - F.col("_own")
    ).otherwise(F.col("_gsum") - F.col("_own"))
    den = F.when(F.col("_ccnt") > 1, F.col("_ccnt") - 1).otherwise(
        F.col("_gcnt") - 1
    )
    # exact BIGINT floor division (num >= 0 by construction for
    # non-negative targets; negative targets floor toward -inf in both
    # engines via the subtract-pmod identity). den == 0 (the table's only
    # non-null target asking for a leave-one-out mean of nobody) yields
    # NULL, never an ANSI division error.
    te = F.when(
        den > 0,
        (
            (num - F.pmod(num, den)).cast("decimal(38,0)")
            / den.cast("decimal(38,0)")
        ).cast("long"),
    )
    return (
        facts.join(F.broadcast(cat), category_col)
        .join(F.broadcast(glob))
        .withColumn("te_micro", te)
        .drop("_own", "_csum", "_ccnt", "_gsum", "_gcnt")
    )


def lag_features(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key lag/rolling feature matrix — the classic time-series
    training-row builder: for every event, the previous two values, the
    rolling sum/count of the preceding three, and the gap to the
    previous event. All exact BIGINT micro-units; NULL where history is
    short (the model pipeline imputes downstream, the feature builder
    must not invent values).

    One hash shuffle on the keys; every feature is a window over the
    SAME (keys, order) spec, so Catalyst plans a single exchange + one
    sort feeding all the window functions. Per-key cost is linear in
    the key's own rows — skew bounded by the hottest key.

    ``time_col`` must be non-null (engines disagree on NULL placement
    in ORDER BY, so a NULL timestamp would reorder the lag sequence
    cross-engine); NULL values are fine — they ride the windows as
    NULLs and the rolling count simply skips them (F.sum ignores NULL,
    roll3_n counts ROWS in the frame, both mirrored by the oracle).
    """
    order_cols = list(order_cols or [])
    us = F.unix_micros(F.col(time_col))
    vm = F.round(F.col(value_col) * _MICROS).cast("long")
    w = W.partitionBy(*keys).orderBy(
        F.col("_us"), *[F.col(c) for c in order_cols]
    )
    roll = w.rowsBetween(-3, -1)
    return (
        df.withColumn("_us", us)
        .withColumn("v_micro", vm)
        .select(
            *keys,
            *order_cols,
            F.col("_us").alias("ts_us"),
            "v_micro",
            F.lag("v_micro", 1).over(w).alias("lag1_micro"),
            F.lag("v_micro", 2).over(w).alias("lag2_micro"),
            F.sum("v_micro").over(roll).alias("roll3_sum_micro"),
            F.count(F.lit(1)).over(roll).cast("long").alias("roll3_n"),
            (F.col("_us") - F.lag("_us", 1).over(w)).alias("dt_us"),
        )
    )
