"""Multi-touch marketing attribution — first / last / linear credit.

The conversion-analytics staple (every growth dashboard): for each
conversion event, split credit across the touch events that preceded it
in the same user's history. Three standard models in one pass:

- first-touch: the earliest prior touch's channel gets the conversion;
- last-touch: the latest prior touch's channel gets it;
- linear: each prior touch's channel gets ``1/n`` of it.

Linear credit is accumulated in EXACT floor-micro units
(``cnt_channel·10^6 div n_touches`` per conversion, summed as BIGINT) —
a float ratio sum would be partition-order-dependent; the floor-micro
contract is deterministic in any engine and documented (per conversion
up to ``|channels|−1`` micro-units round away).

Plan shape: ONE hash shuffle on the user; all per-conversion lookbacks
are cumulative window functions over the user's own ordered events
(first_value/last ignorenulls + one running count per channel — the
channel list is explicit and small, so the per-channel indicator sums
stay a fixed handful of window aggregates); credits then aggregate
map-side per channel. No self-join, no per-conversion fan-out beyond
the fixed |channels| explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["multi_touch_attribution"]

MICROS = 1_000_000


def multi_touch_attribution(
    events: DataFrame,
    user_col: str,
    time_col: str,
    channel_col: str,
    channels: list[str],
    conversion: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-channel (channel, first_touch, last_touch, linear_micro).

    ``channels`` is the explicit touch vocabulary (events with other
    values are ignored); ``conversion`` is the converting event value;
    ``tiebreak_col`` makes the per-user order total. Conversions with no
    prior touch convert unattributed (excluded from all three models).
    """
    ch = F.col(channel_col)
    is_touch = ch.isin(channels)
    order = [F.col(time_col).asc(), F.col(tiebreak_col).asc()]
    prior = (
        W.partitionBy(user_col).orderBy(*order).rowsBetween(
            W.unboundedPreceding, -1
        )
    )
    touch_ch = F.when(is_touch, ch)
    per_channel_cnt = [
        F.sum(F.when(ch == c, 1).otherwise(0)).over(prior).alias(f"_n_{i}")
        for i, c in enumerate(channels)
    ]
    conv = (
        events.select(
            F.col(user_col),
            F.col(time_col),
            F.col(tiebreak_col),
            ch.alias("_ch"),
            F.first(touch_ch, ignorenulls=True).over(prior).alias("_first"),
            F.last(touch_ch, ignorenulls=True).over(prior).alias("_last"),
            F.sum(F.when(is_touch, 1).otherwise(0)).over(prior).alias("_nt"),
            *per_channel_cnt,
        )
        .filter((F.col("_ch") == conversion) & (F.col("_nt") > 0))
    )
    credits = conv.select(
        "_first",
        "_last",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("channel"),
                        F.expr(f"(_n_{i} * {MICROS}) div _nt").alias("lin"),
                    )
                    for i, c in enumerate(channels)
                ]
            )
        ).alias("_cr"),
    )
    lin = (
        credits.select(
            F.col("_cr.channel").alias("channel"), F.col("_cr.lin").alias("lin")
        )
        .groupBy("channel")
        .agg(F.sum("lin").alias("linear_micro"))
    )
    ft = conv.groupBy(F.col("_first").alias("channel")).agg(
        F.count(F.lit(1)).alias("first_touch")
    )
    lt = conv.groupBy(F.col("_last").alias("channel")).agg(
        F.count(F.lit(1)).alias("last_touch")
    )
    base = lin.join(ft, "channel", "left").join(lt, "channel", "left")
    return base.select(
        "channel",
        F.coalesce("first_touch", F.lit(0)).alias("first_touch"),
        F.coalesce("last_touch", F.lit(0)).alias("last_touch"),
        "linear_micro",
    )
