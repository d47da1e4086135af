"""Incremental rollup maintenance — mergeable per-key aggregate STATE
(count / sum / min / max / HLL registers) so a materialized rollup
refreshes from a delta batch without re-touching historical raw rows.

The 100 TB shape: raw events land in partitions; each new partition
builds its own tiny state table (one row per key), and the materialized
rollup is refreshed by MERGING states — an associative, commutative
combine over rows-per-key, never a rescan of history. This is exactly
the partial-aggregate contract Spark uses internally for map-side
combine, lifted to a persistable artifact (Druid/DataSketches-style
ingestion rollup).

Why every field is mergeable AND oracle-exact:
  n           count            → +            (exact BIGINT)
  sum_micros  sum of round(v·10^6) → +        (exact BIGINT — summing
              raw doubles would be partition-order-dependent)
  min/max_micros                → least/greatest (exact BIGINT)
  hll_regs    32 HLL registers (array<int>)   → element-wise max
The distinct-count estimate is FINALIZED from the merged registers with
the same scaled-integer harmonic sum as operators/sketches.py — one
double division, rounded late.

merge(state(A), state(B)) ≡ state(A ∪ B) holds exactly (all combines
are associative/commutative on exact integers); the gate query builds
two partial states from a disjoint split and checks the merged+finalized
result against the oracle's FULL recompute — the associativity proof is
the correctness gate itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olake_spark.operators.joins import ns_eq_join
from olake_spark.operators.sketches import HLL_M, HLL_ALPHA, RHO_SCALE, _h60

__all__ = ["agg_state", "agg_state_merge", "agg_finalize"]

MICROS = 1_000_000


def agg_state(
    df: DataFrame, keys: list[str], value_col: str, distinct_col: str
) -> DataFrame:
    """One state row per key: (keys..., n, sum_micros, min_micros,
    max_micros, hll_regs). One shuffle on the keys (the register
    sub-aggregate shares it); everything map-side combinable."""
    v = F.round(F.col(value_col) * MICROS).cast("long")
    basic = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("sum_micros"),
        F.min(v).alias("min_micros"),
        F.max(v).alias("max_micros"),
    )
    h = df.select(*keys, _h60(F.col(distinct_col)).alias("_h"))
    rest = F.expr(f"_h div {HLL_M}")
    rho = F.when(F.col("_rest") == 0, F.lit(RHO_SCALE)).otherwise(
        F.lit(RHO_SCALE) - F.length(F.bin(F.col("_rest")))
    )
    regs = (
        h.select(*keys, F.pmod(F.col("_h"), F.lit(HLL_M)).alias("_b"),
                 rest.alias("_rest"))
        .select(*keys, "_b", rho.alias("_rho"))
        .groupBy(*keys, "_b")
        .agg(F.max("_rho").alias("_m"))
    )
    grid = (
        regs.select(*keys)
        .distinct()
        .select(*keys, F.explode(F.sequence(F.lit(0), F.lit(HLL_M - 1))).alias("_b"))
    )
    # null-safe joins throughout: a NULL group key is a real group and
    # must survive into (and merge within) the persisted rollup state
    dense = ns_eq_join(grid, regs, list(keys), ["_b"], "left").select(
        *keys, "_b", F.coalesce(F.col("_m"), F.lit(0)).alias("_m")
    )
    packed = dense.groupBy(*keys).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("_b", "_m"))),
            lambda x: x["_m"],
        ).alias("hll_regs")
    )
    return ns_eq_join(basic, packed, list(keys))


def agg_state_merge(states: DataFrame, keys: list[str]) -> DataFrame:
    """Combine ANY number of partial state frames (pre-unioned by the
    caller via unionByName) back into one state row per key. Register
    merge is element-wise max via posexplode → max → rebuild — stays
    relational, so a thousand partial states merge in one shuffle."""
    basic = states.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_micros").alias("sum_micros"),
        F.min("min_micros").alias("min_micros"),
        F.max("max_micros").alias("max_micros"),
    )
    regs = (
        states.select(*keys, F.posexplode("hll_regs").alias("_b", "_m"))
        .groupBy(*keys, "_b")
        .agg(F.max("_m").alias("_m"))
        .groupBy(*keys)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_b", "_m"))),
                lambda x: x["_m"],
            ).alias("hll_regs")
        )
    )
    return ns_eq_join(basic, regs, list(keys))


def agg_finalize(state: DataFrame, keys: list[str]) -> DataFrame:
    """Human-facing rollup from state: exact n/sum/min/max plus the HLL
    distinct estimate — pure codegen over the register array (aggregate/
    transform higher-order functions; no explode, no Python)."""
    harmonic = F.expr(
        f"aggregate(transform(hll_regs, m -> shiftleft(1L, {RHO_SCALE} - m)),"
        " 0L, (a, x) -> a + x)"
    )
    n_zero = F.expr("size(filter(hll_regs, m -> m = 0))")
    numerator = HLL_ALPHA * HLL_M * HLL_M * float(2**RHO_SCALE)
    return state.select(
        *keys,
        "n",
        "sum_micros",
        "min_micros",
        "max_micros",
        harmonic.alias("harmonic_scaled"),
        n_zero.alias("n_zero_regs"),
        F.round(
            F.lit(numerator) / harmonic.cast("double"), 4
        ).alias("est_distinct"),
    )
