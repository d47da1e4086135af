"""Mergeable distinct-count sketches — KMV (k-minimum-values) and
HyperLogLog — with bit-exact, oracle-reproducible state.

OLAP engines ship these as approximate COUNT(DISTINCT) accelerators
(Apache DataSketches, Druid, BigQuery HLL++). At 100 TB the point is the
MERGE property: per-partition sketch state is tiny and combines
associatively, so a distinct-count over any group-by rolls up without
re-touching raw rows. Both sketches here derive every register from the
same deterministic 60-bit md5 prefix hash used by the dedup family, so
the sketch STATE (not just the estimate) is identical in Spark and the
DuckDB oracle — the gate checks the registers bit-for-bit and the
estimate as one exact-integer division rounded late.

KMV (Bar-Yossef et al. 2002): keep the k smallest distinct hash values;
with U = k-th minimum / 2^60, estimate = (k-1)/U. Union of sketches =
k smallest of the concatenation — trivially mergeable.

HLL (Flajolet et al. 2007): bucket = hash mod m, rho = leading-zero rank
of the remaining 55 bits; register = max(rho). The harmonic-mean sum is
kept INTEGRAL by scaling: S = Σ_j 2^(RHO_SCALE - M_j) (every term an
exact power of two ≤ 2^RHO_SCALE, m terms — fits a BIGINT), estimate =
alpha·m²·2^RHO_SCALE / S computed as ONE double division of two exact
integers, identical across engines. Raw estimate only (no small-range
linear-counting branch — ln() is libm-dependent and would break the
cross-engine bit-match); the zero-register count V is surfaced so a
consumer can apply its own correction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "kmv_sketch",
    "kmv_union_estimate",
    "kmv_overlap",
    "hll_sketch",
    "cms_sketch",
    "cms_merge",
    "cms_point_estimate",
]

HASH_BITS = 60
HLL_M = 32  # registers (2^5); alpha_32 = 0.697 per the HLL paper
HLL_ALPHA = 0.697
RHO_SCALE = 56  # max rho = 55-bit value all zeros -> rho 56


def _h60(col) -> F.Column:
    """The repo-wide stable 60-bit hash (md5 hex prefix)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_sketch(
    df: DataFrame, value_col: str, keys: list[str], k: int = 64
) -> DataFrame:
    """Per-group KMV distinct estimate.

    One shuffle on (keys, hash) for the distinct, one on keys for the
    top-k window — the window input is already distinct hashes, so skew
    is bounded by per-group cardinality, and at scale the k-smallest
    selection combines map-side via the row_number + filter plan AQE
    compiles to. Returns (keys..., n_kept, kth_hash, est_distinct)."""
    hashed = df.select(*keys, _h60(F.col(value_col)).alias("_h")).distinct()
    w = W.partitionBy(*keys).orderBy("_h")
    kept = hashed.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    est = (
        F.lit(float(k - 1))
        * F.lit(float(2**HASH_BITS))
        / F.col("kth_hash").cast("double")
    )
    return (
        kept.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("_h").alias("kth_hash"))
        .select(
            *keys,
            "n_kept",
            "kth_hash",
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(F.round(est, 4))
            .alias("est_distinct"),
        )
    )


def kmv_union_estimate(
    df: DataFrame, value_col: str, keys: list[str], k: int = 64
) -> DataFrame:
    """Distinct estimate of the UNION of all groups, computed by merging
    the per-group sketches (k smallest of the concatenated hash sets) —
    never re-touching the raw rows. Returns one row."""
    hashed = df.select(*keys, _h60(F.col(value_col)).alias("_h")).distinct()
    w = W.partitionBy(*keys).orderBy("_h")
    kept = hashed.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    merged = (
        kept.select("_h")
        .distinct()
        .withColumn("_rn", F.row_number().over(W.orderBy("_h")))
        .filter(F.col("_rn") <= k)
    )
    est = (
        F.lit(float(k - 1))
        * F.lit(float(2**HASH_BITS))
        / F.col("kth_hash").cast("double")
    )
    return (
        merged.groupBy()
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("_h").alias("kth_hash"))
        .select(
            "n_kept",
            "kth_hash",
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(F.round(est, 4))
            .alias("est_union_distinct"),
        )
    )


def hll_sketch(df: DataFrame, value_col: str, keys: list[str]) -> DataFrame:
    """Per-group HLL-32: exact-integer registers and scaled harmonic sum.

    Register state is a per-(key, bucket) MAX — fully map-side
    combinable, the canonical 100 TB distinct-count shape (per-partition
    32-register state, merged by max). Empty buckets enter the harmonic
    sum as rho=0 via a per-key dense grid (32 rows per key, from a
    literal sequence — no extra shuffle beyond the register groupBy).

    Returns (keys..., harmonic_scaled, n_zero_regs, est_distinct)."""
    h = df.select(*keys, _h60(F.col(value_col)).alias("_h"))
    bucket = F.pmod(F.col("_h"), F.lit(HLL_M))
    rest = F.expr(f"_h div {HLL_M}")  # 55-bit remainder (integer division)
    rho = F.when(F.col("_rest") == 0, F.lit(RHO_SCALE)).otherwise(
        F.lit(RHO_SCALE) - F.length(F.bin(F.col("_rest")))
    )
    regs = (
        h.select(*keys, bucket.alias("_b"), rest.alias("_rest"))
        .select(*keys, "_b", rho.alias("_rho"))
        .groupBy(*keys, "_b")
        .agg(F.max("_rho").alias("_m"))
    )
    grid = (
        regs.select(*keys)
        .distinct()
        .select(*keys, F.explode(F.sequence(F.lit(0), F.lit(HLL_M - 1))).alias("_b"))
    )
    # null-safe grid join: a NULL group key would otherwise match nothing
    # and report a fixed bogus all-zero-register estimate
    from olake_spark.operators.joins import ns_eq_join

    dense = ns_eq_join(grid, regs, list(keys), ["_b"], "left").select(
        *keys, "_b", F.coalesce(F.col("_m"), F.lit(0)).alias("_m")
    )
    numerator = HLL_ALPHA * HLL_M * HLL_M * float(2**RHO_SCALE)
    per_key = dense.groupBy(*keys).agg(
        F.sum(F.expr(f"shiftleft(1L, {RHO_SCALE} - _m)")).alias(
            "harmonic_scaled"
        ),
        F.sum(F.when(F.col("_m") == 0, 1).otherwise(0)).alias("n_zero_regs"),
    )
    return per_key.select(
        *keys,
        "harmonic_scaled",
        "n_zero_regs",
        F.round(
            F.lit(numerator) / F.col("harmonic_scaled").cast("double"), 4
        ).alias("est_distinct"),
    )


def kmv_overlap(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    k: int = 64,
) -> DataFrame:
    """Jaccard / intersection / union estimates between two groups' value
    sets from their MERGED KMV sketches (Beyer et al., SIGMOD 2007):
    within the k smallest hashes of A∪B, the fraction rho that occur in
    BOTH per-group sketches estimates the Jaccard similarity, and
    |A∩B| ≈ rho · |A∪B|-estimate. Everything up to the two final
    divisions is exact integers — the gate checks the merged sketch
    state itself. One row: (n_merged, kth_union_hash, n_both, est_union,
    est_jaccard, est_intersection)."""
    hashed = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .select(F.col(group_col).alias("_grp"), _h60(F.col(value_col)).alias("_h"))
        .distinct()
    )
    w = W.partitionBy("_grp").orderBy("_h")
    kept = hashed.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    both = (
        kept.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_n_grp"))
        .withColumn("_in_both", F.col("_n_grp") == 2)
    )
    merged = both.withColumn("_rn", F.row_number().over(W.orderBy("_h"))).filter(
        F.col("_rn") <= k
    )
    est_union = F.when(
        F.col("n_merged") < k, F.col("n_merged").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        * F.lit(float(2**HASH_BITS))
        / F.col("kth_union_hash").cast("double")
    )
    agg = merged.groupBy().agg(
        F.count(F.lit(1)).alias("n_merged"),
        F.max("_h").alias("kth_union_hash"),
        F.sum(F.when(F.col("_in_both"), 1).otherwise(0)).alias("n_both"),
    )
    return agg.select(
        "n_merged",
        "kth_union_hash",
        "n_both",
        F.round(est_union, 4).alias("est_union"),
        F.round(
            F.col("n_both").cast("double") / F.col("n_merged").cast("double"), 6
        ).alias("est_jaccard"),
        F.round(
            (F.col("n_both").cast("double") / F.col("n_merged").cast("double"))
            * est_union,
            4,
        ).alias("est_intersection"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): mergeable frequency state
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_cell(value: F.Column, row: F.Column) -> F.Column:
    """Row-seeded column index: the repo-wide 60-bit md5 hash of
    ``row || '|' || value``, mod width — reproducible in ANSI SQL."""
    return F.pmod(
        _h60(F.concat(row.cast("string"), F.lit("|"), value.cast("string"))),
        F.lit(CMS_WIDTH),
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Per-group count-min sketch STATE: sparse (row, cell) -> count.

    The state is exact integers and merges by plain addition (union of two
    sketches = groupBy sum of their cells), so per-partition partial
    sketches combine associatively — the frequency twin of the KMV/HLL
    distinct sketches above. Build order is chosen for scale: counts are
    first collapsed per DISTINCT value (one map-side-combinable shuffle on
    the raw key; distinct values <= rows), and only then fanned out x depth
    into cells — the depth explosion touches the collapsed frame, never
    the raw rows. Returns (keys..., r, c, cnt) with zero cells omitted
    (a sparse sketch: absent cell == 0).
    """
    keys = list(keys or [])
    per_val = (
        df.select(*keys, F.col(value_col).alias("_v"))
        .groupBy(*keys, "_v")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r")
    cells = per_val.select(*keys, "_v", "_n", rows).select(
        *keys,
        "r",
        _cms_cell(F.col("_v"), F.col("r")).alias("c"),
        "_n",
    )
    return cells.groupBy(*keys, "r", "c").agg(F.sum("_n").alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Union of two sketches over the same (depth, width): cell-wise sum."""
    keys = list(keys or [])
    return (
        a.unionByName(b)
        .groupBy(*keys, "r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_point_estimate(
    state: DataFrame,
    candidates: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Frequency upper-bound estimate for each candidate value:
    min over rows of the candidate's cell counter (the CMS guarantee:
    est >= true count, with overestimate bounded by e*N/width w.p.
    1 - e^-depth). Candidate set x depth joins the sparse state on
    (keys..., r, c) — the state is sketch-sized, so Spark broadcasts it
    and the probe never shuffles.

    ``keys`` must match the keys the state was built with
    (``cms_sketch``/``cms_merge``): probing a keyed state without them
    would min over cells of EVERY group, returning meaningless
    estimates — so a keyed state probed key-less raises instead.
    ``candidates`` must carry the same key columns when keys are used.
    """
    keys = list(keys or [])
    extra = set(state.columns) - {"r", "c", "cnt"} - set(keys)
    if extra:
        raise ValueError(
            f"cms_point_estimate: state carries group keys {sorted(extra)} "
            "not passed via keys= — probing would mix cells across groups"
        )
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r")
    probes = candidates.select(*keys, F.col(value_col).alias("_v")).select(
        *keys, "_v", rows
    ).select(*keys, "_v", "r", _cms_cell(F.col("_v"), F.col("r")).alias("c"))
    joined = probes.join(F.broadcast(state), [*keys, "r", "c"], "left").select(
        *keys, "_v", F.coalesce(F.col("cnt"), F.lit(0)).alias("_cell_cnt")
    )
    return (
        joined.groupBy(*keys, "_v")
        .agg(F.min("_cell_cnt").alias("est_count"))
        .select(*keys, F.col("_v").alias(value_col), "est_count")
    )
