"""Deterministic sampling operators for training-data pipelines.

Everything here is **hash-threshold** sampling: a row is kept iff
``h(key) < fraction`` where ``h`` maps the row's stable key uniformly onto
[0, 1). No RNG state, no seed plumbing, no driver coordination:

- the same row always makes the same decision (re-runs, retries, and
  incremental syncs stay consistent — the property `sample()`'s
  seed-per-partition RNG does NOT give you when partitioning changes),
- the filter is one codegen expression (md5 + compare) pushed as far down
  as Catalyst can move it,
- at 100 TB it's embarrassingly parallel — no shuffle at all for
  `hash_sample` / `stratified_sample`; `reservoir_per_group` is one
  window shuffle on the group key.

The hash is the first 15 hex chars of md5 (60 bits) → exact parity with the
DuckDB oracle's ``('0x' || substring(md5(x),1,15))::BIGINT``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "neyman_allocation",
    "HASH_SPACE",
    "hash_bucket",
    "hash_sample",
    "stratified_sample",
    "reservoir_per_group",
    "split_train_test",
    "mixture_weighted_sample",
    "split_by_fingerprint",
    "split_by_cluster",
    "mixture_by_tokens",
]

HASH_SPACE = 16**15  # 60-bit md5 prefix
_D38 = "decimal(38,0)"  # exact-moment accumulator type (abtest.py house style)


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform 60-bit bucket from a stable key (codegen-only: md5 prefix)."""
    k = key.cast("string") if salt == "" else F.concat(key.cast("string"), F.lit(salt))
    return F.conv(F.substring(F.md5(k), 1, 15), 16, 10).cast("long")


def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(fraction * HASH_SPACE)


def hash_sample(df: DataFrame, key_col: str, fraction: float, salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, decided per-row by key hash — stable
    across re-runs and repartitioning, pushdown-friendly, shuffle-free."""
    return df.filter(hash_bucket(F.col(key_col), salt) < _threshold(fraction))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum hash-threshold sampling (e.g. per-language quotas when
    rebalancing a corpus). Strata missing from ``fractions`` fall back to
    ``default_fraction`` (0 ⇒ dropped)."""
    th: Column = F.lit(_threshold(default_fraction))
    for stratum, frac in fractions.items():
        th = F.when(F.col(strata_col) == stratum, F.lit(_threshold(frac))).otherwise(th)
    return df.filter(hash_bucket(F.col(key_col)) < th)


def reservoir_per_group(
    df: DataFrame, group_cols: list[str], key_col: str, k: int
) -> DataFrame:
    """Exactly ``min(k, |group|)`` uniform rows per group — the
    deterministic form of per-group reservoir sampling: rank by key hash,
    keep the k smallest. One window shuffle on the group key."""
    w = W.partitionBy(*group_cols).orderBy(hash_bucket(F.col(key_col)), F.col(key_col))
    return (
        df.withColumn("_rs_rn", F.row_number().over(w))
        .filter(F.col("_rs_rn") <= k)
        .drop("_rs_rn")
    )


def split_train_test(
    df: DataFrame, key_col: str, test_fraction: float, salt: str = "split"
) -> DataFrame:
    """Stable train/test assignment as a column — the salt keeps the split
    independent of any sampling done with the bare key."""
    is_test = hash_bucket(F.col(key_col), salt) < _threshold(test_fraction)
    return df.withColumn("split", F.when(is_test, "test").otherwise("train"))


def mixture_weighted_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Downsample a multi-source corpus to target mixture proportions.

    Given desired weights ``w_s`` (e.g. ``{"en": .5, "zh": .15, ...}``) and
    the observed per-stratum counts ``n_s``, the largest achievable corpus
    has ``C = min_s(n_s / w_s)`` weighted rows; each stratum keeps fraction
    ``f_s = min(1, w_s * C / n_s)`` via the same hash-threshold rule as
    `hash_sample` (deterministic, re-run stable). Strata missing from
    ``weights`` are dropped — a mixture spec is a whitelist.

    Dataflow: one tiny groupBy count (map-side combinable, k strata rows),
    the fraction arithmetic stays in the plan (no ``collect``), and the
    per-row decision is a broadcast join + codegen filter — the scan side
    never shuffles, so this holds at 100 TB.
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(s, float(w)) for s, w in weights.items()],
        f"`{strata_col}` string, _mix_wt double",
    )
    counts = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("_mix_n"))
        .join(wdf, strata_col)
    )
    # the feasibility cap C = min(n/w) rides a global window over the k-row
    # counts frame (single tiny partition) instead of a separate aggregate
    # branch — otherwise the whole upstream plan is evaluated twice
    cap = F.min(F.col("_mix_n") / F.col("_mix_wt")).over(W.partitionBy())
    fractions = counts.select(
        strata_col,
        F.least(F.lit(1.0), F.col("_mix_wt") * cap / F.col("_mix_n")).alias("_mix_f"),
    )
    thr = F.floor(F.col("_mix_f") * F.lit(float(HASH_SPACE))).cast("long")
    return (
        df.join(F.broadcast(fractions), strata_col)
        .filter(hash_bucket(F.col(key_col), salt) < thr)
        .drop("_mix_f")
    )


def split_by_fingerprint(
    df: DataFrame, text_col: str, test_fraction: float, salt: str = "content-split"
) -> DataFrame:
    """Leakage-safe train/test split: the split key is the CONTENT
    fingerprint (md5 of whitespace-normalized text), not the row id —
    byte-identical duplicates always land on the same side. An id-keyed
    split leaks n-1 copies of every duplicated document across the
    boundary, which inflates eval scores on exactly the documents a crawl
    duplicates most. Same codegen-only md5-threshold mechanics as
    ``split_train_test``; pair with near-dup clustering (cluster_id as the
    key) when near-duplicates must also stay together."""
    from olake_spark.operators.dedup import normalize_text

    fp = F.md5(normalize_text(F.col(text_col)))
    is_test = hash_bucket(fp, salt) < _threshold(test_fraction)
    return df.withColumn("split", F.when(is_test, "test").otherwise("train"))


def mixture_by_tokens(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    text_col: str,
    weights: dict[str, float],
    salt: str = "mixtok",
    token_count_col: str | None = None,
) -> DataFrame:
    """``mixture_weighted_sample`` with TOKEN budgets instead of row counts —
    what a pretraining mix actually targets: weights describe each source's
    share of the token stream, and a source of long documents must
    contribute fewer documents for the same share.

    Per-stratum mass ``n_s`` = Σ token counts; the largest achievable corpus
    holds ``C = min_s(n_s / w_s)`` tokens and each stratum keeps fraction
    ``f_s = min(1, w_s · C / n_s)`` of its token mass. Documents stay the
    sampling unit (a doc is kept or dropped whole, decided by key hash), and
    because the keep decision is independent of length the retained token
    mass converges to ``f_s · n_s`` in expectation. Same scale shape as the
    row-count form: one map-side-combinable aggregation, fraction arithmetic
    in-plan, broadcast join + codegen filter — the scan never shuffles.

    ``token_count_col`` selects a precomputed per-doc token-count column
    (e.g. real BPE counts from ``operators.bpe.bpe_encode`` joined onto the
    frame) instead of the whitespace-token size — the budget is then in the
    same units the training run bills in.
    """
    from olake_spark.operators.text import tokens

    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(s, float(w)) for s, w in weights.items()],
        f"`{strata_col}` string, _mix_wt double",
    )
    if token_count_col is not None:
        tok = F.col(token_count_col).cast("long")
    else:
        tok = F.size(tokens(F.col(text_col))).cast("long")
    counts = (
        df.groupBy(strata_col)
        .agg(F.sum(tok).alias("_mix_n"))
        .join(wdf, strata_col)
    )
    cap = F.min(F.col("_mix_n") / F.col("_mix_wt")).over(W.partitionBy())
    fractions = counts.select(
        strata_col,
        F.least(F.lit(1.0), F.col("_mix_wt") * cap / F.col("_mix_n")).alias("_mix_f"),
    )
    thr = F.floor(F.col("_mix_f") * F.lit(float(HASH_SPACE))).cast("long")
    return (
        df.join(F.broadcast(fractions), strata_col)
        .filter(hash_bucket(F.col(key_col), salt) < thr)
        .drop("_mix_f")
    )


def split_by_cluster(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str,
    test_fraction: float,
    salt: str = "cluster-split",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """NEAR-dup-safe train/test split: the split key is the near-duplicate
    CLUSTER id (from ``dedup.connected_components``), so a document and all
    its near-duplicates always land on the same side — the leakage
    ``split_by_fingerprint`` cannot close (byte-different paraphrases of a
    test doc in train still inflate eval). One equi-join on the id (the
    cluster frame is (id, cluster_id) — narrow), then the same
    codegen-only md5-threshold decision as every split here."""
    keyed = df.join(clusters.select(id_col, cluster_col), id_col)
    is_test = hash_bucket(F.col(cluster_col), salt) < _threshold(test_fraction)
    return keyed.withColumn("split", F.when(is_test, "test").otherwise("train"))


def neyman_allocation(
    df: DataFrame,
    stratum_cols: list[str],
    value_col: str,
    total_n: int,
) -> DataFrame:
    """Neyman-optimal sample allocation across strata — how many units
    to draw from each stratum to minimize the variance of the estimated
    population mean at a fixed total budget:

        n_h = n_total · (N_h·S_h) / Σ_g (N_g·S_g)

    (S_h = the stratum's sample SD). The per-stratum moments (N, Σv,
    Σv²) accumulate as exact micro-unit DECIMAL(38,0) integers in one
    map-side-combinable pass; the size measure N·S then quantizes to a
    micro integer PER ROW (one deterministic IEEE sequence each — no
    order-dependent double summation anywhere), so the stratum-wide
    total is an exact integer sum and the allocation fraction is a
    single integer÷integer divide — reproducible across runs and
    engines. Allocations are reported both fractional (round 6) and as
    the floor integer with the largest-remainder top-up so the integer
    column sums EXACTLY to ``total_n`` (the Hamilton apportionment —
    deterministic tie-break by remainder DESC then stratum key).
    Zero-variance strata get zero allocation (they need one unit in
    practice — that adjustment is the caller's policy), EXCEPT in the
    fully degenerate design where EVERY stratum has zero/undefined SD:
    there Neyman provides no signal and the allocation falls back to
    proportional (n_h ∝ N_h), preserving the sums-to-budget guarantee.
    NULL values drop; single-row strata have no sample SD and behave
    as zero-variance.

    Returns (strata..., n_pop, sd, alloc_frac, alloc_n).
    """
    if total_n < 1:
        raise ValueError(f"total_n must be >= 1, got {total_n}")
    d38 = _D38
    vm = F.round(F.col(value_col) * 1_000_000).cast("long").cast(d38)
    per = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*stratum_cols)
        .agg(
            F.count(F.lit(1)).cast(d38).alias("_n"),
            F.sum(vm).alias("_s"),
            F.sum(vm * vm).alias("_q"),
        )
    )
    n = F.col("_n")
    sd = F.sqrt(
        F.try_divide(
            (n * F.col("_q") - F.col("_s") * F.col("_s")).cast("double"),
            (n * (n - 1)).cast("double"),
        )
    ) / 1e6
    staged = per.select(
        *stratum_cols,
        n.cast("long").alias("n_pop"),
        F.coalesce(sd, F.lit(0.0)).alias("_sd"),
        # micro-quantized N·S: the only double math is this per-row
        # product+round (deterministic); everything summed is integer.
        # Cast straight to DECIMAL(38,0) — a long intermediate clamps
        # silently past 2^63 in non-ANSI Spark while the oracle's
        # BIGINT cast errors (review catch); headroom: exact while
        # n·sd·10⁶ < 2^53 (doubles carry no fraction past that, and
        # both engines then convert the SAME integral double)
        F.round(
            n.cast("double") * F.coalesce(sd, F.lit(0.0)) * F.lit(1e6)
        ).cast(d38).alias("_m"),
    )
    wtot = W.partitionBy()
    msum = F.sum("_m").over(wtot)
    npop_sum = F.sum(F.col("n_pop").cast(d38)).over(wtot)
    # degenerate all-zero-SD design → proportional fallback (n_h ∝ N_h)
    measure = F.when(msum > 0, F.col("_m")).otherwise(
        F.col("n_pop").cast(d38)
    )
    measure_sum = F.when(msum > 0, msum).otherwise(npop_sum)
    frac = F.lit(float(total_n)) * F.try_divide(
        measure.cast("double"), measure_sum.cast("double")
    )
    with_frac = staged.select(
        *stratum_cols,
        "n_pop",
        F.col("_sd").alias("_sdv"),
        F.coalesce(frac, F.lit(0.0)).alias("_frac"),
    )
    base_i = F.floor(F.col("_frac")).cast("long")
    rem = F.col("_frac") - base_i
    # largest-remainder top-up: total_n − Σfloor gets distributed to the
    # biggest remainders (deterministic tie-break by remainder DESC,
    # then the stratum key) — stratum-sized windows only
    worder = W.orderBy(
        rem.desc(), *[F.col(c).asc() for c in stratum_cols]
    )
    ranked = with_frac.select(
        *stratum_cols,
        "n_pop",
        "_sdv",
        "_frac",
        base_i.alias("_base"),
        F.row_number().over(worder).alias("_rk"),
        (F.lit(total_n) - F.sum(base_i).over(W.partitionBy())).alias(
            "_left"
        ),
    )
    alloc = F.col("_base") + F.when(
        F.col("_rk") <= F.col("_left"), F.lit(1)
    ).otherwise(F.lit(0))
    return ranked.select(
        *stratum_cols,
        "n_pop",
        F.round(F.col("_sdv"), 6).alias("sd"),
        F.round(F.col("_frac"), 6).alias("alloc_frac"),
        alloc.cast("long").alias("alloc_n"),
    )
