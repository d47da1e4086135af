"""Two-sample distribution comparison — exact Kolmogorov-Smirnov.

The A/B-test primitive ("did the experiment shift the metric's
DISTRIBUTION, not just its mean?"), built so the statistic is EXACT:

    D = max over pooled values |F_a(v) − F_b(v)|
      = max |c_a(v)·n_b − c_b(v)·n_a| / (n_a·n_b)

with c_x(v) the cumulative count of group x at value v. The numerator
max runs over exact integers (DECIMAL(38,0) cross-multiplication — no
float ECDF subtraction whose rounding could flip the argmax), and the
single division happens once at the end.

Plan shape: per-value group counts (one map-side-combinable shuffle on
the value), then a cumulative window over the DISTINCT-VALUE relation —
values-sized, not rows-sized; documented single-partition ordering cost
is |distinct values| (bucket the value upstream if its domain is raw
doubles at 100 TB scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "bh_fdr_adjust",
    "mantel_haenszel_or",
    "mcnemar_paired",
    "wasserstein_1d",
    "friedman_test",
    "cochran_q",
    "isotonic_calibration",
    "energy_distance_1d",
    "kendalls_w",
    "cramer_von_mises_2samp",
    "kuiper_two_sample",
    "hellinger_binned",
    "cliffs_delta",
    "cronbach_alpha",
    "cochran_armitage_trend",
    "correlation_ratio",
    "kish_weighted_mean",
    "odds_ratio",
    "two_proportion_ztest",
    "eb_beta_binomial_shrink",
    "jonckheere_terpstra",
    "msprt_always_valid",
    "brown_forsythe",
    "cuped_adjust",
    "did_estimator",
    "effect_size_two_sample",
    "kruskal_wallis",
    "ks_uniform_gof",
    "oneway_anova",
    "ks_two_sample",
    "mann_whitney_u",
    "proportion_wilson_ci",
    "ratio_metric_delta",
    "welch_ttest",
    "wilcoxon_signed_rank",
]

_D38 = "decimal(38,0)"


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    scale: int = 1_000_000,
) -> DataFrame:
    """One-row report (n_a, n_b, d_num, d_den, ks): ``ks`` =
    d_num/d_den rounded to 6, with d_num = max |c_a·n_b − c_b·n_a| and
    d_den = n_a·n_b exact. Values quantize to ``round(v·scale)``
    integers so ties are well-defined across engines. NULL values are
    excluded (they carry no order information; keeping them would also
    diverge from SQL engines whose NULLS FIRST/LAST defaults differ)."""
    g = F.col(group_col)
    v = F.round(F.col(value_col) * scale).cast("long")
    per_val = (
        df.filter(g.isin([group_a, group_b]))
        .filter(F.col(value_col).isNotNull())
        .select(g.alias("_g"), v.alias("_v"))
        .groupBy("_v")
        .agg(
            F.sum(F.when(F.col("_g") == group_a, 1).otherwise(0)).alias("_a"),
            F.sum(F.when(F.col("_g") == group_b, 1).otherwise(0)).alias("_b"),
        )
    )
    w = W.orderBy("_v").rowsBetween(W.unboundedPreceding, W.currentRow)
    tot = W.partitionBy()
    cum = per_val.select(
        F.sum("_a").over(w).cast(_D38).alias("_ca"),
        F.sum("_b").over(w).cast(_D38).alias("_cb"),
        F.sum("_a").over(tot).cast(_D38).alias("_na"),
        F.sum("_b").over(tot).cast(_D38).alias("_nb"),
    )
    diff = F.abs(F.col("_ca") * F.col("_nb") - F.col("_cb") * F.col("_na"))
    return cum.agg(
        F.first("_na").cast("long").alias("n_a"),
        F.first("_nb").cast("long").alias("n_b"),
        F.max(diff).cast("long").alias("d_num"),
        (F.first("_na") * F.first("_nb")).cast("long").alias("d_den"),
        F.round(
            F.max(diff).cast("double")
            / (F.first("_na") * F.first("_nb")).cast("double"),
            6,
        ).alias("ks"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact Mann-Whitney U (Wilcoxon rank-sum) two-sample test — the
    rank-based sibling of :func:`ks_two_sample` ("did the experiment
    shift the metric's LOCATION, without assuming normality?").

    Everything up to the final z stays in exact integers by working in
    DOUBLED ranks (ties produce half-integer average ranks; twice the
    average rank is always an integer):

        rank2(v) = 2·c_prev(v) + t(v) + 1      (t = tie count at v)
        W2_a     = Σ_v a(v)·rank2(v)           (= 2·rank-sum of group a)
        U2_a     = W2_a − n_a·(n_a+1)          (= 2·U_a)

    with the tie-corrected normal approximation

        z = (U_a − n_a·n_b/2) / sqrt(σ²),
        σ² = n_a·n_b·(n³ − n − Σ(t³−t)) / (12·n·(n−1))

    computed as ONE cast-to-double of each exact DECIMAL(38,0) integer
    followed by the identical IEEE divide/sqrt sequence in any engine,
    so round(·, 6) is hash-stable. ``auc`` = U_a/(n_a·n_b) is the
    probability-of-superiority / ROC-AUC reading of the same statistic.

    Plan shape (identical to the KS operator): one map-side-combinable
    shuffle onto the quantized value, then a cumulative window over the
    DISTINCT-VALUE relation — values-sized, not rows-sized. Headroom:
    the variance product n_a·n_b·n³ must fit 38 digits → exact for
    n ≲ 10^7 with balanced groups (quantize coarser above that).

    NULL values are excluded before ranking (a NULL has no rank; Spark
    and SQL engines disagree on NULLS FIRST/LAST so keeping them would
    make rank2 engine-dependent), and a fully-tied sample (variance 0)
    reports z = NULL rather than NaN — the repo's zero-variance
    convention (acf / zipf_slope / corr_matrix).
    """
    g = F.col(group_col)
    v = F.round(F.col(value_col) * scale).cast("long")
    per_val = (
        df.filter(g.isin([group_a, group_b]))
        .filter(F.col(value_col).isNotNull())
        .select(g.alias("_g"), v.alias("_v"))
        .groupBy("_v")
        .agg(
            F.sum(F.when(F.col("_g") == group_a, 1).otherwise(0)).alias("_a"),
            F.sum(F.when(F.col("_g") == group_b, 1).otherwise(0)).alias("_b"),
        )
    )
    w = W.orderBy("_v").rowsBetween(W.unboundedPreceding, W.currentRow)
    t = (F.col("_a") + F.col("_b")).cast(_D38)
    ranked = per_val.select(
        F.col("_a").cast(_D38).alias("_a"),
        t.alias("_t"),
        # 2·avg_rank = 2·(count strictly below) + t + 1
        (F.lit(2) * (F.sum(F.col("_a") + F.col("_b")).over(w).cast(_D38) - t)
         + t + F.lit(1)).alias("_rank2"),
    )
    s = ranked.agg(
        F.sum(F.col("_a")).alias("_na"),
        (F.sum(F.col("_t")) - F.sum(F.col("_a"))).alias("_nb"),
        F.sum(F.col("_t")).alias("_n"),
        F.sum(F.col("_a") * F.col("_rank2")).alias("_w2a"),
        F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t")).alias("_tie"),
    )
    na, nb, n = F.col("_na"), F.col("_nb"), F.col("_n")
    u2a = F.col("_w2a") - na * (na + F.lit(1))
    var_num_exact = na * nb * (n * n * n - n - F.col("_tie"))
    var_num = var_num_exact.cast("double")
    var_den = (F.lit(12) * n * (n - F.lit(1))).cast("double")
    z = F.when(
        var_num_exact > 0,
        (u2a - na * nb).cast("double")
        / (F.lit(2.0) * F.sqrt(var_num / var_den)),
    )
    return s.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        u2a.cast("long").alias("u2_a"),
        F.col("_tie").cast("long").alias("tie_correction"),
        F.round(
            u2a.cast("double") / (F.lit(2.0) * na.cast("double") * nb.cast("double")),
            6,
        ).alias("auc"),
        F.round(z, 6).alias("z"),
    )


def proportion_wilson_ci(
    df: DataFrame,
    keys: list[str],
    success_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Per-group Wilson score interval for a proportion — the interval
    every experiment/conversion dashboard should use instead of the
    Wald ±z·√(p(1−p)/n) (which collapses to zero width at p ∈ {0, 1}
    and goes negative near the edges; Wilson stays inside [0, 1] and
    behaves at small n):

        center = (p̂ + z²/2n) / (1 + z²/n)
        half   = z·√(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n)

    ``success_col`` is a boolean Column name (NULL rows are excluded —
    they are neither success nor failure). k and n are exact integers
    from one map-side-combinable aggregation; everything after is one
    fixed IEEE sequence per group (identical in any engine —
    hash-stable at round 6).

    Returns (keys..., n, k, p_hat, ci_lo, ci_hi).
    """
    s = F.col(success_col)
    agg = (
        df.filter(s.isNotNull())
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(s.cast("long")).alias("k"),
        )
    )
    n = F.col("n").cast("double")
    k = F.col("k").cast("double")
    p = k / n
    z2 = z * z
    denom = 1.0 + z2 / n
    center = (p + z2 / (2.0 * n)) / denom
    half = z * F.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n)) / denom
    return agg.select(
        *keys,
        "n",
        "k",
        F.round(p, 6).alias("p_hat"),
        F.round(center - half, 6).alias("ci_lo"),
        F.round(center + half, 6).alias("ci_hi"),
    )


def cuped_adjust(
    df: DataFrame,
    group_col: str,
    pre_col: str,
    post_col: str,
) -> DataFrame:
    """CUPED variance reduction for unit-level experiment metrics — the
    industry-standard trick that removes pre-experiment variance from
    the treatment comparison: with a pre-period covariate X and the
    experiment metric Y per unit,

        θ  = cov(X, Y) / var(X)            (POOLED across arms)
        Y' = Y − θ·(X − μ_X)

    leaves every arm's expected mean unchanged while shrinking variance
    by the squared X-Y correlation — experiments read significance days
    earlier. One row per arm.

    Exactness: the pooled moments (n, ΣX, ΣY, ΣX², ΣXY, per-arm n/ΣY/
    ΣX) all accumulate as exact micro-unit DECIMAL(38,0) integers in
    ONE map-side-combinable pass over the unit table (adjusted means
    are a linear function of sums — no per-row Y' materialization is
    ever needed: mean(Y')_arm = (ΣY_arm − θ·(ΣX_arm − n_arm·μ_X)) /
    n_arm); θ and the means are one fixed IEEE sequence after a single
    cast each, hash-stable at round 6. Zero pre-period variance → θ
    undefined → adjusted mean reported as the raw mean (θ := 0), the
    repo's degenerate-case convention.

    Returns (group_col, n, mean_post, mean_adj, theta).
    """
    xm = F.round(F.col(pre_col) * 1_000_000).cast("long").cast(_D38)
    ym = F.round(F.col(post_col) * 1_000_000).cast("long").cast(_D38)
    per_arm = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast(_D38).alias("_na"),
        F.sum(xm).alias("_sxa"),
        F.sum(ym).alias("_sya"),
        F.sum(xm * xm).alias("_sxxa"),
        F.sum(xm * ym).alias("_sxya"),
    )
    tot = W.partitionBy()
    pooled = per_arm.select(
        group_col,
        "_na", "_sxa", "_sya",
        F.sum("_na").over(tot).alias("_n"),
        F.sum("_sxa").over(tot).alias("_sx"),
        F.sum("_sya").over(tot).alias("_sy"),
        F.sum("_sxxa").over(tot).alias("_sxx"),
        F.sum("_sxya").over(tot).alias("_sxy"),
    )
    n = F.col("_n")
    varx = (n * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
    covxy = (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("double")
    theta = F.when(varx > 0, covxy / varx).otherwise(F.lit(0.0))
    na = F.col("_na").cast("double")
    mean_post = F.col("_sya").cast("double") / na / 1_000_000.0
    # mean(X)_arm − μ_X in micro, exactly: ΣX_arm/n_arm − ΣX/n
    mean_adj = (
        F.col("_sya").cast("double") / na
        - theta
        * (
            F.col("_sxa").cast("double") / na
            - F.col("_sx").cast("double") / n.cast("double")
        )
    ) / 1_000_000.0
    return pooled.select(
        group_col,
        F.col("_na").cast("long").alias("n"),
        F.round(mean_post, 6).alias("mean_post"),
        F.round(mean_adj, 6).alias("mean_adj"),
        F.round(theta, 6).alias("theta"),
    )


def ratio_metric_delta(
    df: DataFrame,
    group_col: str,
    num_col: str,
    den_col: str,
) -> DataFrame:
    """Per-arm RATIO metric with delta-method standard error — the
    correct read for revenue-per-session / clicks-per-user style
    metrics, where the naive per-unit-average-of-ratios is biased and
    the naive SE ignores that numerator and denominator co-vary on the
    same units:

        R = ΣY / ΣN        (per arm, unit-level Y and N)
        var(R) ≈ (var(Y) + R²·var(N) − 2R·cov(Y, N)) / (n·mean(N)²)
        se(R) = √var(R)

    All six moments per arm (n, ΣY, ΣN, ΣY², ΣN², ΣYN) accumulate as
    exact micro-unit DECIMAL(38,0) integers in one map-side-combinable
    pass; the delta algebra is one fixed IEEE sequence after a single
    cast per moment (sample variances, n−1 denominators), hash-stable
    at round 6. Arms with n < 2 or zero denominator report NULL se; a
    zero-denominator arm reports NULL ratio too (never IEEE ±Inf/NaN —
    the repo's degenerate-case convention).

    Returns (group_col, n, ratio, se).
    """
    ym = F.round(F.col(num_col) * 1_000_000).cast("long").cast(_D38)
    nm = F.round(F.col(den_col) * 1_000_000).cast("long").cast(_D38)
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast(_D38).alias("_c"),
        F.sum(ym).alias("_sy"),
        F.sum(nm).alias("_sn"),
        F.sum(ym * ym).alias("_syy"),
        F.sum(nm * nm).alias("_snn"),
        F.sum(ym * nm).alias("_syn"),
    )
    c = F.col("_c").cast("double")
    sy = F.col("_sy").cast("double")
    sn = F.col("_sn").cast("double")
    # try_divide throughout: under ANSI (Spark 4 default) a plain / on a
    # zero-denominator or n=1 arm would THROW at execution even inside a
    # F.when guard (the guard's own condition evaluates the division)
    r = F.try_divide(sy, sn)
    vary = F.try_divide(
        (F.col("_c") * F.col("_syy") - F.col("_sy") * F.col("_sy"))
        .cast("double"),
        c * (c - 1.0),
    )
    varn = F.try_divide(
        (F.col("_c") * F.col("_snn") - F.col("_sn") * F.col("_sn"))
        .cast("double"),
        c * (c - 1.0),
    )
    covyn = F.try_divide(
        (F.col("_c") * F.col("_syn") - F.col("_sy") * F.col("_sn"))
        .cast("double"),
        c * (c - 1.0),
    )
    mean_n = sn / c
    var_r = F.try_divide(
        vary + r * r * varn - 2.0 * r * covyn, c * mean_n * mean_n
    )
    se = F.when(
        (F.col("_c") > 1) & (F.col("_sn") != 0) & (var_r >= 0.0),
        F.sqrt(var_r),
    )
    return agg.select(
        group_col,
        F.col("_c").cast("long").alias("n"),
        F.when(F.col("_sn") != 0, F.round(r, 6)).alias("ratio"),
        F.round(se, 6).alias("se"),
    )



def _two_arm_micro_moments(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Shared one-pass two-arm moment core: the six exact micro-unit
    DECIMAL(38,0) moments (n, ΣX, ΣX² per arm) every two-sample
    parametric operator here consumes (welch_ttest,
    effect_size_two_sample, msprt_always_valid). One map-side-combinable
    aggregation; NULL values drop; rows outside the two arms drop."""
    g = F.col(group_col)
    vm = F.round(F.col(value_col) * 1_000_000).cast("long").cast(_D38)
    return (
        df.filter(g.isin([group_a, group_b]))
        .filter(F.col(value_col).isNotNull())
        .select(g.alias("_g"), vm.alias("_v"))
        .agg(
            *[
                agg
                for tag, grp in (("a", group_a), ("b", group_b))
                for agg in (
                    F.sum(F.when(F.col("_g") == grp, 1).otherwise(0))
                    .cast(_D38)
                    .alias(f"_n{tag}"),
                    F.sum(
                        F.when(F.col("_g") == grp, F.col("_v")).otherwise(
                            F.lit(0).cast(_D38)
                        )
                    ).alias(f"_s{tag}"),
                    F.sum(
                        F.when(
                            F.col("_g") == grp, F.col("_v") * F.col("_v")
                        ).otherwise(F.lit(0).cast(_D38))
                    ).alias(f"_q{tag}"),
                )
            ]
        )
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Welch's unequal-variance two-sample t — the parametric sibling of
    :func:`mann_whitney_u` ("did the mean shift?", without assuming the
    arms share a variance):

        t   = (m_a − m_b) / sqrt(s²_a/n_a + s²_b/n_b)
        dof = (s²_a/n_a + s²_b/n_b)² /
              ((s²_a/n_a)²/(n_a−1) + (s²_b/n_b)²/(n_b−1))

    One map-side-combinable pass accumulates the six moments (n, ΣX,
    ΣX² per arm) as exact micro-unit DECIMAL(38,0) integers; every
    double is one cast of an exact integer and the t/dof algebra is the
    identical IEEE sequence in any engine (micro scale cancels inside
    t), so round(·, 6) hashes stably. try_divide throughout — an arm
    with n < 2 or zero variance reports NULL t/dof (never a NaN or an
    ANSI divide error), the repo's degenerate-case convention.

    Returns one row (n_a, n_b, mean_a, mean_b, t, dof).
    """
    per = _two_arm_micro_moments(df, group_col, value_col, group_a, group_b)
    na, nb = F.col("_na"), F.col("_nb")
    # sample variance in micro² as one cast of the exact integer
    # n·ΣX² − (ΣX)², then the single n(n−1) divide
    va = F.try_divide(
        (na * F.col("_qa") - F.col("_sa") * F.col("_sa")).cast("double"),
        (na * (na - 1)).cast("double"),
    )
    vb = F.try_divide(
        (nb * F.col("_qb") - F.col("_sb") * F.col("_sb")).cast("double"),
        (nb * (nb - 1)).cast("double"),
    )
    ma = F.try_divide(F.col("_sa").cast("double"), na.cast("double"))
    mb = F.try_divide(F.col("_sb").cast("double"), nb.cast("double"))
    sea = F.try_divide(va, na.cast("double"))
    seb = F.try_divide(vb, nb.cast("double"))
    se2 = sea + seb
    t = F.when(se2 > 0, (ma - mb) / F.sqrt(se2))
    dof = F.when(
        se2 > 0,
        F.try_divide(
            se2 * se2,
            F.try_divide(sea * sea, (na - 1).cast("double"))
            + F.try_divide(seb * seb, (nb - 1).cast("double")),
        ),
    )
    return per.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(ma / 1_000_000.0, 6).alias("mean_a"),
        F.round(mb / 1_000_000.0, 6).alias("mean_b"),
        F.round(t, 6).alias("t"),
        F.round(dof, 6).alias("dof"),
    )


def wilcoxon_signed_rank(
    df: DataFrame,
    pre_col: str,
    post_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Wilcoxon signed-rank test over PAIRED per-unit values (one row
    per unit, e.g. a user's pre- and post-period metric) — the paired
    complement to :func:`mann_whitney_u`'s independent two-sample U.

    Differences quantize to round(v·scale) integers; zero differences
    drop (standard Wilcoxon practice — they carry no sign). Ranks of
    |d| use the mann_whitney DOUBLED-rank trick so tied average ranks
    stay integral: rank2(v) = 2·(count |d| strictly below) + t + 1, and

        W2⁺  = Σ_{v} pos(v)·rank2(v)            (= 2·W⁺, exact int)
        z    = (2·W2⁺ − n(n+1)) / (4σ),
        4σ   = 2·sqrt((2n(n+1)(2n+1) − Σ(t³−t)) / 12)

    (numerator and denominator both carry a ×4 relative to the textbook
    (W⁺ − n(n+1)/4)/σ, so z is the exact statistic — the doubling from
    integer ranks appears twice). Plan shape: one map-side shuffle
    onto the quantized |d| value, then a cumulative window over the
    DISTINCT-|d| relation — values-sized, never rows-sized. A fully
    tied sample (variance 0) reports z = NULL.

    Returns one row (n, w2_plus, tie_correction, z).
    """
    d = (
        F.round(F.col(post_col) * scale).cast("long")
        - F.round(F.col(pre_col) * scale).cast("long")
    )
    per_val = (
        df.filter(F.col(pre_col).isNotNull() & F.col(post_col).isNotNull())
        .select(d.alias("_d"))
        .filter(F.col("_d") != 0)
        .groupBy(F.abs(F.col("_d")).alias("_v"))
        .agg(
            F.count(F.lit(1)).alias("_t"),
            F.sum(F.when(F.col("_d") > 0, 1).otherwise(0)).alias("_pos"),
        )
    )
    w = W.orderBy("_v").rowsBetween(W.unboundedPreceding, W.currentRow)
    t = F.col("_t").cast(_D38)
    ranked = per_val.select(
        F.col("_pos").cast(_D38).alias("_pos"),
        t.alias("_t"),
        (F.lit(2) * (F.sum("_t").over(w).cast(_D38) - t) + t + F.lit(1)).alias(
            "_rank2"
        ),
    )
    zero = F.lit(0).cast(_D38)
    # coalesce: an all-zero-diff input leaves ZERO ranked values and
    # empty-input sums are NULL; report (0, 0, 0, NULL z) instead
    s = ranked.agg(
        F.coalesce(F.sum("_t"), zero).alias("_n"),
        F.coalesce(F.sum(F.col("_pos") * F.col("_rank2")), zero).alias(
            "_w2p"
        ),
        F.coalesce(
            F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t")),
            zero,
        ).alias("_tie"),
    )
    n = F.col("_n")
    var4_exact = F.lit(2) * n * (n + 1) * (2 * n + 1) - F.col("_tie")
    z = F.when(
        var4_exact > 0,
        (F.lit(2) * F.col("_w2p") - n * (n + 1)).cast("double")
        / (F.lit(2.0) * F.sqrt(var4_exact.cast("double") / 12.0)),
    )
    return s.select(
        n.cast("long").alias("n"),
        F.col("_w2p").cast("long").alias("w2_plus"),
        F.col("_tie").cast("long").alias("tie_correction"),
        F.round(z, 6).alias("z"),
    )


def did_estimator(
    df: DataFrame,
    treat_col: str,
    post_col: str,
    value_col: str,
) -> DataFrame:
    """Difference-in-differences over unit-level observations tagged
    with a treatment flag and a pre/post period flag (both 0/1 int
    columns):

        DiD = (m_t1 − m_t0) − (m_c1 − m_c0)
        se  = sqrt(Σ_cells s²_g / n_g)        (pooled large-sample SE)

    The four cells' moments (n, ΣX, ΣX²) accumulate as exact micro-unit
    DECIMAL(38,0) integers in ONE pass; means/variances are each one
    cast + one IEEE divide, hash-stable at round 6. Cells with n < 2
    make the SE NULL (try_divide); a missing cell (no rows) makes both
    estimates NULL rather than silently treating it as zero.

    Returns one row (n_t0, n_t1, n_c0, n_c1, did, se).
    """
    vm = F.round(F.col(value_col) * 1_000_000).cast("long").cast(_D38)
    cell = (
        F.col(treat_col).cast("int") * 2 + F.col(post_col).cast("int")
    ).alias("_cell")
    per = (
        df.filter(F.col(value_col).isNotNull())
        .select(cell, vm.alias("_v"))
        .groupBy()
        .agg(
            *[
                agg
                for tag, c in (("c0", 0), ("c1", 1), ("t0", 2), ("t1", 3))
                for agg in (
                    F.sum(F.when(F.col("_cell") == c, 1).otherwise(0))
                    .cast(_D38)
                    .alias(f"_n{tag}"),
                    F.sum(
                        F.when(F.col("_cell") == c, F.col("_v")).otherwise(
                            F.lit(0).cast(_D38)
                        )
                    ).alias(f"_s{tag}"),
                    F.sum(
                        F.when(
                            F.col("_cell") == c, F.col("_v") * F.col("_v")
                        ).otherwise(F.lit(0).cast(_D38))
                    ).alias(f"_q{tag}"),
                )
            ]
        )
    )

    def mean(tag):
        return F.try_divide(
            F.col(f"_s{tag}").cast("double"), F.col(f"_n{tag}").cast("double")
        )

    def sevar(tag):
        n = F.col(f"_n{tag}")
        v = F.try_divide(
            (n * F.col(f"_q{tag}") - F.col(f"_s{tag}") * F.col(f"_s{tag}"))
            .cast("double"),
            (n * (n - 1)).cast("double"),
        )
        return F.try_divide(v, n.cast("double"))

    did = (mean("t1") - mean("t0")) - (mean("c1") - mean("c0"))
    se2 = sevar("t1") + sevar("t0") + sevar("c1") + sevar("c0")
    return per.select(
        F.col("_nt0").cast("long").alias("n_t0"),
        F.col("_nt1").cast("long").alias("n_t1"),
        F.col("_nc0").cast("long").alias("n_c0"),
        F.col("_nc1").cast("long").alias("n_c1"),
        F.round(did / 1_000_000.0, 6).alias("did"),
        F.round(
            F.when(se2 >= 0, F.sqrt(se2) / 1_000_000.0), 6
        ).alias("se"),
    )


def _anova_from_micro(df: DataFrame, group_col: str, vm_col: str) -> DataFrame:
    """Shared one-way ANOVA core over an exact micro-unit BIGINT value
    column: per-group moments (n, Σv, Σv²) accumulate as DECIMAL(38,0)
    in one map-side-combinable pass; the per-group double terms
    (SS_g = (n·Σv² − (Σv)²)/n and (Σv)²/n) then fold in GROUP-KEY ORDER
    via aggregate() over a sorted struct array — the KM/Holt ordered-fold
    recipe — so the float sums are one fixed IEEE sequence an oracle's
    ``list(x ORDER BY g)`` + ``list_reduce`` reproduces exactly (a plain
    SUM over double terms would be partition-order-dependent)."""
    per = df.groupBy(F.col(group_col).cast("string").alias("_g")).agg(
        F.count(F.lit(1)).cast(_D38).alias("_n"),
        F.sum(F.col(vm_col).cast(_D38)).alias("_s"),
        F.sum(F.col(vm_col).cast(_D38) * F.col(vm_col).cast(_D38)).alias(
            "_q"
        ),
    )
    term_w = F.try_divide(
        (F.col("_n") * F.col("_q") - F.col("_s") * F.col("_s")).cast(
            "double"
        ),
        F.col("_n").cast("double"),
    )
    term_b = F.try_divide(
        (F.col("_s") * F.col("_s")).cast("double"), F.col("_n").cast("double")
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum("_n").alias("_nt"),
        F.sum("_s").alias("_st"),
        F.array_sort(
            F.collect_list(F.struct(F.col("_g"), term_w.alias("w"), term_b.alias("b")))
        ).alias("_terms"),
    )
    ssw = F.aggregate(
        F.col("_terms"), F.lit(0.0), lambda acc, x: acc + x["w"]
    )
    sb_sum = F.aggregate(
        F.col("_terms"), F.lit(0.0), lambda acc, x: acc + x["b"]
    )
    nt = F.col("_nt")
    ssb = sb_sum - F.try_divide(
        (F.col("_st") * F.col("_st")).cast("double"), nt.cast("double")
    )
    k = F.col("_k")
    fstat = F.when(
        (k > 1) & (nt.cast("long") > k) & (ssw > 0),
        F.try_divide(ssb, (k - 1).cast("double"))
        / F.try_divide(ssw, (nt.cast("long") - k).cast("double")),
    )
    return agg.select(
        k.cast("long").alias("k_groups"),
        nt.cast("long").alias("n"),
        F.round(ssb / 1e12, 6).alias("ss_between"),
        F.round(ssw / 1e12, 6).alias("ss_within"),
        F.round(fstat, 6).alias("f"),
    )


def oneway_anova(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """One-way ANOVA F across the groups of ``group_col`` — "do the arm
    means differ at all?", the k-sample extension of :func:`welch_ttest`
    (classic equal-variance pooling; pair with :func:`brown_forsythe`
    to check the variance assumption first). One pass over the rows;
    SS terms reported in human units (micro² / 10¹²), NULL F on
    degenerate inputs. Returns (k_groups, n, ss_between, ss_within, f).
    """
    vm = F.round(F.col(value_col) * 1_000_000).cast("long")
    base = df.filter(F.col(value_col).isNotNull()).select(
        group_col, vm.alias("_vm")
    )
    return _anova_from_micro(base, group_col, "_vm")


def brown_forsythe(
    df: DataFrame, group_col: str, value_col: str, bins: int = 2048
) -> DataFrame:
    """Brown–Forsythe homogeneity-of-variance test — one-way ANOVA on
    the absolute deviations from each group's MEDIAN (the robust Levene
    variant; run it before trusting pooled-variance tests). Medians are
    the exact rank-⌈n/2⌉ micro BIGINTs from the shared histogram
    bisection (:mod:`olake_spark.operators.quantiles` — never a
    per-group sort buffer), broadcast back onto the rows; the ANOVA
    core then makes one more pass. Returns (k_groups, n, ss_between,
    ss_within, f) over |x − med_g|.
    """
    from olake_spark.operators.quantiles import exact_quantiles

    vm = F.round(F.col(value_col) * 1_000_000).cast("long")
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("_bg"),
        F.col(value_col).alias("_v"),
        vm.alias("_vm"),
    )
    med = exact_quantiles(base, ["_bg"], "_v", [0.5], bins=bins).select(
        "_bg", F.col("q_micros").alias("_med")
    )
    dev = base.join(F.broadcast(med), "_bg").select(
        "_bg", F.abs(F.col("_vm") - F.col("_med")).alias("_zm")
    )
    return _anova_from_micro(dev, "_bg", "_zm")


def effect_size_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Standardized two-sample effect size — Cohen's d with the pooled
    SD and its small-sample-corrected Hedges' g:

        s_p = sqrt(((n_a−1)s²_a + (n_b−1)s²_b) / (n_a+n_b−2))
        d   = (m_a − m_b) / s_p
        g   = d · (1 − 3/(4(n_a+n_b) − 9))

    The significance tests (:func:`welch_ttest`) say WHETHER the arms
    differ; this says by HOW MUCH in SD units — the number a meta-
    analysis or an MDE calculation actually consumes. Same exact
    micro-moment discipline as welch_ttest (six DECIMAL(38,0) integers
    in one map-side-combinable pass; one cast each, one IEEE sequence,
    hash-stable at round 6). Degenerate inputs (an arm with n < 1,
    pooled dof < 1, or zero pooled variance) report NULL d/g via
    try_divide/when — never NaN/Inf.

    Returns one row (n_a, n_b, mean_a, mean_b, pooled_sd, cohens_d,
    hedges_g).
    """
    per = _two_arm_micro_moments(df, group_col, value_col, group_a, group_b)
    na, nb = F.col("_na"), F.col("_nb")
    ma = F.try_divide(F.col("_sa").cast("double"), na.cast("double"))
    mb = F.try_divide(F.col("_sb").cast("double"), nb.cast("double"))
    # (n_g - 1)·s²_g = (n·Σv² − (Σv)²)/n, exact integer numerator
    ssa = F.try_divide(
        (na * F.col("_qa") - F.col("_sa") * F.col("_sa")).cast("double"),
        na.cast("double"),
    )
    ssb = F.try_divide(
        (nb * F.col("_qb") - F.col("_sb") * F.col("_sb")).cast("double"),
        nb.cast("double"),
    )
    sp2 = F.try_divide(ssa + ssb, (na + nb - 2).cast("double"))
    sp = F.sqrt(sp2)
    d = F.when(sp2 > 0, (ma - mb) / sp)
    ntot = (na + nb).cast("double")
    gg = d * (F.lit(1.0) - F.lit(3.0) / (F.lit(4.0) * ntot - F.lit(9.0)))
    return per.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(ma / 1_000_000.0, 6).alias("mean_a"),
        F.round(mb / 1_000_000.0, 6).alias("mean_b"),
        F.round(sp / 1_000_000.0, 6).alias("pooled_sd"),
        F.round(d, 6).alias("cohens_d"),
        F.round(gg, 6).alias("hedges_g"),
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Kruskal–Wallis H — the k-sample rank test (:func:`mann_whitney_u`
    for more than two arms; the nonparametric face of
    :func:`oneway_anova`):

        H  = 12/(n(n+1)) · Σ_g R_g²/n_g − 3(n+1)
        H' = H / (1 − Σ(t³−t)/(n³−n))          (tie correction)

    Rank machinery is the mann_whitney DOUBLED-rank recipe, generalized
    to k groups: one shuffle onto the quantized value builds the
    per-(group, value) count relation; a cumulative window over the
    DISTINCT-VALUE relation assigns rank2(v) = 2·c_below + t + 1; each
    group's doubled rank-sum R2_g = Σ_v c_gv·rank2(v) is an exact
    DECIMAL(38,0) integer (so R_g²/n_g = R2_g²/(4n_g)). The k per-group
    double terms fold in GROUP-KEY ORDER via aggregate() over a sorted
    struct array (the _anova_from_micro recipe) so the float sum is one
    fixed IEEE sequence in any engine. NULL values drop; a fully-tied
    sample (n³ = n + Σ(t³−t)) reports NULL H' — and H' is NULL when
    k < 2 or n ≤ k gives it no meaning.

    Returns one row (k_groups, n, tie_correction, h, h_tie_corrected).
    """
    g = F.col(group_col)
    v = F.round(F.col(value_col) * scale).cast("long")
    per_gv = (
        df.filter(F.col(value_col).isNotNull() & g.isNotNull())
        .select(g.cast("string").alias("_g"), v.alias("_v"))
        .groupBy("_g", "_v")
        .agg(F.count(F.lit(1)).cast(_D38).alias("_c"))
    )
    wv = W.orderBy("_v").rowsBetween(W.unboundedPreceding, W.currentRow)
    # rank2 needs the cumulative count over VALUES; compute it on the
    # distinct-value relation (values-sized), then join back
    vals = (
        per_gv.groupBy("_v")
        .agg(F.sum("_c").alias("_tv"))
        .select(
            "_v",
            (
                F.lit(2) * (F.sum("_tv").over(wv) - F.col("_tv"))
                + F.col("_tv")
                + F.lit(1)
            ).alias("_rank2"),
        )
    )
    ranked = per_gv.join(vals, "_v")
    per_g = ranked.groupBy("_g").agg(
        F.sum("_c").alias("_ng"),
        F.sum(F.col("_c") * F.col("_rank2")).alias("_r2g"),
    )
    term = F.try_divide(
        (F.col("_r2g") * F.col("_r2g")).cast("double"),
        (F.lit(4) * F.col("_ng")).cast("double"),
    )
    ties = per_gv.groupBy("_v").agg(F.sum("_c").alias("_t")).agg(
        F.coalesce(
            F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t")),
            F.lit(0).cast(_D38),
        ).alias("_tie")
    )
    agg = per_g.agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum("_ng").alias("_n"),
        F.array_sort(
            F.collect_list(F.struct(F.col("_g"), term.alias("rr")))
        ).alias("_terms"),
    ).crossJoin(F.broadcast(ties))
    rsum = F.aggregate(F.col("_terms"), F.lit(0.0), lambda a, x: a + x["rr"])
    n = F.col("_n")
    nn1 = (n * (n + 1)).cast("double")
    h = F.lit(12.0) * rsum / nn1 - F.lit(3.0) * (n + 1).cast("double")
    tie_den = (n * n * n - n).cast("double")
    corr = F.lit(1.0) - F.col("_tie").cast("double") / tie_den
    h_corr = F.when(
        (F.col("_k") > 1) & (n * n * n - n - F.col("_tie") > 0),
        h / corr,
    )
    return agg.select(
        F.col("_k").cast("long").alias("k_groups"),
        n.cast("long").alias("n"),
        F.col("_tie").cast("long").alias("tie_correction"),
        F.when(n > 1, F.round(h, 6)).alias("h"),
        F.round(h_corr, 6).alias("h_tie_corrected"),
    )


def bh_fdr_adjust(
    df: DataFrame,
    key_cols: list[str],
    p_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini–Hochberg FDR adjustment over a FAMILY of p-values —
    the correction any per-key test fleet (per-nation Welch, per-metric
    Mann-Kendall, the grouped corr/ACF sweeps) owes before anyone reads
    its winners:

        q_(i) = min_{j ≥ i} ( p_(j) · m / j ),  clipped to 1

    where p_(1) ≤ … ≤ p_(m). Reject H_(i) at level ``alpha`` iff
    q_(i) ≤ alpha (the step-up rule, in its equivalent adjusted-q
    form). Ranks come from one window over the FAMILY-sized relation
    (keys-sized — a test family is dozens to thousands of rows, never
    fact-table-sized); the suffix-min is a reverse cumulative min over
    the same relation. Ties in p get the same q (rank ties broken by
    key for determinism; the suffix-min makes the q invariant to which
    tied row ranks first). NULL p-values are excluded from the family
    (they neither count toward m nor consume a rank).

    Returns (keys..., p, rank, q, reject) ordered by rank.
    """
    base = df.select(*key_cols, F.col(p_col).alias("_p")).filter(
        F.col("_p").isNotNull()
    )
    wr = W.orderBy(F.col("_p").asc(), *[F.col(k).asc() for k in key_cols])
    wtot = W.partitionBy()
    ranked = base.select(
        *key_cols,
        "_p",
        F.row_number().over(wr).alias("_i"),
        F.count(F.lit(1)).over(wtot).alias("_m"),
    )
    raw_q = F.col("_p") * F.col("_m").cast("double") / F.col("_i").cast(
        "double"
    )
    wsuf = W.orderBy(F.col("_i").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    stepped = ranked.select(
        *key_cols,
        "_p",
        "_i",
        F.least(F.min(raw_q).over(wsuf), F.lit(1.0)).alias("_q"),
    )
    return stepped.select(
        *key_cols,
        F.round(F.col("_p"), 6).alias("p"),
        F.col("_i").cast("long").alias("rank"),
        F.round(F.col("_q"), 6).alias("q"),
        (F.col("_q") <= F.lit(alpha)).alias("reject"),
    ).orderBy("rank")


def ks_uniform_gof(
    df: DataFrame,
    score_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """One-sample Kolmogorov–Smirnov goodness-of-fit against Uniform[0,1]
    — the uniformity audit for anything that CLAIMS to be uniform:
    hash-bucket assignments, p-value families (a well-calibrated A/A
    fleet's p's are uniform), normalized ranks.

        D⁺ = max_v ( F̂(v) − v )      (F̂ = ECDF, right-continuous)
        D⁻ = max_v ( v − F̂(v⁻) )
        D  = max(D⁺, D⁻),            statistic √n·D

    Scores quantize to round(s·scale) integers (the ks_two_sample
    contract — ties well-defined across engines); the ECDF is one
    cumulative window over the DISTINCT-VALUE relation (values-sized).
    D⁺/D⁻ stay exact rationals (numerators over the common denominator
    n·scale) until one final cast each — hash-stable at round 6. Scores
    outside [0, 1] raise upstream concerns but are clamped by the ECDF
    algebra itself (they only ever widen D). NULLs drop.

    Returns one row (n, d_plus, d_minus, d, sqrt_n_d).
    """
    sm = F.round(F.col(score_col) * scale).cast("long")
    per_val = (
        df.filter(F.col(score_col).isNotNull())
        .select(sm.alias("_v"))
        .groupBy("_v")
        .agg(F.count(F.lit(1)).cast(_D38).alias("_t"))
    )
    wv = W.orderBy("_v").rowsBetween(W.unboundedPreceding, W.currentRow)
    wtot = W.partitionBy()
    cum = per_val.select(
        "_v",
        "_t",
        F.sum("_t").over(wv).alias("_c"),
        F.sum("_t").over(wtot).alias("_n"),
    )
    n = F.col("_n")
    sc = F.lit(scale).cast(_D38)
    # D⁺ numerator: c·scale − v·n ; D⁻ numerator: v·n − (c − t)·scale —
    # both over the common denominator n·scale, exact DECIMAL(38,0)
    dplus_num = F.col("_c") * sc - F.col("_v").cast(_D38) * n
    dminus_num = (
        F.col("_v").cast(_D38) * n - (F.col("_c") - F.col("_t")) * sc
    )
    agg = cum.agg(
        F.max(dplus_num).alias("_dp"),
        F.max(dminus_num).alias("_dm"),
        F.first(n).alias("_nn"),
    )
    # empty input: every agg above is NULL, and greatest() SKIPS NULLs
    # (greatest(NULL, 0.0) = 0.0) — without the explicit gate the report
    # would read n=NULL, d=0.0 ("perfectly uniform", for no data). The
    # degenerate row is (0, NULL, NULL, NULL, NULL), the kendall
    # empty-input convention.
    ok = F.col("_nn").isNotNull()
    nn = F.coalesce(F.col("_nn"), F.lit(0).cast(_D38))
    den = (nn * sc).cast("double")
    dp = F.when(ok, F.greatest(F.col("_dp").cast("double") / den, F.lit(0.0)))
    dm = F.when(ok, F.greatest(F.col("_dm").cast("double") / den, F.lit(0.0)))
    d = F.greatest(dp, dm)
    return agg.select(
        nn.cast("long").alias("n"),
        F.round(dp, 6).alias("d_plus"),
        F.round(dm, 6).alias("d_minus"),
        F.when(ok, F.round(d, 6)).alias("d"),
        F.when(ok, F.round(F.sqrt(nn.cast("double")) * d, 6)).alias(
            "sqrt_n_d"
        ),
    )


def msprt_always_valid(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    tau: float = 1.0,
) -> DataFrame:
    """Mixture sequential probability ratio test (mSPRT) — the
    ALWAYS-VALID p-value for a two-arm mean difference (Johari et al.
    2017, "Peeking at A/B Tests"): unlike every fixed-horizon test in
    this module, this p may be read at ANY sample size, repeatedly,
    without inflating the false-positive rate — the number a live
    experiment dashboard should show while the test is still running.

    With δ̂ = m_a − m_b, V = s²_a/n_a + s²_b/n_b and a N(0, τ²) mixing
    prior over the effect:

        Λ = sqrt(V/(V+τ²)) · exp( δ̂²·τ² / (2·V·(V+τ²)) )
        p_always_valid = min(1, 1/Λ)

    ``tau`` is the prior effect scale IN VALUE UNITS (pick ≈ the
    minimum detectable effect). Same one-pass exact micro-moment
    discipline as welch_ttest; δ̂/V convert to value units once and the
    Λ algebra is one fixed IEEE sequence, hash-stable at round 6.
    Degenerate arms (n < 2 or zero variance ⇒ V = 0 or NULL) report
    NULL Λ and p.

    Returns one row (n_a, n_b, delta, v, lambda_mix, p_always_valid).
    """
    per = _two_arm_micro_moments(df, group_col, value_col, group_a, group_b)
    na, nb = F.col("_na"), F.col("_nb")
    ma = F.try_divide(F.col("_sa").cast("double"), na.cast("double"))
    mb = F.try_divide(F.col("_sb").cast("double"), nb.cast("double"))
    va = F.try_divide(
        (na * F.col("_qa") - F.col("_sa") * F.col("_sa")).cast("double"),
        (na * (na - 1)).cast("double"),
    )
    vb = F.try_divide(
        (nb * F.col("_qb") - F.col("_sb") * F.col("_sb")).cast("double"),
        (nb * (nb - 1)).cast("double"),
    )
    # convert micro² moments to value units once: δ in units, V in units²
    delta = (ma - mb) / 1e6
    v = (F.try_divide(va, na.cast("double"))
         + F.try_divide(vb, nb.cast("double"))) / 1e12
    t2 = F.lit(float(tau) * float(tau))
    lam = F.when(
        v > 0,
        F.sqrt(v / (v + t2))
        * F.exp(delta * delta * t2 / (F.lit(2.0) * v * (v + t2))),
    )
    # least() SKIPS NULL arguments (least(1.0, NULL) = 1.0), so gate p
    # on lam explicitly — a degenerate test must read NULL, not "no
    # evidence against H0" (review-confirmed live)
    p = F.when(lam.isNotNull(), F.least(F.lit(1.0), F.lit(1.0) / lam))
    return per.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(delta, 6).alias("delta"),
        F.round(v, 6).alias("v"),
        F.round(lam, 6).alias("lambda_mix"),
        F.round(p, 6).alias("p_always_valid"),
    )


def eb_beta_binomial_shrink(
    df: DataFrame,
    key_cols: list[str],
    success_col: str,
    trial_col: str,
) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of per-key rates — the
    ranking fix for "this key converts at 100% (n=2)" leaderboards:
    fit a Beta(α, β) prior to the FAMILY of key-level empirical rates
    by method of moments, then shrink every key toward it:

        m = mean(p̂_i),  v = var(p̂_i)            (over keys, n_i > 0)
        α+β = m(1−m)/v − 1,  α = m·(α+β)
        p̃_i = (k_i + α) / (n_i + α + β)

    Small-n keys move a lot, large-n keys barely move — exactly the
    Bayesian behavior a top-k by rate needs. k_i/n_i aggregate exactly
    per key (one shuffle); the family moments m, v are windows over the
    KEY-sized relation (a leaderboard is thousands of rows, never
    fact-sized); the per-key p̂ doubles fold through the nano-floor
    discipline so the family moments are order-free. Degenerate family
    (v ≤ 0 — all rates equal — or v ≥ m(1−m) — overdispersed past any
    Beta) reports the RAW rate with NULL prior columns rather than a
    junk prior.

    Returns (keys..., n, k, p_raw, alpha, beta, p_shrunk).
    """
    per = df.groupBy(*key_cols).agg(
        F.sum(F.col(trial_col).cast("long")).alias("n"),
        F.sum(F.col(success_col).cast("long")).alias("k"),
    ).filter(F.col("n") > 0)
    p_hat = F.col("k").cast("double") / F.col("n").cast("double")
    nano = 1_000_000_000
    staged = per.select(
        *key_cols, "n", "k",
        F.floor(p_hat * nano).cast("long").alias("_p_nano"),
        F.floor(p_hat * p_hat * nano).cast("long").alias("_pp_nano"),
    )
    wtot = W.partitionBy()
    m = staged.select(
        *key_cols, "n", "k",
        F.count(F.lit(1)).over(wtot).alias("_kk"),
        F.sum("_p_nano").over(wtot).alias("_sp"),
        F.sum("_pp_nano").over(wtot).alias("_spp"),
    )
    kk = F.col("_kk").cast("double")
    mean = F.col("_sp").cast("double") / nano / kk
    # sample variance of the rates over keys (n-1); nano-floored moments
    var = F.when(
        F.col("_kk") > 1,
        (F.col("_spp").cast("double") / nano
         - kk * mean * mean) / (kk - 1.0),
    )
    ab = mean * (1.0 - mean) / var - 1.0
    prior_ok = (var > 0) & (var < mean * (1.0 - mean))
    alpha = F.when(prior_ok, mean * ab)
    beta = F.when(prior_ok, (1.0 - mean) * ab)
    p_raw = F.col("k").cast("double") / F.col("n").cast("double")
    p_shrunk = F.when(
        prior_ok,
        (F.col("k").cast("double") + alpha)
        / (F.col("n").cast("double") + alpha + beta),
    ).otherwise(p_raw)
    return m.select(
        *key_cols, "n", "k",
        F.round(p_raw, 6).alias("p_raw"),
        F.round(alpha, 6).alias("alpha"),
        F.round(beta, 6).alias("beta"),
        F.round(p_shrunk, 6).alias("p_shrunk"),
    )


def jonckheere_terpstra(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_order: list,
    scale: int = 1_000_000,
) -> DataFrame:
    """Jonckheere–Terpstra trend test — "do the group medians INCREASE
    along this ordering?" (dose-response, plan-tier, cohort-age): more
    powerful than Kruskal–Wallis when the alternative is ORDERED,
    because it only credits pairs that agree with the given order:

        J = Σ_{i<j} U_ij,   U_ij = #{x∈gᵢ, y∈gⱼ : x < y} + ½·ties

    computed EXACTLY via the kendall_tau_b cell-histogram trick: the
    (group, value) count grid is domain-sized; 2J (doubled to keep tied
    halves integral) is one theta-join over the broadcast grid — never
    the O(n²) row pairs. z uses the standard normal approximation

        μ = (n² − Σnᵢ²)/4,
        σ² = (n²(2n+3) − Σnᵢ²(2nᵢ+3))/72

    (the no-ties variance — the documented contract; with heavy ties
    prefer kruskal_wallis). Every count/moment is DECIMAL(38,0) exact;
    z is one IEEE sequence, round 6. Groups outside ``group_order``
    drop.

    Returns one row (k_groups, n, j2, z).
    """
    order_map = {g: i for i, g in enumerate(group_order)}
    g = F.col(group_col)
    rank_expr = F.lit(None).cast("int")
    for grp, i in order_map.items():
        rank_expr = F.when(g == grp, F.lit(i)).otherwise(rank_expr)
    v = F.round(F.col(value_col) * scale).cast("long")
    cells = (
        df.filter(F.col(value_col).isNotNull() & g.isin(group_order))
        .select(rank_expr.alias("_g"), v.alias("_v"))
        .groupBy("_g", "_v")
        .agg(F.count(F.lit(1)).cast(_D38).alias("_c"))
    )
    a = cells.select(
        F.col("_g").alias("_ga"), F.col("_v").alias("_va"),
        F.col("_c").alias("_ca"),
    )
    b = cells.select(
        F.col("_g").alias("_gb"), F.col("_v").alias("_vb"),
        F.col("_c").alias("_cb"),
    )
    zero = F.lit(0).cast(_D38)
    pairs = a.join(F.broadcast(b), F.col("_ga") < F.col("_gb")).agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("_va") < F.col("_vb"),
                    F.lit(2) * F.col("_ca") * F.col("_cb"),
                ).when(
                    F.col("_va") == F.col("_vb"),
                    F.col("_ca") * F.col("_cb"),
                ).otherwise(zero)
            ),
            zero,
        ).alias("_j2")
    )
    sizes = cells.groupBy("_g").agg(F.sum("_c").alias("_ng")).agg(
        F.count(F.lit(1)).alias("_k"),
        F.coalesce(F.sum("_ng"), zero).alias("_n"),
        F.coalesce(F.sum(F.col("_ng") * F.col("_ng")), zero).alias("_n2"),
        F.coalesce(
            F.sum(
                F.col("_ng") * F.col("_ng") * (F.lit(2) * F.col("_ng") + 3)
            ),
            zero,
        ).alias("_n23"),
    )
    j = pairs.crossJoin(F.broadcast(sizes))
    n, n2 = F.col("_n"), F.col("_n2")
    # μ and σ² exact integers up to the single /4, /72 divides
    mu2 = (n * n - n2).cast("double") / 2.0            # 2·μ
    var_num = (n * n * (F.lit(2) * n + 3) - F.col("_n23")).cast("double")
    sigma = F.sqrt(var_num / 72.0)
    zstat = F.when(
        var_num > 0,
        (F.col("_j2").cast("double") - mu2) / (F.lit(2.0) * sigma),
    )
    return j.select(
        F.col("_k").cast("long").alias("k_groups"),
        n.cast("long").alias("n"),
        F.col("_j2").cast("long").alias("j2"),
        F.round(zstat, 6).alias("z"),
    )


def correlation_ratio(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Correlation ratio η² — "how much of this metric's variance does
    the category explain?", the effect-size companion to
    :func:`oneway_anova` (F says whether the means differ; η² =
    SS_between/SS_total says how MUCH, on the 0–1 scale feature
    screens and dashboards want; η is its square root).

    Same one-pass exact micro-moment machinery as the ANOVA core
    (per-group n/Σv/Σv² as DECIMAL(38,0); ordered fold over the
    group-count-sized term array for engine-stable float sums). η² is
    NULL when total variance is zero. Returns one row (k_groups, n,
    eta2, eta).
    """
    vm = F.round(F.col(value_col) * 1_000_000).cast("long")
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("_g"), vm.alias("_vm")
    )
    anova = _anova_from_micro(base, "_g", "_vm")
    ssb, ssw = F.col("ss_between"), F.col("ss_within")
    eta2 = F.when(ssb + ssw > 0, ssb / (ssb + ssw))
    return anova.select(
        "k_groups",
        "n",
        F.round(eta2, 6).alias("eta2"),
        F.round(F.sqrt(eta2), 6).alias("eta"),
    )


def two_proportion_ztest(
    df: DataFrame,
    group_col: str,
    success_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-proportion z-test with the pooled-variance denominator — the
    conversion-rate A/B read (:func:`proportion_wilson_ci` gives each
    arm's interval; this gives the between-arm significance):

        p̂ = (k_a + k_b)/(n_a + n_b)
        z  = (p_a − p_b) / sqrt( p̂(1−p̂)·(1/n_a + 1/n_b) )

    Counts are exact integers from one pass; z is one IEEE sequence
    (NULL when the pooled variance is zero — all successes or all
    failures). NULL successes drop. Returns one row (n_a, k_a, n_b,
    k_b, p_a, p_b, z).
    """
    g = F.col(group_col)
    s = F.col(success_col)
    per = (
        df.filter(g.isin([group_a, group_b]) & s.isNotNull())
        .agg(
            F.sum(F.when(g == group_a, 1).otherwise(0)).alias("_na"),
            F.sum(F.when(g == group_a, s.cast("long")).otherwise(0)).alias(
                "_ka"
            ),
            F.sum(F.when(g == group_b, 1).otherwise(0)).alias("_nb"),
            F.sum(F.when(g == group_b, s.cast("long")).otherwise(0)).alias(
                "_kb"
            ),
        )
    )
    na, ka = F.col("_na").cast("double"), F.col("_ka").cast("double")
    nb, kb = F.col("_nb").cast("double"), F.col("_kb").cast("double")
    pa = F.try_divide(ka, na)
    pb = F.try_divide(kb, nb)
    pool = F.try_divide(ka + kb, na + nb)
    var = pool * (1.0 - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    z = F.when(var > 0, (pa - pb) / F.sqrt(var))
    return per.select(
        F.col("_na").alias("n_a"),
        F.col("_ka").alias("k_a"),
        F.col("_nb").alias("n_b"),
        F.col("_kb").alias("k_b"),
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round(z, 6).alias("z"),
    )


def odds_ratio(
    df: DataFrame,
    exposure_col: str,
    outcome_col: str,
    z: float = 1.96,
) -> DataFrame:
    """2×2 odds ratio with the Woolf log-OR interval — the
    epidemiology/risk read of a boolean exposure vs a boolean outcome
    (feature-flag vs crash, cohort vs churn):

        OR = (a·d)/(b·c)            (a=E∧O, b=E∧¬O, c=¬E∧O, d=¬E∧¬O)
        se(ln OR) = sqrt(1/a + 1/b + 1/c + 1/d)
        CI = exp(ln OR ± z·se)

    Cell counts are exact integers from one pass. Any empty cell makes
    OR/CI NULL (the standard undefined case — add a continuity
    correction upstream if you want Haldane-Anscombe). Rows with a NULL
    on either side drop. Returns one row (n_eo, n_en, n_ce, n_cn,
    odds_ratio, log_or, se_log_or, ci_lo, ci_hi).
    """
    e = F.col(exposure_col)
    o = F.col(outcome_col)
    per = df.filter(e.isNotNull() & o.isNotNull()).agg(
        F.sum((e & o).cast("long")).alias("_a"),
        F.sum((e & ~o).cast("long")).alias("_b"),
        F.sum((~e & o).cast("long")).alias("_c"),
        F.sum((~e & ~o).cast("long")).alias("_d"),
    )
    a, b = F.col("_a").cast("double"), F.col("_b").cast("double")
    c, d = F.col("_c").cast("double"), F.col("_d").cast("double")
    ok = (F.col("_a") > 0) & (F.col("_b") > 0) & (F.col("_c") > 0) & (
        F.col("_d") > 0
    )
    orr = F.when(ok, (a * d) / (b * c))
    lor = F.log(orr)
    se = F.when(ok, F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d))
    return per.select(
        F.col("_a").alias("n_eo"),
        F.col("_b").alias("n_en"),
        F.col("_c").alias("n_ce"),
        F.col("_d").alias("n_cn"),
        F.round(orr, 6).alias("odds_ratio"),
        F.round(lor, 6).alias("log_or"),
        F.round(se, 6).alias("se_log_or"),
        F.round(F.exp(lor - F.lit(z) * se), 6).alias("ci_lo"),
        F.round(F.exp(lor + F.lit(z) * se), 6).alias("ci_hi"),
    )


def kish_weighted_mean(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Survey-weighted mean with Kish's effective sample size and
    design effect — the numbers any weighted metric (post-stratified
    experiment readout, importance-weighted eval score) owes next to
    its point estimate:

        mean_w = Σ w·x / Σ w
        n_eff  = (Σ w)² / Σ w²          (Kish)
        deff   = n / n_eff              (≥ 1; weighting variance cost)

    Weights and values quantize to micro integers; all four moments
    (n, Σw, Σw², Σwx) accumulate as exact DECIMAL(38,0) in one
    map-side-combinable pass — Σwx is a micro² product formed in
    DECIMAL — and the three outputs are one IEEE sequence each.
    Rows with a NULL value are missing data, not invalid weights: they
    drop BEFORE any accounting. Among value-bearing rows, non-positive
    or NULL weights are EXCLUDED (a survey weight is a positive
    replication factor) and counted in ``n_excluded`` — so
    ``n_excluded > 0`` really does mean bad weights. Returns
    (keys..., n, n_excluded, mean_w, n_eff, deff).
    """
    wm = F.round(F.col(weight_col) * 1_000_000).cast("long").cast(_D38)
    xm = F.round(F.col(value_col) * 1_000_000).cast("long").cast(_D38)
    ok = F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    agg = df.filter(F.col(value_col).isNotNull()).groupBy(*keys).agg(
        F.sum(ok.cast("long")).alias("n"),
        F.sum((~ok).cast("long")).alias("n_excluded"),
        F.sum(F.when(ok, wm).otherwise(F.lit(0).cast(_D38))).alias("_sw"),
        F.sum(F.when(ok, wm * wm).otherwise(F.lit(0).cast(_D38))).alias(
            "_sww"
        ),
        F.sum(F.when(ok, wm * xm).otherwise(F.lit(0).cast(_D38))).alias(
            "_swx"
        ),
    )
    mean_w = F.try_divide(
        F.col("_swx").cast("double"), F.col("_sw").cast("double")
    ) / 1e6
    n_eff = F.try_divide(
        (F.col("_sw") * F.col("_sw")).cast("double"),
        F.col("_sww").cast("double"),
    )
    deff = F.try_divide(F.col("n").cast("double"), n_eff)
    return agg.select(
        *keys,
        "n",
        "n_excluded",
        F.round(mean_w, 6).alias("mean_w"),
        F.round(n_eff, 6).alias("n_eff"),
        F.round(deff, 6).alias("deff"),
    )


def cochran_armitage_trend(
    df: DataFrame,
    group_col: str,
    success_col: str,
    group_scores: dict,
) -> DataFrame:
    """Cochran–Armitage test for a LINEAR TREND in proportions across
    ordered/scored groups (dose tiers, plan levels, cohort ages) — the
    proportions sibling of :func:`jonckheere_terpstra`:

        T = Σ_i k_i·w_i  −  p̂·Σ_i n_i·w_i
        var(T) = p̂(1−p̂)·( Σ n_i·w_i²  −  (Σ n_i·w_i)²/n )
        z = T/√var(T)

    with w_i the caller's group scores and p̂ the pooled rate. Scores
    snap to micro integers so every moment (n_i, k_i, Σn w, Σk w,
    Σn w²) is an exact DECIMAL(38,0); T's numerator is cross-multiplied
    exact (n·Σkw − Σk·Σnw over the common n denominator) and z is one
    IEEE sequence. Groups outside ``group_scores`` drop; degenerate
    inputs (p̂ ∈ {0,1} or zero score variance) report NULL z.

    Returns one row (k_groups, n, k_total, z).
    """
    score_micro = {g: int(round(float(v) * 1_000_000))
                   for g, v in group_scores.items()}
    g = F.col(group_col)
    s = F.col(success_col)
    w = F.lit(None).cast("long")
    for grp, sm in score_micro.items():
        w = F.when(g == grp, F.lit(sm)).otherwise(w)
    per = (
        df.filter(g.isin(list(group_scores)) & s.isNotNull())
        .select(
            g.alias("_g"), w.cast(_D38).alias("_w"),
            s.cast("long").alias("_s"),
        )
        .agg(
            F.count(F.lit(1)).cast(_D38).alias("_n"),
            F.sum("_s").cast(_D38).alias("_k"),
            F.sum(F.col("_w")).alias("_nw"),
            F.sum(F.col("_w") * F.col("_s")).alias("_kw"),
            F.sum(F.col("_w") * F.col("_w")).alias("_nww"),
            # the GROUP label, not the quantized score — two groups
            # deliberately sharing a score must still count as two
            F.count_distinct(F.col("_g")).alias("_kg"),
        )
    )
    n = F.col("_n")
    # T·n = n·Σkw − Σk·Σnw (exact); var·n³ = k(n−k)·(n·Σnw² − (Σnw)²)
    t_num = (n * F.col("_kw") - F.col("_k") * F.col("_nw")).cast("double")
    var_core = (n * F.col("_nww") - F.col("_nw") * F.col("_nw"))
    var_num = (F.col("_k") * (n - F.col("_k"))).cast("double") * var_core.cast(
        "double"
    )
    # z = (T·n) / sqrt(k(n−k)/n · var_core · n) — fold the n powers:
    # T = t_num/n; var(T) = var_num/n³ ⇒ z = t_num / sqrt(var_num·n⁻¹·n²)
    # = t_num / (sqrt(var_num) · sqrt(n))... keep it as one explicit
    # sequence: z = (t_num/n) / sqrt(var_num/n³)
    nd = n.cast("double")
    z = F.when(
        (var_core > 0) & (F.col("_k") > 0) & (F.col("_k") < n),
        (t_num / nd) / F.sqrt(var_num / (nd * nd * nd)),
    )
    return per.select(
        F.col("_kg").cast("long").alias("k_groups"),
        n.cast("long").alias("n"),
        F.col("_k").cast("long").alias("k_total"),
        F.round(z, 6).alias("z"),
    )


def mantel_haenszel_or(
    df: DataFrame,
    stratum_cols: list[str],
    exposure_col: str,
    outcome_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Mantel–Haenszel pooled odds ratio across strata — the
    confounder-adjusted 2×2 readout (:func:`odds_ratio` collapses the
    table and eats Simpson's paradox; MH pools WITHIN-stratum odds):

        OR_MH = Σ_i (a_i·d_i/n_i) / Σ_i (b_i·c_i/n_i)

    with the Robins–Breslow–Greenland variance for the CI:

        var(ln OR) = ΣPR/(2R²) + Σ(PS+QR)/(2RS) + ΣQS/(2S²),
        P=(a+d)/n, Q=(b+c)/n, R_i=a·d/n, S_i=b·c/n.

    Cells accumulate exact; the five per-stratum double terms (R, S,
    PR, PS+QR, QS — each ONE fixed IEEE sequence over exact cells) are
    FLOOR-nano quantized before summation (the loglog/zipf order-free
    float-sum discipline), so the pooled sums are partition-order
    independent. Strata with an empty margin contribute their exact
    zeros naturally (R=S=0). Degenerate pools (R or S zero) report
    NULL OR/CI. Returns one row
    (k_strata, n, or_mh, log_or_mh, se_log_or, ci_lo, ci_hi).
    """
    e = F.col(exposure_col).cast("boolean")
    o = F.col(outcome_col).cast("boolean")
    cells = (
        df.filter(e.isNotNull() & o.isNotNull())
        .groupBy(*stratum_cols)
        .agg(
            F.sum((e & o).cast("long")).alias("_a"),
            F.sum((e & ~o).cast("long")).alias("_b"),
            F.sum((~e & o).cast("long")).alias("_c"),
            F.sum((~e & ~o).cast("long")).alias("_d"),
        )
    )
    a, b, c, d = (F.col(x).cast("double") for x in ("_a", "_b", "_c", "_d"))
    n = a + b + c + d
    r = a * d / n
    s = b * c / n
    p = (a + d) / n
    q = (b + c) / n
    nano = 1_000_000_000

    def _nsum(term):
        return F.sum(F.floor(term * nano).cast("long").cast(_D38))

    m = cells.agg(
        F.count(F.lit(1)).cast("long").alias("k_strata"),
        F.sum(F.col("_a") + F.col("_b") + F.col("_c") + F.col("_d")).alias(
            "_n"
        ),
        _nsum(r).alias("_sr"),
        _nsum(s).alias("_ss"),
        _nsum(p * r).alias("_spr"),
        _nsum(p * s + q * r).alias("_spsqr"),
        _nsum(q * s).alias("_sqs"),
    )
    sr = F.col("_sr").cast("double") / nano
    ss = F.col("_ss").cast("double") / nano
    ok = (F.col("_sr") > 0) & (F.col("_ss") > 0)
    orm = F.when(ok, sr / ss)
    lor = F.log(orm)
    var = (
        (F.col("_spr").cast("double") / nano) / (2.0 * sr * sr)
        + (F.col("_spsqr").cast("double") / nano) / (2.0 * sr * ss)
        + (F.col("_sqs").cast("double") / nano) / (2.0 * ss * ss)
    )
    se = F.when(ok, F.sqrt(var))
    return m.select(
        "k_strata",
        F.col("_n").cast("long").alias("n"),
        F.round(orm, 6).alias("or_mh"),
        F.round(lor, 6).alias("log_or_mh"),
        F.round(se, 6).alias("se_log_or"),
        F.round(F.exp(lor - F.lit(z) * se), 6).alias("ci_lo"),
        F.round(F.exp(lor + F.lit(z) * se), 6).alias("ci_hi"),
    )


def mcnemar_paired(
    df: DataFrame, before_col: str, after_col: str
) -> DataFrame:
    """McNemar's test for PAIRED binary outcomes (same unit measured
    twice — did the flip rate move?): only the discordant cells carry
    information,

        b = #(1→0),  c = #(0→1),
        χ² = (b−c)²/(b+c),  χ²_cc = (|b−c|−1)²/(b+c)  (continuity),
        z = (b−c)/√(b+c)

    — the within-subject sibling of :func:`two_proportion_ztest`
    (which would wrongly treat the two measurements as independent
    samples). One exact four-cell aggregation; each statistic is one
    IEEE sequence over the exact cells. Degenerate b+c=0 (no
    discordant pairs) reports NULL statistics. Returns one row
    (n, n_concordant, b, c, chi2, chi2_cc, z).
    """
    x = F.col(before_col).cast("boolean")
    y = F.col(after_col).cast("boolean")
    m = df.filter(x.isNotNull() & y.isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((x == y).cast("long")).alias("n_concordant"),
        F.sum((x & ~y).cast("long")).alias("b"),
        F.sum((~x & y).cast("long")).alias("c"),
    )
    b = F.col("b").cast("double")
    c = F.col("c").cast("double")
    bc = b + c
    ok = bc > 0
    chi2 = F.when(ok, (b - c) * (b - c) / bc)
    cc = F.abs(b - c) - 1.0
    chi2_cc = F.when(ok, cc * cc / bc)
    zst = F.when(ok, (b - c) / F.sqrt(bc))
    return m.select(
        "n",
        "n_concordant",
        "b",
        "c",
        F.round(chi2, 6).alias("chi2"),
        F.round(chi2_cc, 6).alias("chi2_cc"),
        (F.round(zst, 6) + F.lit(0.0)).alias("z"),
    )


def _two_group_value_grid(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Shared scaffold of the two-sample distribution operators
    (:func:`wasserstein_1d`, :func:`energy_distance_1d`,
    :func:`cliffs_delta`): micro-quantized values, one groupBy onto the
    DISTINCT-value relation with per-group counts (_v, _ca, _cb)."""
    g = F.col(group_col)
    vm = F.round(F.col(value_col) * 1_000_000).cast("long")
    return (
        df.filter(g.isin([group_a, group_b]) & F.col(value_col).isNotNull())
        .select((g == group_a).alias("_isa"), vm.alias("_v"))
        .groupBy("_v")
        .agg(
            F.sum(F.col("_isa").cast("long")).cast(_D38).alias("_ca"),
            F.sum((~F.col("_isa")).cast("long")).cast(_D38).alias("_cb"),
        )
    )


def _grid_cumulative(per: DataFrame) -> DataFrame:
    """Ordered cumulative view of the value grid: cumulative group
    counts, segment width to the next value, group totals."""
    wv = W.orderBy("_v")
    return per.select(
        "_v",
        F.sum("_ca").over(wv).alias("_cuma"),
        F.sum("_cb").over(wv).alias("_cumb"),
        (F.lead("_v", 1).over(wv) - F.col("_v")).cast(_D38).alias("_dx"),
        F.sum("_ca").over(W.partitionBy()).alias("_na"),
        F.sum("_cb").over(W.partitionBy()).alias("_nb"),
    )


def wasserstein_1d(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth-mover) distance between two
    groups' value distributions — the metric drift/shift score that,
    unlike KS (sup of the gap) or PSI (binned), weighs HOW FAR mass
    moved, in the value's own units:

        W1 = ∫ |F_a(x) − F_b(x)| dx
           = Σ_segments |C_a·n_b − C_b·n_a| · Δx / (n_a·n_b)

    over the DISTINCT-value relation. Values micro-quantize, so every
    segment term is an exact DECIMAL(38,0) product (cumulative counts ×
    opposite total × segment width) — the whole sum is exact integers,
    order-free with no nano-flooring needed, and ONE final divide
    descales it. Cumulative counts are windows over the value-domain
    relation ordered by value (the ks_test domain-size contract: the
    distinct-value relation must fit a partition; raw rows never enter
    a window). Returns one row (n_a, n_b, n_values, w1).
    """
    cum = _grid_cumulative(
        _two_group_value_grid(df, group_col, value_col, group_a, group_b)
    )
    seg = F.abs(
        F.col("_cuma") * F.col("_nb") - F.col("_cumb") * F.col("_na")
    ) * F.col("_dx")
    m = cum.agg(
        F.max("_na").alias("_tna"),
        F.max("_nb").alias("_tnb"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
        # a single shared value has no segment — the true W1 between
        # point masses at the same value is 0, not NULL (review catch:
        # the oracle mirrored the NULL, a gate-green wrong value)
        F.coalesce(
            F.sum(F.when(F.col("_dx").isNotNull(), seg)),
            F.lit(0).cast(_D38),
        ).alias("_num"),
    )
    w1 = F.try_divide(
        F.col("_num").cast("double"),
        (F.col("_tna") * F.col("_tnb")).cast("double"),
    ) / 1e6
    return m.select(
        F.col("_tna").cast("long").alias("n_a"),
        F.col("_tnb").cast("long").alias("n_b"),
        "n_values",
        F.round(w1, 6).alias("w1"),
    )


def _friedman_moments(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
) -> DataFrame:
    """Shared moment relation of :func:`friedman_test` and
    :func:`kendalls_w`: one row (k_treatments, n_blocks, _num4, _sa4)
    of exact doubled-rank moments over the complete blocks. Cells
    pre-aggregate to one row per (block, treatment); only COMPLETE
    blocks (all k treatments present) enter — k is the global
    distinct-treatment count (a 1-row lazy broadcast, the allowlisted
    scalar pattern).
    """
    vm = F.round(F.col(value_col) * 1_000_000).cast("long").cast(_D38)
    cells = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(block_col, treatment_col)
        # exact micro-int cell sums — a raw double sum is partition-
        # order dependent and can flip a rank at a near-tie
        .agg(F.sum(vm).alias("_v"))
    )
    kk = cells.agg(
        F.count_distinct(F.col(treatment_col)).cast("long").alias("_k")
    )
    complete = (
        cells.groupBy(block_col)
        .agg(F.count(F.lit(1)).alias("_ct"))
        .join(F.broadcast(kk), F.col("_ct") == F.col("_k"))
        .select(block_col, "_k")
    )
    ranked = cells.join(complete, block_col)
    wb = W.partitionBy(block_col).orderBy("_v")
    wtie = W.partitionBy(block_col, "_v")
    # doubled average rank: 2·min_rank + (ties − 1) — an exact integer
    r2 = (
        2 * F.rank().over(wb) + F.count(F.lit(1)).over(wtie) - 1
    ).cast("long").cast(_D38)
    per_treat = (
        ranked.select(
            block_col, F.col(treatment_col).alias("_tr"), "_k",
            r2.alias("_r2"),
        )
        .groupBy("_tr")
        .agg(
            F.first("_k").alias("_k"),
            F.count(F.lit(1)).cast(_D38).alias("_n"),
            F.sum("_r2").alias("_R2"),
            F.sum(F.col("_r2") * F.col("_r2")).alias("_A4"),
        )
    )
    k = F.col("_k").cast(_D38)
    n = F.col("_n")
    # center 2·R_j at n(k+1); Σ(2R−n(k+1))² = 4·Σ(R−n(k+1)/2)²;
    # A₁−C₁ = (ΣA4 − n·k·(k+1)²)/4 — the 4s cancel in the ratio
    m = per_treat.agg(
        F.first("_k").cast("long").alias("k_treatments"),
        F.first("_n").cast("long").alias("n_blocks"),
        F.sum(
            (F.col("_R2") - n * (k + 1)) * (F.col("_R2") - n * (k + 1))
        ).alias("_num4"),
        F.sum("_A4").alias("_sa4"),
    )
    return m


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
) -> DataFrame:
    """Friedman rank test for k related treatments over n blocks (the
    repeated-measures sibling of :func:`kruskal_wallis` — each block
    ranks ITS OWN k cells, so between-block level shifts can't drown
    the treatment signal). Conover's tie-corrected form:

        T = (k−1) · Σ_j (R_j − n(k+1)/2)² / (A₁ − C₁),
        A₁ = Σ_ij r_ij²,  C₁ = n·k·(k+1)²/4

    (reduces to the classic 12/(nk(k+1))·ΣR_j² − 3n(k+1) when no
    ties). Cell values micro-quantize to exact integers before the
    cell sum; average ranks are kept EXACT as doubled integers
    (2·rank = 2·min_rank + ties − 1), so every moment is an exact
    DECIMAL and T is one final divide. Only COMPLETE blocks enter.
    Degenerate inputs (all ranks tied: A₁ = C₁) report NULL.
    Returns one row (k_treatments, n_blocks, t_stat).
    """
    m = _friedman_moments(df, block_col, treatment_col, value_col)
    t = _friedman_t(m)
    return m.select(
        "k_treatments", "n_blocks", F.round(t, 6).alias("t_stat")
    )


def _friedman_t(m: DataFrame):
    """Conover T expression over the :func:`_friedman_moments` row."""
    kp1 = F.col("k_treatments").cast(_D38) + 1
    c14 = (
        F.col("n_blocks").cast(_D38)
        * F.col("k_treatments").cast(_D38)
        * kp1
        * kp1
    )
    den = F.col("_sa4") - c14
    return F.when(
        den > 0,
        (F.col("k_treatments") - 1).cast("double")
        * F.col("_num4").cast("double") / den.cast("double"),
    )


def kendalls_w(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
) -> DataFrame:
    """Kendall's coefficient of concordance W — how strongly the n
    blocks AGREE on the ranking of the k treatments (1 = every block
    ranks identically, 0 = no agreement), the effect-size companion to
    :func:`friedman_test` via the exact identity W = T / (n·(k−1))
    (tie-corrected throughout, same moments, same plan — computed from
    the UNROUNDED T expression, not the rounded report). Returns one
    row (k_treatments, n_blocks, w).
    """
    m = _friedman_moments(df, block_col, treatment_col, value_col)
    w = _friedman_t(m) / (
        F.col("n_blocks").cast("double")
        * (F.col("k_treatments") - 1).cast("double")
    )
    return m.select(
        "k_treatments", "n_blocks", F.round(w, 6).alias("w")
    )


def cochran_q(
    df: DataFrame,
    unit_col: str,
    treatment_col: str,
    success_col: str,
) -> DataFrame:
    """Cochran's Q for k related BINARY treatments over matched units —
    the k-treatment generalization of :func:`mcnemar_paired` (k=2
    reduces to McNemar without continuity correction):

        Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²)    ~ χ²_{k−1}

    with C_j the per-treatment success totals, R_i the per-unit
    success totals, N total successes — EVERY term an exact integer,
    one final divide. The design must be complete (each unit one
    binary cell per treatment — build reach relations by crossing the
    unit universe with the treatment list upstream); incomplete input
    raises in-plan via the same raise_error guard discipline as
    mann_kendall's fat-key cap. Degenerate denominators (all units
    all-success or all-failure) report NULL. Returns one row
    (k_treatments, n_units, n_success, q_stat).
    """
    s = F.col(success_col).cast("boolean").cast("long")
    cells = df.select(
        F.col(unit_col).alias("_u"), F.col(treatment_col).alias("_tr"),
        s.alias("_s"),
    )
    per_unit = cells.groupBy("_u").agg(
        F.count(F.lit(1)).alias("_kt"),
        F.count_distinct(F.col("_tr")).alias("_ktd"),
        F.sum("_s").cast(_D38).alias("_ri"),
    )
    # complete = every unit has the same treatment count AND no unit
    # repeats a treatment (a (t1, t1, t3) unit passes a count-only
    # check while silently double-counting — review catch); an EMPTY
    # input is not an incomplete design, it reports the NULL row like
    # every sibling operator
    k_chk = per_unit.agg(
        F.count(F.lit(1)).alias("_nu"),
        F.count_distinct(F.col("_kt")).alias("_nk"),
        F.first("_kt").alias("_k1"),
        F.max((F.col("_kt") != F.col("_ktd")).cast("int")).alias("_dup"),
    ).select(
        F.when(F.col("_nu") == 0, F.lit(None).cast("long"))
        .when(
            (F.col("_nk") == 1) & (F.col("_dup") == 0), F.col("_k1")
        )
        .otherwise(
            F.raise_error(
                F.lit("cochran_q: incomplete design — units differ in "
                      "treatment count or repeat a treatment")
            ).cast("long")
        ).alias("_k")
    )
    per_treat = cells.groupBy("_tr").agg(F.sum("_s").cast(_D38).alias("_cj"))
    mt = per_treat.agg(
        F.sum("_cj").alias("_N"),
        F.sum(F.col("_cj") * F.col("_cj")).alias("_sc2"),
    )
    mu = per_unit.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum(F.col("_ri") * F.col("_ri")).alias("_sr2"),
    )
    m = mt.crossJoin(F.broadcast(mu)).crossJoin(F.broadcast(k_chk))
    # k_treatments is read FROM the guarded column — the completeness
    # raise_error must sit inside a CONSUMED expression or Catalyst
    # prunes it away with the dead column (the chi_square_gof lesson)
    kd = F.col("_k").cast(_D38)
    num = (kd - 1) * (kd * F.col("_sc2") - F.col("_N") * F.col("_N"))
    den = kd * F.col("_N") - F.col("_sr2")
    q = F.when(den > 0, num.cast("double") / den.cast("double"))
    return m.select(
        F.col("_k").cast("long").alias("k_treatments"),
        "n_units",
        F.col("_N").cast("long").alias("n_success"),
        F.round(q, 6).alias("q_stat"),
    )


def cliffs_delta(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Cliff's delta ordinal effect size between two groups —
    P(x > y) − P(x < y) over all cross pairs, the assumption-free
    companion to :func:`effect_size_two_sample` (Cohen's d says how
    many SDs apart; δ says how often one group actually wins):

        δ = (#{x>y} − #{x<y}) / (n_a·n_b) ∈ [−1, 1]

    Never the O(n_a·n_b) pair relation: per distinct value v the win
    counts fold as c_a(v)·C_b(<v) over the VALUE-DOMAIN relation (the
    kendall/ks grid discipline — cumulative counts from one ordered
    window over distinct values), every term an exact DECIMAL, one
    final divide. Returns one row (n_a, n_b, n_gt, n_lt, delta).
    """
    per = _two_group_value_grid(df, group_col, value_col, group_a, group_b)
    wv = W.orderBy("_v").rowsBetween(W.unboundedPreceding, -1)
    cum = per.select(
        "_ca",
        "_cb",
        F.coalesce(F.sum("_cb").over(wv), F.lit(0).cast(_D38)).alias(
            "_cumb_lt"
        ),
        F.coalesce(F.sum("_ca").over(wv), F.lit(0).cast(_D38)).alias(
            "_cuma_lt"
        ),
    )
    m = cum.agg(
        F.sum("_ca").cast("long").alias("n_a"),
        F.sum("_cb").cast("long").alias("n_b"),
        F.sum(F.col("_ca") * F.col("_cumb_lt")).alias("_gt"),
        F.sum(F.col("_cb") * F.col("_cuma_lt")).alias("_lt"),
    )
    delta = F.try_divide(
        (F.col("_gt") - F.col("_lt")).cast("double"),
        (F.col("n_a").cast(_D38) * F.col("n_b").cast(_D38)).cast("double"),
    )
    return m.select(
        "n_a",
        "n_b",
        F.col("_gt").cast("long").alias("n_gt"),
        F.col("_lt").cast("long").alias("n_lt"),
        (F.round(delta, 6) + F.lit(0.0)).alias("delta"),
    )


def cronbach_alpha(
    df: DataFrame,
    unit_col: str,
    item_col: str,
    value_col: str,
) -> DataFrame:
    """Cronbach's alpha internal-consistency reliability of k items
    measured across units (do the per-item signals move together
    enough to be read as ONE scale?):

        α = k/(k−1) · (1 − Σ_i Var(item_i) / Var(Σ_i items))

    over the IMPLICIT-ZERO complete design: a (unit, item) pair absent
    from the input is a true 0 measurement (the reach/engagement
    framing), so per-item population variance over ALL U units is the
    exact-moment identity (U·Σv² − (Σv)²)/U² — absent pairs add zero
    to both sums and only U (a 1-row lazy broadcast) sees them. Values
    micro-quantize; both variance aggregates are exact DECIMAL; α is
    one IEEE sequence. Degenerate total variance reports NULL.
    Returns one row (k_items, n_units, alpha).
    """
    vm = F.round(F.col(value_col) * 1_000_000).cast("long").cast(_D38)
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(unit_col).alias("_u"), F.col(item_col).alias("_it"),
        vm.alias("_v"),
    )
    uu = base.agg(F.count_distinct(F.col("_u")).cast(_D38).alias("_U"))
    # the same 1-row relation enters two branches that later cross-join
    # back together — rename per branch or the reused attribute id is
    # ambiguous at the final join
    uu_i = uu.select(F.col("_U").alias("_U_i"))
    uu_t = uu.select(F.col("_U").alias("_U_t"))
    per_item = base.groupBy("_it").agg(
        F.sum("_v").alias("_s"), F.sum(F.col("_v") * F.col("_v")).alias("_q")
    )
    # item-variance numerators Σ(U·Σv² − (Σv)²) — exact; the common /U²
    # factor cancels against the total-variance denominator
    mi = per_item.crossJoin(F.broadcast(uu_i)).agg(
        F.count(F.lit(1)).cast("long").alias("k_items"),
        F.sum(
            F.col("_U_i") * F.col("_q") - F.col("_s") * F.col("_s")
        ).alias("_iv"),
    )
    per_unit = base.groupBy("_u").agg(F.sum("_v").alias("_t"))
    mu = per_unit.crossJoin(F.broadcast(uu_t)).agg(
        F.first("_U_t").alias("_Ut"),
        (
            F.first("_U_t") * F.sum(F.col("_t") * F.col("_t"))
            - F.sum("_t") * F.sum("_t")
        ).alias("_tv"),
    )
    m = mi.crossJoin(F.broadcast(mu))
    kd = F.col("k_items").cast("double")
    alpha = F.when(
        (F.col("_tv") > 0) & (F.col("k_items") > 1),
        kd / (kd - 1.0)
        * (1.0 - F.col("_iv").cast("double") / F.col("_tv").cast("double")),
    )
    return m.select(
        "k_items",
        F.col("_Ut").cast("long").alias("n_units"),
        F.round(alpha, 6).alias("alpha"),
    )


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_buckets: int = 20,
) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration curve of a
    binary-outcome rate against a score — THE standard probability
    calibrator (Zadrozny–Elkan), fit distributively via the minimax
    identity instead of the sequential pool-adjacent-violators stack:

        iso(i) = max_{j≤i} min_{k≥i} mean(y over buckets j..k)

    which equals the PAVA solution exactly (Robertson–Wright–Dykstra,
    *Order Restricted Statistical Inference*, the max-min formula) —
    tests/test_stats_reference_pins.py pins this plan against the
    hand-pooled PAVA solution on a violating fixture. Scores bucket into
    ``n_buckets`` equal-width bins (the bucket grid is the fit's
    resolution); all candidate means are exact-integer prefix-sum
    ratios (Σy, Σ1 per prefix), compared in double (one divide per
    (j,k) cell of the B²-sized grid — the kendall domain-grid
    discipline, never row pairs). Weighted by bucket mass, the fit
    minimizes squared error among all monotone curves. Empty buckets
    carry no row. Returns (bucket, n, rate_raw, rate_iso) ordered by
    bucket.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("boolean").cast("long")
    b = F.least(
        F.greatest(F.floor(s * n_buckets).cast("int"), F.lit(0)),
        F.lit(n_buckets - 1),
    )
    per = (
        df.filter(s.isNotNull() & F.col(label_col).isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(y).cast("long").alias("_k"),
        )
    )
    wc = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    pre = per.select(
        "bucket",
        "n",
        "_k",
        F.sum("n").over(wc).cast(_D38).alias("_cn"),
        F.sum("_k").over(wc).cast(_D38).alias("_ck"),
    )
    # B²/2 candidate segment means (j..k]: (ck_k − ck_{j−1})/(cn_k −
    # cn_{j−1}); j indexed by its PREDECESSOR prefix row (zero row for
    # j at the start)
    lo = pre.select(
        F.col("bucket").alias("_jb"),
        F.col("_cn").alias("_cnj"),
        F.col("_ck").alias("_ckj"),
    ).unionByName(
        pre.sparkSession.createDataFrame(
            [(-1,)], "_jb int"
        ).select(
            F.col("_jb").cast(per.schema["bucket"].dataType),
            F.lit(0).cast(_D38).alias("_cnj"),
            F.lit(0).cast(_D38).alias("_ckj"),
        )
    )
    hi = pre.select(
        F.col("bucket").alias("_kb"),
        F.col("_cn").alias("_cnk"),
        F.col("_ck").alias("_ckk"),
    )
    seg = lo.join(hi, F.col("_kb") > F.col("_jb")).select(
        "_jb",
        "_kb",
        (
            (F.col("_ckk") - F.col("_ckj")).cast("double")
            / (F.col("_cnk") - F.col("_cnj")).cast("double")
        ).alias("_mean"),
    )
    # min over k ≥ i of segment means starting after j: suffix-min per
    # start, then iso(i) = max over starts j ≤ i
    wmin = W.partitionBy("_jb").orderBy(F.col("_kb").desc())
    sufmin = seg.select(
        "_jb", "_kb", F.min("_mean").over(
            wmin.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("_minmean"),
    )
    # suffix-min row (j, k=i) carries min_{k' ≥ i} mean(j..k') (the
    # _kb-desc ordering accumulates from the top); iso(i) is then the
    # max over the starts j < i — a plain aggregation, no window
    iso = sufmin.groupBy(F.col("_kb").alias("bucket")).agg(
        F.max("_minmean").alias("_iso")
    )
    return (
        per.join(iso, "bucket")
        .select(
            "bucket",
            "n",
            F.round(
                F.col("_k").cast("double") / F.col("n").cast("double"), 6
            ).alias("rate_raw"),
            F.round(F.col("_iso"), 6).alias("rate_iso"),
        )
        .orderBy("bucket")
    )


def energy_distance_1d(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Exact 1-D energy distance between two groups — the
    characteristic-function two-sample metric (Székely–Rizzo; zero iff
    the distributions are equal, the basis of the energy two-sample
    test), computed EXACTLY from the same distinct-value grid as
    :func:`wasserstein_1d`:

        D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'|

    Each pairwise-|difference| expectation folds over value segments:
    crossing-pair counts × segment width — Σ|v−w| over two multisets
    is Σ_segments (cum_left·(n_right−cum_right) + cum_right·(n_left−
    cum_left))·Δ, every term an exact DECIMAL product, one divide per
    expectation at the end. No sampling, no row pairs, no float sums.
    Returns one row (n_a, n_b, e_xy, e_xx, e_yy, energy_d2).
    """
    cum = _grid_cumulative(
        _two_group_value_grid(df, group_col, value_col, group_a, group_b)
    )

    def _crossing(cl, nl, cr, nr):
        return (
            F.col(cl) * (F.col(nr) - F.col(cr))
            + F.col(cr) * (F.col(nl) - F.col(cl))
        ) * F.col("_dx")

    live = F.col("_dx").isNotNull()
    z38 = F.lit(0).cast(_D38)
    # coalesce: a single shared value has no segments — every pairwise
    # expectation is truly 0 there, not NULL (same review catch as W1)
    m = cum.agg(
        F.max("_na").alias("_tna"),
        F.max("_nb").alias("_tnb"),
        F.coalesce(
            F.sum(F.when(live, _crossing("_cuma", "_na", "_cumb", "_nb"))),
            z38,
        ).alias("_sxy"),
        F.coalesce(
            F.sum(
                F.when(live, (F.col("_cuma") * (F.col("_na") - F.col("_cuma")))
                       * F.lit(2).cast(_D38) * F.col("_dx"))
            ),
            z38,
        ).alias("_sxx"),
        F.coalesce(
            F.sum(
                F.when(live, (F.col("_cumb") * (F.col("_nb") - F.col("_cumb")))
                       * F.lit(2).cast(_D38) * F.col("_dx"))
            ),
            z38,
        ).alias("_syy"),
    )
    na = F.col("_tna")
    nb = F.col("_tnb")
    exy = F.try_divide(
        F.col("_sxy").cast("double"), (na * nb).cast("double")
    ) / 1e6
    exx = F.try_divide(
        F.col("_sxx").cast("double"), (na * na).cast("double")
    ) / 1e6
    eyy = F.try_divide(
        F.col("_syy").cast("double"), (nb * nb).cast("double")
    ) / 1e6
    return m.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(exy, 6).alias("e_xy"),
        F.round(exx, 6).alias("e_xx"),
        F.round(eyy, 6).alias("e_yy"),
        F.round(2.0 * exy - exx - eyy, 6).alias("energy_d2"),
    )


def cramer_von_mises_2samp(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-sample Cramér–von Mises statistic — the INTEGRATED-gap
    companion to :func:`ks_two_sample` (KS reads only the worst point;
    CvM accumulates (F_a − F_b)² over every pooled observation, so many
    moderate gaps register where KS sees none):

        T = n_a·n_b/(n_a+n_b)² · Σ_pooled (F_a(x) − F_b(x))²

    summed over OBSERVATIONS (a value with c copies contributes c
    terms). Every summand is exact: the squared gap's numerator is
    (C_a·n_b − C_b·n_a)², weighted by the value's pooled count — all
    DECIMAL(38,0) over the distinct-value grid — and T is one IEEE
    sequence over casts of the exact totals. Returns one row
    (n_a, n_b, t_cvm).
    """
    cum = _grid_cumulative(
        _two_group_value_grid(df, group_col, value_col, group_a, group_b)
    )
    gap = F.col("_cuma") * F.col("_nb") - F.col("_cumb") * F.col("_na")
    # per-value pooled count = step of the cumulative sums
    wv = W.orderBy("_v")
    stepped = cum.select(
        "_cuma", "_cumb", "_na", "_nb",
        (
            F.col("_cuma") - F.coalesce(
                F.lag("_cuma", 1).over(wv), F.lit(0).cast(_D38)
            )
            + F.col("_cumb") - F.coalesce(
                F.lag("_cumb", 1).over(wv), F.lit(0).cast(_D38)
            )
        ).alias("_w"),
        (gap * gap).alias("_g2"),
    )
    m = stepped.agg(
        F.max("_na").alias("_tna"),
        F.max("_nb").alias("_tnb"),
        F.coalesce(
            F.sum(F.col("_w") * F.col("_g2")), F.lit(0).cast(_D38)
        ).alias("_s"),
    )
    na = F.col("_tna").cast("double")
    nb = F.col("_tnb").cast("double")
    nn = na + nb
    # Σ w·gap² is (na·nb)²-scaled: divide once by (na·nb)², then the
    # standard na·nb/(na+nb)² prefactor
    t = (
        (na * nb) / (nn * nn)
        * (F.col("_s").cast("double") / ((na * nb) * (na * nb)))
    )
    return m.select(
        F.col("_tna").cast("long").alias("n_a"),
        F.col("_tnb").cast("long").alias("n_b"),
        F.round(t, 6).alias("t_cvm"),
    )


def kuiper_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-sample Kuiper statistic V = D⁺ + D⁻ — the
    tail-equal-sensitive variant of :func:`ks_two_sample` (KS's single
    sup under-weights one-side-up/other-side-down shape differences;
    Kuiper adds the two signed sups, and is the standard choice for
    circular/wrap-around domains like time-of-day). Both sups are
    maxima of exact signed DECIMAL gap numerators over the
    distinct-value grid; V is one IEEE sequence. Returns one row
    (n_a, n_b, d_plus, d_minus, v).
    """
    cum = _grid_cumulative(
        _two_group_value_grid(df, group_col, value_col, group_a, group_b)
    )
    gap = F.col("_cuma") * F.col("_nb") - F.col("_cumb") * F.col("_na")
    m = cum.agg(
        F.max("_na").alias("_tna"),
        F.max("_nb").alias("_tnb"),
        F.coalesce(
            F.greatest(F.max(gap), F.lit(0).cast(_D38)),
            F.lit(0).cast(_D38),
        ).alias("_dp"),
        F.coalesce(
            F.greatest(F.max(-gap), F.lit(0).cast(_D38)),
            F.lit(0).cast(_D38),
        ).alias("_dm"),
    )
    den = (F.col("_tna") * F.col("_tnb")).cast("double")
    dp = F.col("_dp").cast("double") / den
    dm = F.col("_dm").cast("double") / den
    return m.select(
        F.col("_tna").cast("long").alias("n_a"),
        F.col("_tnb").cast("long").alias("n_b"),
        F.round(dp, 6).alias("d_plus"),
        F.round(dm, 6).alias("d_minus"),
        F.round(dp + dm, 6).alias("v_kuiper"),
    )


def hellinger_binned(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    bin_width: float,
) -> DataFrame:
    """Hellinger distance between two groups' BINNED value
    distributions — the bounded [0, 1] geometry-friendly member of the
    divergence family next to PSI and JSD (finite on disjoint
    supports, symmetric, a true metric):

        BC = Σ_bins √(p_i·q_i),   H = √(1 − BC)

    Bins are fixed-width floors (value div ``bin_width``), counts
    exact; each bin's √(a_i·b_i) is one IEEE sequence over exact
    integers, FLOOR-nano quantized before the Σ over the bin relation
    (order-free float-sum discipline), and BC normalizes by the exact
    √(n_a·n_b) once at the end. Empty-side bins contribute exactly 0.
    Degenerate (either group empty) reports NULL. Returns one row
    (n_a, n_b, n_bins, bc, hellinger).
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    g = F.col(group_col)
    b = F.floor(F.col(value_col) / F.lit(float(bin_width))).cast("long")
    per = (
        df.filter(g.isin([group_a, group_b]) & F.col(value_col).isNotNull())
        .select((g == group_a).alias("_isa"), b.alias("_b"))
        .groupBy("_b")
        .agg(
            F.sum(F.col("_isa").cast("long")).cast(_D38).alias("_a"),
            F.sum((~F.col("_isa")).cast("long")).cast(_D38).alias("_bn"),
        )
    )
    nano = 1_000_000_000
    root = F.sqrt((F.col("_a") * F.col("_bn")).cast("double"))
    m = per.agg(
        F.sum("_a").alias("_tna"),
        F.sum("_bn").alias("_tnb"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum(F.floor(root * nano).cast("long").cast(_D38)).alias("_sr"),
    )
    ok = (F.col("_tna") > 0) & (F.col("_tnb") > 0)
    bc = F.when(
        ok,
        (F.col("_sr").cast("double") / nano)
        / F.sqrt((F.col("_tna") * F.col("_tnb")).cast("double")),
    )
    h = F.sqrt(F.greatest(F.lit(0.0), 1.0 - bc))
    return m.select(
        F.col("_tna").cast("long").alias("n_a"),
        F.col("_tnb").cast("long").alias("n_b"),
        "n_bins",
        F.round(bc, 6).alias("bc"),
        F.round(h, 6).alias("hellinger"),
    )
