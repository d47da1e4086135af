"""Round-10 gate queries + DuckDB oracles: the experimentation/statistics
extensions (Welch t, Wilcoxon signed-rank, DiD, runs test, dispersion,
Cramér's V, Tukey fences, seasonal strength, Kendall tau-b, log-log
elasticity, Markov conditional entropy, Bowley skewness) and three more
STRUCTURALLY-INDEPENDENT oracles in the editdist1 style — the Spark side
runs the scale-shaped plan (deletion-neighborhood index join, MinHash-LSH
banding, distinct-x frontier), the oracle runs the brute-force O(n²)
formulation, so a green check proves losslessness instead of mirroring
the algorithm.

Registered into the same QUERIES/ORACLES registry as queries.py (imported
from there, after queries_data_ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from olake_spark.queries import register, table

_D38 = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test (randomness of daily direction)
# ---------------------------------------------------------------------------

_RUNS_ORACLE = """
WITH daily AS (
  SELECT floor(epoch_us(ts) / 86400000000)::BIGINT AS t,
         sum(round(value * 1000000)::BIGINT)::BIGINT AS x
  FROM events GROUP BY 1
),
mv AS (
  SELECT t, sign((x - lag(x) OVER (ORDER BY t))::DOUBLE)::INT AS s
  FROM daily
),
mf AS (SELECT t, s FROM mv WHERE s IS NOT NULL AND s != 0),
rr AS (
  SELECT s,
         CASE WHEN lag(s) OVER (ORDER BY t) IS NULL
                OR s != lag(s) OVER (ORDER BY t) THEN 1 ELSE 0 END AS nr
  FROM mf
),
agg AS (
  SELECT sum(CASE WHEN s > 0 THEN 1 ELSE 0 END)::HUGEINT AS n1,
         sum(CASE WHEN s < 0 THEN 1 ELSE 0 END)::HUGEINT AS n2,
         sum(nr)::HUGEINT AS r
  FROM rr
)
SELECT n1::BIGINT AS n_up, n2::BIGINT AS n_down, r::BIGINT AS runs,
       CASE WHEN (n1 + n2) >= 2
              AND (2*n1*n2*(2*n1*n2 - (n1+n2)))::DOUBLE
                  / ((n1+n2)*(n1+n2)*((n1+n2) - 1))::DOUBLE > 0
       THEN round(
         (r::DOUBLE - ((2*n1*n2)::DOUBLE / (n1+n2)::DOUBLE + 1.0))
         / sqrt((2*n1*n2*(2*n1*n2 - (n1+n2)))::DOUBLE
                / ((n1+n2)*(n1+n2)*((n1+n2) - 1))::DOUBLE), 6)
       END AS z
FROM agg
"""


@register("events_runs_test", _RUNS_ORACLE)
def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily total's up/down moves
    (operators/robust_trend.runs_test) — the randomness screen run
    before any trend claim. R/n₁/n₂ come from two lag windows over the
    BUCKET-sized relation; z is one IEEE sequence over casts of exact
    DECIMAL(38,0) products."""
    from olake_spark.operators.robust_trend import runs_test

    return runs_test(table(spark, sf_dir, "events"), "ts", "value")


# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test
# ---------------------------------------------------------------------------

_WELCH_ORACLE = """
WITH m AS (
  SELECT
    sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)::HUGEINT AS na,
    sum(CASE WHEN l_returnflag = 'A'
        THEN round(l_extendedprice * 1000000)::BIGINT ELSE 0 END)::HUGEINT
      AS sa,
    sum(CASE WHEN l_returnflag = 'A'
        THEN round(l_extendedprice * 1000000)::BIGINT::HUGEINT
             * round(l_extendedprice * 1000000)::BIGINT ELSE 0 END) AS qa,
    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::HUGEINT AS nb,
    sum(CASE WHEN l_returnflag = 'R'
        THEN round(l_extendedprice * 1000000)::BIGINT ELSE 0 END)::HUGEINT
      AS sb,
    sum(CASE WHEN l_returnflag = 'R'
        THEN round(l_extendedprice * 1000000)::BIGINT::HUGEINT
             * round(l_extendedprice * 1000000)::BIGINT ELSE 0 END) AS qb
  FROM lineitem WHERE l_extendedprice IS NOT NULL
),
d AS (
  SELECT na, nb,
         CASE WHEN na > 0 THEN sa::DOUBLE / na::DOUBLE END AS ma,
         CASE WHEN nb > 0 THEN sb::DOUBLE / nb::DOUBLE END AS mb,
         CASE WHEN na > 1 THEN
           ((na*qa - sa*sa)::DOUBLE / (na*(na-1))::DOUBLE) / na::DOUBLE
         END AS sea,
         CASE WHEN nb > 1 THEN
           ((nb*qb - sb*sb)::DOUBLE / (nb*(nb-1))::DOUBLE) / nb::DOUBLE
         END AS seb
  FROM m
)
SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
       round(ma / 1000000.0, 6) AS mean_a,
       round(mb / 1000000.0, 6) AS mean_b,
       CASE WHEN sea + seb > 0
            THEN round((ma - mb) / sqrt(sea + seb), 6) END AS t,
       CASE WHEN sea + seb > 0
            THEN round((sea + seb) * (sea + seb)
                 / (sea*sea / (na-1)::DOUBLE + seb*seb / (nb-1)::DOUBLE), 6)
       END AS dof
FROM d
"""


@register("lineitem_welch_ttest", _WELCH_ORACLE)
def lineitem_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t between returned ('A') and rejected
    ('R') lineitem prices (operators/abtest.welch_ttest) — six exact
    micro-unit moments in one map-side-combinable pass, then one IEEE
    sequence for t and the Welch–Satterthwaite dof."""
    from olake_spark.operators.abtest import welch_ttest

    return welch_ttest(
        table(spark, sf_dir, "lineitem"), "l_returnflag",
        "l_extendedprice", "A", "R",
    )


# ---------------------------------------------------------------------------
# Bowley quartile skewness (keyless PERCENTILE_CONT)
# ---------------------------------------------------------------------------

_BOWLEY_ORACLE = """
WITH v AS (
  SELECT round(l_extendedprice * 1000000)::BIGINT AS vm FROM lineitem
  WHERE l_extendedprice IS NOT NULL
),
r AS (
  SELECT vm, row_number() OVER (ORDER BY vm) AS rn,
         count(*) OVER () AS n
  FROM v
),
hp AS (
  SELECT n, p.p, (n - 1) * p.p + 1 AS h
  FROM (SELECT DISTINCT n FROM r)
  CROSS JOIN (SELECT unnest([0.25, 0.5, 0.75]) AS p) p
),
sel AS (
  SELECT hp.p,
         round((max(CASE WHEN r.rn = floor(hp.h) THEN r.vm END)
                + (hp.h - floor(hp.h))
                  * (max(CASE WHEN r.rn = least(ceil(hp.h), hp.n)
                         THEN r.vm END)
                     - max(CASE WHEN r.rn = floor(hp.h) THEN r.vm END)))
               / 1000000.0, 6) AS q
  FROM hp JOIN r ON r.rn = floor(hp.h) OR r.rn = least(ceil(hp.h), hp.n)
  GROUP BY hp.p, hp.h, hp.n
)
SELECT max(CASE WHEN p = 0.25 THEN q END) AS q1,
       max(CASE WHEN p = 0.5  THEN q END) AS q2,
       max(CASE WHEN p = 0.75 THEN q END) AS q3,
       round((max(CASE WHEN p = 0.75 THEN q END)
              + max(CASE WHEN p = 0.25 THEN q END)
              - 2 * max(CASE WHEN p = 0.5 THEN q END))
             / (max(CASE WHEN p = 0.75 THEN q END)
                - max(CASE WHEN p = 0.25 THEN q END)), 6) AS bowley
FROM sel
"""


@register("lineitem_bowley_skewness", _BOWLEY_ORACLE)
def lineitem_bowley_skewness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowley (quartile) skewness of the GLOBAL price distribution —
    (Q3 + Q1 − 2·Q2)/(Q3 − Q1) over ANSI PERCENTILE_CONT quartiles.
    Exercises the KEYLESS path of the shared histogram-bisection
    machinery (operators/quantiles.percentile_cont with keys=[]); the
    skewness ratio divides the already-round-6 interpolated quartiles,
    so the final round is engine-stable."""
    from olake_spark.operators.quantiles import percentile_cont

    pc = percentile_cont(
        table(spark, sf_dir, "lineitem"), [], "l_extendedprice",
        [0.25, 0.5, 0.75], bins=2048,
    )
    agg = pc.agg(
        F.max(F.when(F.col("p") == 0.25, F.col("q_cont"))).alias("q1"),
        F.max(F.when(F.col("p") == 0.5, F.col("q_cont"))).alias("q2"),
        F.max(F.when(F.col("p") == 0.75, F.col("q_cont"))).alias("q3"),
    )
    return agg.select(
        "q1", "q2", "q3",
        F.round(
            F.try_divide(
                F.col("q3") + F.col("q1") - 2 * F.col("q2"),
                F.col("q3") - F.col("q1"),
            ),
            6,
        ).alias("bowley"),
    )


# ---------------------------------------------------------------------------
# dispersion (Fano) index per event type
# ---------------------------------------------------------------------------

_DISPERSION_ORACLE = """
WITH b AS (
  SELECT event_type, floor(epoch_us(ts) / 86400000000)::BIGINT AS t,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, count(*)::HUGEINT AS nb, sum(c)::HUGEINT AS s,
         sum(c::HUGEINT * c) AS q
  FROM b GROUP BY 1
)
SELECT event_type, nb::BIGINT AS n_buckets, s::BIGINT AS n_events,
       round(s::DOUBLE / nb::DOUBLE, 6) AS mean,
       CASE WHEN nb > 1 THEN
         round((nb*q - s*s)::DOUBLE / (nb*(nb-1))::DOUBLE, 6) END AS var,
       CASE WHEN nb > 1 AND s::DOUBLE / nb::DOUBLE != 0 THEN
         round(((nb*q - s*s)::DOUBLE / (nb*(nb-1))::DOUBLE)
               / (s::DOUBLE / nb::DOUBLE), 6) END AS vmr
FROM m
"""


@register("events_dispersion_index", _DISPERSION_ORACLE)
def events_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-to-mean ratio (Fano factor) of daily event counts per
    type (operators/timeseries.dispersion_index) — the overdispersion
    screen before any Poisson assumption. Exact integer moments over
    the bucket relation; one divide each for mean/var/VMR."""
    from olake_spark.operators.timeseries import dispersion_index

    return dispersion_index(
        table(spark, sf_dir, "events"), "ts", ["event_type"], "value"
    )


# ---------------------------------------------------------------------------
# Cramér's V (normalized chi-square effect size)
# ---------------------------------------------------------------------------

_CRAMERS_ORACLE = """
WITH j AS (
  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
obs AS (SELECT segment, priority, count(*) AS n FROM j GROUP BY 1, 2),
cells AS (
  SELECT g.segment, g.priority, coalesce(o.n, 0) AS n
  FROM (SELECT s.segment, p.priority
        FROM (SELECT DISTINCT segment FROM j) s
        CROSS JOIN (SELECT DISTINCT priority FROM j) p) g
  LEFT JOIN obs o ON o.segment = g.segment AND o.priority = g.priority
),
w AS (
  SELECT segment, priority, n,
         sum(n) OVER (PARTITION BY segment) AS r,
         sum(n) OVER (PARTITION BY priority) AS c,
         sum(n) OVER () AS g
  FROM cells
),
cell AS (
  SELECT n,
         (((n::HUGEINT * g - r::HUGEINT * c)
           * (n::HUGEINT * g - r::HUGEINT * c) * 1000000)
          // (g::HUGEINT * r * c))::BIGINT AS cm
  FROM w
),
agg AS (
  SELECT (SELECT sum(n) FROM cell) AS n,
         (SELECT count(DISTINCT segment) FROM cells) AS nr,
         (SELECT count(DISTINCT priority) FROM cells) AS nc,
         (SELECT sum(cm) FROM cell) AS chi2m
)
SELECT n::BIGINT AS n, nr::BIGINT AS n_row_levels,
       nc::BIGINT AS n_col_levels, chi2m::BIGINT AS chi2_total_micro,
       CASE WHEN least(nr, nc) - 1 > 0 THEN
         round(sqrt((chi2m::DOUBLE / 1000000.0 / n::DOUBLE)
                    / (least(nr, nc) - 1)::DOUBLE), 6) END AS v
FROM agg
"""


@register("orders_cramers_v", _CRAMERS_ORACLE)
def orders_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between customer segment and order priority
    (operators/audit.cramers_v) — the [0,1]-normalized effect size over
    the chi-square operator's exact floor-micro cell integers; the
    same complete-grid contingency as orders_chi2_independence."""
    from olake_spark.operators.audit import cramers_v

    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_orderpriority").alias("priority"),
    )
    return cramers_v(j, "segment", "priority")


# ---------------------------------------------------------------------------
# Tukey boxplot fences + outlier census per return flag
# ---------------------------------------------------------------------------

_TUKEY_ORACLE = """
WITH v AS (
  SELECT l_returnflag AS g, round(l_extendedprice * 1000000)::BIGINT AS vm
  FROM lineitem WHERE l_extendedprice IS NOT NULL
),
r AS (
  SELECT g, vm, row_number() OVER (PARTITION BY g ORDER BY vm) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM v
),
q AS (
  SELECT g,
         max(CASE WHEN rn = greatest(1, ceil(0.25 * n)) THEN vm END) AS q1,
         max(CASE WHEN rn = greatest(1, ceil(0.75 * n)) THEN vm END) AS q3
  FROM r GROUP BY 1
),
f AS (
  SELECT g, q1, q3,
         q1 - (3 * (q3 - q1)) // 2 AS lo,
         q3 + (3 * (q3 - q1)) // 2 AS hi
  FROM q
)
SELECT v.g AS l_returnflag, count(*)::BIGINT AS n,
       any_value(f.q1)::BIGINT AS q1_micros,
       any_value(f.q3)::BIGINT AS q3_micros,
       any_value(f.lo)::BIGINT AS lo_fence_micros,
       any_value(f.hi)::BIGINT AS hi_fence_micros,
       sum(CASE WHEN v.vm < f.lo OR v.vm > f.hi THEN 1 ELSE 0 END)::BIGINT
         AS n_outliers,
       min(CASE WHEN v.vm < f.lo OR v.vm > f.hi THEN v.vm END)
         AS min_outlier_micros,
       max(CASE WHEN v.vm < f.lo OR v.vm > f.hi THEN v.vm END)
         AS max_outlier_micros
FROM v JOIN f ON f.g = v.g
GROUP BY 1
"""


@register("lineitem_tukey_fences", _TUKEY_ORACLE)
def lineitem_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR fences + outlier census per return flag
    (operators/quantiles.tukey_fences): exact rank-⌈p·n⌉ quartiles from
    the shared bisection sweep, integer fences via (3·IQR) div 2, one
    broadcast-join census pass. The IQR complement to the MAD rule."""
    from olake_spark.operators.quantiles import tukey_fences

    return tukey_fences(
        table(spark, sf_dir, "lineitem"), ["l_returnflag"], "l_extendedprice"
    )


# ---------------------------------------------------------------------------
# trend / seasonality strength over the decomposition
# ---------------------------------------------------------------------------

_STRENGTH_ORACLE = """
WITH daily AS (
  SELECT floor(epoch_us(ts) / 86400000000)::BIGINT AS bucket,
         sum(round(value * 1000000)::BIGINT)::BIGINT AS x
  FROM events GROUP BY 1
),
tr AS (
  SELECT bucket, x,
         (sum(x) OVER w // count(*) OVER w)::BIGINT AS trend
  FROM daily
  WINDOW w AS (ORDER BY bucket ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT bucket, x, trend, (bucket % 7)::INT AS phase, x - trend AS d
  FROM tr
),
sea AS (
  SELECT *, (sum(d) OVER (PARTITION BY phase)
             // count(*) OVER (PARTITION BY phase))::BIGINT AS seasonal
  FROM det
),
comp AS (
  SELECT (x - trend - seasonal)::HUGEINT AS r,
         (x - trend)::HUGEINT AS sr,
         (x - seasonal)::HUGEINT AS tc
  FROM sea
),
m AS (
  SELECT count(*)::HUGEINT AS n,
         sum(r) AS s_r, sum(r*r) AS q_r,
         sum(sr) AS s_s, sum(sr*sr) AS q_s,
         sum(tc) AS s_t, sum(tc*tc) AS q_t
  FROM comp
)
SELECT n::BIGINT AS n_buckets,
       CASE WHEN n*q_t - s_t*s_t > 0 THEN
         round(greatest(0.0, 1.0 - (n*q_r - s_r*s_r)::DOUBLE
                                   / (n*q_t - s_t*s_t)::DOUBLE), 6)
       END AS strength_trend,
       CASE WHEN n*q_s - s_s*s_s > 0 THEN
         round(greatest(0.0, 1.0 - (n*q_r - s_r*s_r)::DOUBLE
                                   / (n*q_s - s_s*s_s)::DOUBLE), 6)
       END AS strength_seasonal
FROM m
"""


@register("events_seasonal_strength", _STRENGTH_ORACLE)
def events_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyndman trend/seasonality strength F-statistics over the
    classical decomposition (operators/timeseries.seasonal_strength):
    unnormalized exact-integer variance numerators (the shared n
    cancels in the ratio), one divide per strength. Answers "how much
    of this series is actually structure?" before forecasting."""
    from olake_spark.operators.timeseries import seasonal_strength

    return seasonal_strength(
        table(spark, sf_dir, "events"), "ts", "value", period=7
    )


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank over per-user pre/post sums
# ---------------------------------------------------------------------------

_WILCOXON_ORACLE = """
WITH u AS (
  SELECT user_id,
         sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
             THEN round(value * 1000000)::BIGINT ELSE 0 END) AS xm,
         sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
             THEN round(value * 1000000)::BIGINT ELSE 0 END) AS ym
  FROM events GROUP BY 1
),
d AS (SELECT ym - xm AS d FROM u WHERE ym - xm != 0),
pv AS (
  SELECT abs(d) AS v, count(*)::HUGEINT AS t,
         sum(CASE WHEN d > 0 THEN 1 ELSE 0 END)::HUGEINT AS pos
  FROM d GROUP BY 1
),
rk AS (
  SELECT pos, t,
         2 * (sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) - t) + t + 1 AS rank2
  FROM pv
),
s AS (
  SELECT sum(t) AS n, sum(pos * rank2) AS w2p,
         sum(t*t*t - t) AS tie
  FROM rk
)
SELECT n::BIGINT AS n, w2p::BIGINT AS w2_plus, tie::BIGINT AS tie_correction,
       CASE WHEN 2*n*(n+1)*(2*n+1) - tie > 0 THEN
         round((2*w2p - n*(n+1))::DOUBLE
               / (2.0 * sqrt((2*n*(n+1)*(2*n+1) - tie)::DOUBLE / 12.0)), 6)
       END AS z
FROM s
"""


@register("events_wilcoxon_signed_rank", _WILCOXON_ORACLE)
def events_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank over each user's pre- vs post-period value
    sums (operators/abtest.wilcoxon_signed_rank) — the PAIRED
    complement to the Mann-Whitney query, same split date as CUPED.
    Doubled ranks keep tied average ranks integral; the window runs
    over the distinct-|d| relation."""
    from olake_spark.operators.abtest import wilcoxon_signed_rank

    ev = table(spark, sf_dir, "events")
    vm = F.round(F.col("value") * 1_000_000).cast("long")
    split = F.lit("2024-01-16").cast("timestamp")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, vm).otherwise(0)).alias("_xm"),
        F.sum(F.when(F.col("ts") >= split, vm).otherwise(0)).alias("_ym"),
    )
    return wilcoxon_signed_rank(u, "_xm", "_ym", scale=1)


# ---------------------------------------------------------------------------
# Markov conditional entropy of event-type transitions
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH t AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
cells AS (
  SELECT prev, event_type AS nxt, count(*)::HUGEINT AS c
  FROM t WHERE prev IS NOT NULL GROUP BY 1, 2
),
w AS (
  SELECT c, sum(c) OVER (PARTITION BY prev) AS ci, sum(c) OVER () AS n
  FROM cells
),
s AS (
  SELECT any_value(n) AS n,
         sum(floor((c::DOUBLE / n::DOUBLE)
                   * ln(ci::DOUBLE / c::DOUBLE) * 1000000000)::BIGINT)
           AS h_nano
  FROM w
)
SELECT n::BIGINT AS n_transitions, h_nano::BIGINT AS h_nano,
       round(h_nano::DOUBLE / 1000000000.0, 6) AS h_cond
FROM s
"""


@register("events_markov_entropy", _MARKOV_ORACLE)
def events_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional entropy H(next | prev) of the per-user event-type
    transition chain — "how predictable is the next step?" (0 =
    deterministic funnel, ln|types| = uniform). Transition cells are a
    per-user lag window (user-partitioned, short sequences); each
    cell's double term is one IEEE sequence and the SUM accumulates
    nano-floored BIGINTs (the chi2/MI floor pattern — order-free,
    bias ≤ |cells|·1e-9)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "user_id", "ts", "event_id", "event_type",
            F.lag("event_type").over(w).alias("_prev"),
        )
        .filter(F.col("_prev").isNotNull())
    )
    cells = trans.groupBy("_prev", "event_type").agg(
        F.count(F.lit(1)).cast(_D38).alias("_c")
    )
    wp = W.partitionBy("_prev")
    wt = W.partitionBy()
    terms = cells.select(
        F.col("_c"),
        F.sum("_c").over(wp).alias("_ci"),
        F.sum("_c").over(wt).alias("_n"),
    ).select(
        "_n",
        F.floor(
            (F.col("_c").cast("double") / F.col("_n").cast("double"))
            * F.log(F.col("_ci").cast("double") / F.col("_c").cast("double"))
            * 1e9
        ).cast("long").alias("_t_nano"),
    )
    agg = terms.agg(
        F.first("_n").alias("_n"), F.sum("_t_nano").alias("_h_nano")
    )
    return agg.select(
        F.col("_n").cast("long").alias("n_transitions"),
        F.col("_h_nano").cast("long").alias("h_nano"),
        F.round(F.col("_h_nano").cast("double") / 1e9, 6).alias("h_cond"),
    )


# ---------------------------------------------------------------------------
# log-log price elasticity (OLS slope in ln-space)
# ---------------------------------------------------------------------------

_ELASTICITY_ORACLE = """
WITH r AS (
  SELECT ln(l_quantity::DOUBLE) AS lx,
         ln(l_extendedprice / l_quantity) AS ly
  FROM lineitem WHERE l_quantity > 0 AND l_extendedprice > 0
),
m AS (
  SELECT count(*)::HUGEINT AS n,
         sum(floor(lx * 1000000000)::BIGINT)::HUGEINT AS sx,
         sum(floor(ly * 1000000000)::BIGINT)::HUGEINT AS sy,
         sum(floor(lx * lx * 1000000000)::BIGINT)::HUGEINT AS sxx,
         sum(floor(lx * ly * 1000000000)::BIGINT)::HUGEINT AS sxy
  FROM r
)
SELECT n::BIGINT AS n,
       round((n*1000000000*sxy - sx*sy)::DOUBLE
             / (n*1000000000*sxx - sx*sx)::DOUBLE, 6) AS elasticity,
       round((sy::DOUBLE - ((n*1000000000*sxy - sx*sy)::DOUBLE
                            / (n*1000000000*sxx - sx*sx)::DOUBLE)
                           * sx::DOUBLE)
             / n::DOUBLE / 1000000000.0, 6) + 0.0 AS intercept_ln
FROM m
"""


@register("lineitem_loglog_elasticity", _ELASTICITY_ORACLE)
def lineitem_loglog_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log demand-curve slope: OLS of ln(unit price) on
    ln(quantity) — the standard elasticity read. Per-row ln doubles
    are FLOOR-nano quantized before summation (the surprisal/MI
    pattern — float sums would be partition-order-dependent); the
    slope is one IEEE sequence over casts of the exact nano sums."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    return loglog_elasticity_over(li)


def loglog_elasticity_over(li: DataFrame) -> DataFrame:
    """The query's actual OLS body over any (l_quantity,
    l_extendedprice) relation — factored out so the regression pin in
    tests/test_r10_fuzz.py exercises the REGISTERED expression on a
    synthetic exact-relationship fixture instead of re-implementing
    the math inline (ADVICE r10)."""
    lx = F.log(F.col("l_quantity").cast("double"))
    ly = F.log(F.col("l_extendedprice") / F.col("l_quantity"))
    nano = 1e9
    m = li.select(
        F.floor(lx * nano).cast("long").cast(_D38).alias("_x"),
        F.floor(ly * nano).cast("long").cast(_D38).alias("_y"),
        F.floor(lx * lx * nano).cast("long").cast(_D38).alias("_xx"),
        F.floor(lx * ly * nano).cast("long").cast(_D38).alias("_xy"),
    ).agg(
        F.count(F.lit(1)).cast(_D38).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum("_xx").alias("_sxx"),
        F.sum("_xy").alias("_sxy"),
    )
    n = F.col("_n")
    # n·1e9 rescales the single-sum terms to the nano² scale of the
    # sum-product terms (Sxy is nano-scaled, Sx·Sy is nano²-scaled — a
    # bare n would make the slope collapse to Σy/Σx)
    n9 = n * F.lit(1_000_000_000).cast(_D38)
    slope = (n9 * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(
        "double"
    ) / (n9 * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
    intercept = (
        (F.col("_sy").cast("double") - slope * F.col("_sx").cast("double"))
        / n.cast("double")
        / 1e9
    )
    return m.select(
        n.cast("long").alias("n"),
        F.round(slope, 6).alias("elasticity"),
        # + 0.0 folds IEEE −0.0 to 0.0 (string compare would split them)
        (F.round(intercept, 6) + F.lit(0.0)).alias("intercept_ln"),
    )


# ---------------------------------------------------------------------------
# Pareto skyline — INDEPENDENT brute-force dominance oracle
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH c AS (
  SELECT o_custkey, count(*)::BIGINT AS n_orders,
         sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS spend_cents
  FROM orders GROUP BY 1
)
SELECT a.o_custkey, a.n_orders, a.spend_cents
FROM c a
WHERE NOT EXISTS (
  SELECT 1 FROM c b
  WHERE b.n_orders >= a.n_orders AND b.spend_cents >= a.spend_cents
    AND (b.n_orders > a.n_orders OR b.spend_cents > a.spend_cents)
)
"""


@register("orders_skyline_pareto", _SKYLINE_ORACLE)
def orders_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline of customers under (maximize order count,
    maximize total spend) — operators/skyline.pareto_skyline_2d. The
    Spark plan is the distinct-x frontier reduction (one aggregation
    over rows, then domain-sized windows); the oracle is DELIBERATELY
    the brute-force O(n²) NOT EXISTS dominance test, structurally
    independent, so green proves the reduction lossless."""
    from olake_spark.operators.skyline import pareto_skyline_2d

    cust = table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "spend_cents"
        ),
    )
    return pareto_skyline_2d(cust, "n_orders", "spend_cents", ["o_custkey"])


# ---------------------------------------------------------------------------
# Kendall tau-b — INDEPENDENT brute-force pair oracle on a slice
# ---------------------------------------------------------------------------

_KENDALL_ORACLE = """
WITH s AS (
  SELECT round(l_quantity * 100)::BIGINT AS x,
         round(l_discount * 100)::BIGINT AS y
  FROM lineitem
  WHERE l_orderkey % 97 = 0
    AND l_quantity IS NOT NULL AND l_discount IS NOT NULL
),
r AS (SELECT x, y, row_number() OVER () AS rn FROM s),
p AS (
  SELECT
    sum(CASE WHEN (a.x < b.x AND a.y < b.y) OR (a.x > b.x AND a.y > b.y)
        THEN 1 ELSE 0 END)::HUGEINT AS conc,
    sum(CASE WHEN (a.x < b.x AND a.y > b.y) OR (a.x > b.x AND a.y < b.y)
        THEN 1 ELSE 0 END)::HUGEINT AS disc,
    sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END)::HUGEINT AS tx,
    sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END)::HUGEINT AS ty
  FROM r a JOIN r b ON a.rn < b.rn
),
n AS (SELECT count(*)::HUGEINT AS n FROM s)
SELECT n.n::BIGINT AS n, p.conc::BIGINT AS concordant,
       p.disc::BIGINT AS discordant,
       p.tx::BIGINT AS ties_x_pairs, p.ty::BIGINT AS ties_y_pairs,
       CASE WHEN n.n*(n.n-1) - 2*p.tx > 0 AND n.n*(n.n-1) - 2*p.ty > 0 THEN
         round((2 * (p.conc - p.disc))::DOUBLE
               / sqrt((n.n*(n.n-1) - 2*p.tx)::DOUBLE
                      * (n.n*(n.n-1) - 2*p.ty)::DOUBLE), 6)
       END AS tau_b
FROM p, n
"""


@register("lineitem_kendall_tau", _KENDALL_ORACLE)
def lineitem_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between quantity and discount on a deterministic
    orderkey slice — operators/correlation.kendall_tau_b. The Spark
    plan never enumerates row pairs (concordance counts come from the
    domain-sized cell histogram's cell×cell theta-join); the oracle IS
    the brute-force O(n²) row-pair walk, structurally independent, so
    green proves the histogram rewrite exact."""
    from olake_spark.operators.correlation import kendall_tau_b

    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 97 == 0
    )
    return kendall_tau_b(li, "l_quantity", "l_discount", scale=100)


# ---------------------------------------------------------------------------
# edit-distance ≤ 2 similarity join — INDEPENDENT brute-force oracle
# ---------------------------------------------------------------------------

_EDITDIST2_ORACLE = """
WITH c AS (
  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 5 = 0
)
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       a.c_name AS text_a, b.c_name AS text_b,
       levenshtein(a.c_name, b.c_name)::INT AS dist
FROM c a JOIN c b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
"""


@register("customer_editdist2_pairs", _EDITDIST2_ORACLE)
def customer_editdist2_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-name pairs within Levenshtein distance 2 on a custkey
    slice — operators/fuzzy.editdist2_join, the depth-2 FastSS deletion
    neighborhood (index |rows|·(1 + L + C(L,2)), variant equi-join,
    levenshtein verify on candidates only). Oracle = brute-force O(n²)
    levenshtein join, extending the editdist1 independent-oracle
    family one edit further."""
    from olake_spark.operators.fuzzy import editdist2_join

    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 == 0)
    return editdist2_join(c, "c_custkey", "c_name").select(
        "id_a", "id_b", "text_a", "text_b", "dist"
    )


# ---------------------------------------------------------------------------
# MinHash-LSH with exact-Jaccard verify — INDEPENDENT cross-join oracle
# ---------------------------------------------------------------------------

_MINHASH_PROOF_ORACLE = r"""
WITH d AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents WHERE doc_id % 2 = 0 AND doc_id < 500
),
g AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(length(t) - 4, 1) + 1),
           i -> substring(t, i, 5))) AS gs
  FROM d
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.gs, b.gs))::BIGINT AS inter,
         len(a.gs)::BIGINT AS na, len(b.gs)::BIGINT AS nb
  FROM g a JOIN g b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, inter, (na + nb - inter)::BIGINT AS union_sz,
       round(inter::DOUBLE / (na + nb - inter)::DOUBLE, 6) AS jaccard
FROM p
WHERE round(inter::DOUBLE / (na + nb - inter)::DOUBLE, 6) >= 0.5
"""


@register("documents_minhash_jaccard_proof", _MINHASH_PROOF_ORACLE)
def documents_minhash_jaccard_proof(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MinHash-LSH losslessness proof on a document slice
    (operators/dedup.minhash_exact_jaccard_pairs): the Spark side bands
    16×1 minhash signatures into candidate buckets and verifies each
    candidate with the TRUE shingle-set Jaccard; the oracle is the
    brute-force O(n²) cross-join over the same shingle sets. A green
    check proves the banded plan finds exactly the pairs exhaustive
    comparison finds (miss probability per true pair at J ≥ 0.5 is
    (1−J)^16 ≤ 1.5e-5 — and the fixture is fixed, so a pass is
    permanent; the slice holds 6 such pairs at sf0.01, so the check is
    NOT vacuous). The doc_id < 500 bound PINS the proof corpus at every
    SF — this query certifies losslessness on a fixed slice (and keeps
    the O(n²) oracle inside the gate budget); the production-scale
    near-dup path with its capped-bucket growth exponents is
    dedup_minhash_lsh / SCALE_EVIDENCE.json. The fixture corpus is
    adversarially self-similar (31% of ALL pairs at J ≥ 0.2), so
    unbounded banded candidates here are dense by construction, not by
    defect."""
    from olake_spark.operators.dedup import minhash_exact_jaccard_pairs

    docs = table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 500)
    )
    return minhash_exact_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)


# ---------------------------------------------------------------------------
# difference-in-differences
# ---------------------------------------------------------------------------

_DID_ORACLE = """
WITH obs AS (
  SELECT (c.c_nationkey % 2)::INT * 2
         + (CASE WHEN o.o_orderdate >= TIMESTAMP '1997-01-01'
                 THEN 1 ELSE 0 END) AS cell,
         round(o.o_totalprice * 1000000)::BIGINT AS v
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_totalprice IS NOT NULL
),
m AS (
  SELECT
    sum(CASE WHEN cell = 0 THEN 1 ELSE 0 END)::HUGEINT AS nc0,
    sum(CASE WHEN cell = 0 THEN v ELSE 0 END)::HUGEINT AS sc0,
    sum(CASE WHEN cell = 0 THEN v::HUGEINT * v ELSE 0 END) AS qc0,
    sum(CASE WHEN cell = 1 THEN 1 ELSE 0 END)::HUGEINT AS nc1,
    sum(CASE WHEN cell = 1 THEN v ELSE 0 END)::HUGEINT AS sc1,
    sum(CASE WHEN cell = 1 THEN v::HUGEINT * v ELSE 0 END) AS qc1,
    sum(CASE WHEN cell = 2 THEN 1 ELSE 0 END)::HUGEINT AS nt0,
    sum(CASE WHEN cell = 2 THEN v ELSE 0 END)::HUGEINT AS st0,
    sum(CASE WHEN cell = 2 THEN v::HUGEINT * v ELSE 0 END) AS qt0,
    sum(CASE WHEN cell = 3 THEN 1 ELSE 0 END)::HUGEINT AS nt1,
    sum(CASE WHEN cell = 3 THEN v ELSE 0 END)::HUGEINT AS st1,
    sum(CASE WHEN cell = 3 THEN v::HUGEINT * v ELSE 0 END) AS qt1
  FROM obs
)
SELECT nt0::BIGINT AS n_t0, nt1::BIGINT AS n_t1,
       nc0::BIGINT AS n_c0, nc1::BIGINT AS n_c1,
       CASE WHEN nt1 > 0 AND nt0 > 0 AND nc1 > 0 AND nc0 > 0 THEN
         round(((st1::DOUBLE / nt1::DOUBLE - st0::DOUBLE / nt0::DOUBLE)
                - (sc1::DOUBLE / nc1::DOUBLE - sc0::DOUBLE / nc0::DOUBLE))
               / 1000000.0, 6)
       END AS did,
       CASE WHEN nt1 > 1 AND nt0 > 1 AND nc1 > 1 AND nc0 > 1 THEN
         round(sqrt(
           ((nt1*qt1 - st1*st1)::DOUBLE / (nt1*(nt1-1))::DOUBLE)
             / nt1::DOUBLE
           + ((nt0*qt0 - st0*st0)::DOUBLE / (nt0*(nt0-1))::DOUBLE)
             / nt0::DOUBLE
           + ((nc1*qc1 - sc1*sc1)::DOUBLE / (nc1*(nc1-1))::DOUBLE)
             / nc1::DOUBLE
           + ((nc0*qc0 - sc0*sc0)::DOUBLE / (nc0*(nc0-1))::DOUBLE)
             / nc0::DOUBLE
         ) / 1000000.0, 6)
       END AS se
FROM m
"""


@register("orders_did_estimator", _DID_ORACLE)
def orders_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on order totals: treatment = odd
    customer nation, post = orders from 1997 on
    (operators/abtest.did_estimator). Four cells' exact micro moments
    in one pass; the DiD point estimate and pooled large-sample SE are
    one IEEE sequence each."""
    from olake_spark.operators.abtest import did_estimator

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        (F.col("c_nationkey") % 2).cast("int").alias("_treat"),
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .cast("int")
        .alias("_post"),
        "o_totalprice",
    )
    return did_estimator(j, "_treat", "_post", "o_totalprice")


# ---------------------------------------------------------------------------
# round-10 second batch: ANOVA family, changepoint, text/seasonal census
# ---------------------------------------------------------------------------

_ANOVA_ORACLE = """
WITH v AS (
  SELECT l_returnflag AS g, round(l_extendedprice * 1000000)::BIGINT AS vm
  FROM lineitem WHERE l_extendedprice IS NOT NULL
),
per AS (
  SELECT g, count(*)::HUGEINT AS n, sum(vm)::HUGEINT AS s,
         sum(vm::HUGEINT * vm) AS q
  FROM v GROUP BY g
),
t AS (
  SELECT count(*)::BIGINT AS k, sum(n) AS nt, sum(s) AS st,
         list((n*q - s*s)::DOUBLE / n::DOUBLE ORDER BY g) AS lw,
         list((s*s)::DOUBLE / n::DOUBLE ORDER BY g) AS lb
  FROM per
),
f AS (
  SELECT k, nt, st,
         list_reduce(lw, (a, b) -> a + b) AS ssw,
         list_reduce(lb, (a, b) -> a + b)
           - (st*st)::DOUBLE / nt::DOUBLE AS ssb
  FROM t
)
SELECT k AS k_groups, nt::BIGINT AS n,
       round(ssb / 1e12, 6) AS ss_between,
       round(ssw / 1e12, 6) AS ss_within,
       CASE WHEN k > 1 AND nt > k AND ssw > 0 THEN
         round((ssb / (k - 1)::DOUBLE) / (ssw / (nt::BIGINT - k)::DOUBLE), 6)
       END AS f
FROM f
"""


@register("lineitem_oneway_anova", _ANOVA_ORACLE)
def lineitem_oneway_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F of price across return flags
    (operators/abtest.oneway_anova): exact DECIMAL(38,0) per-group
    moments in one pass, then the per-group double terms fold in
    GROUP-KEY ORDER (the KM/Holt ordered-fold recipe) so the float sums
    match the oracle's list_reduce bit for bit."""
    from olake_spark.operators.abtest import oneway_anova

    return oneway_anova(
        table(spark, sf_dir, "lineitem"), "l_returnflag", "l_extendedprice"
    )


_BF_ORACLE = """
WITH v AS (
  SELECT l_returnflag AS g, round(l_extendedprice * 1000000)::BIGINT AS vm
  FROM lineitem WHERE l_extendedprice IS NOT NULL
),
r AS (
  SELECT g, vm, row_number() OVER (PARTITION BY g ORDER BY vm) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM v
),
med AS (
  SELECT g, max(CASE WHEN rn = greatest(1, ceil(0.5 * n)) THEN vm END)
           AS medm
  FROM r GROUP BY g
),
z AS (
  SELECT v.g, abs(v.vm - med.medm)::BIGINT AS zm
  FROM v JOIN med ON med.g = v.g
),
per AS (
  SELECT g, count(*)::HUGEINT AS n, sum(zm)::HUGEINT AS s,
         sum(zm::HUGEINT * zm) AS q
  FROM z GROUP BY g
),
t AS (
  SELECT count(*)::BIGINT AS k, sum(n) AS nt, sum(s) AS st,
         list((n*q - s*s)::DOUBLE / n::DOUBLE ORDER BY g) AS lw,
         list((s*s)::DOUBLE / n::DOUBLE ORDER BY g) AS lb
  FROM per
),
f AS (
  SELECT k, nt, st,
         list_reduce(lw, (a, b) -> a + b) AS ssw,
         list_reduce(lb, (a, b) -> a + b)
           - (st*st)::DOUBLE / nt::DOUBLE AS ssb
  FROM t
)
SELECT k AS k_groups, nt::BIGINT AS n,
       round(ssb / 1e12, 6) AS ss_between,
       round(ssw / 1e12, 6) AS ss_within,
       CASE WHEN k > 1 AND nt > k AND ssw > 0 THEN
         round((ssb / (k - 1)::DOUBLE) / (ssw / (nt::BIGINT - k)::DOUBLE), 6)
       END AS f
FROM f
"""


@register("lineitem_brown_forsythe", _BF_ORACLE)
def lineitem_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe homogeneity-of-variance test across return flags
    (operators/abtest.brown_forsythe) — ANOVA on |x − group median|,
    medians from the shared exact histogram bisection. The
    variance-assumption check run before pooled tests; composes two
    round-10 primitives (bisection medians → ordered-fold ANOVA)."""
    from olake_spark.operators.abtest import brown_forsythe

    return brown_forsythe(
        table(spark, sf_dir, "lineitem"), "l_returnflag", "l_extendedprice"
    )


_CHANGEPOINT_ORACLE = """
WITH daily AS (
  SELECT floor(epoch_us(ts) / 86400000000)::BIGINT AS t,
         sum(round(value * 1000000)::BIGINT)::HUGEINT AS x
  FROM events GROUP BY 1
),
pre AS (
  SELECT t, row_number() OVER (ORDER BY t) AS k,
         sum(x) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS sk,
         count(*) OVER () AS n, sum(x) OVER () AS sn
  FROM daily
),
c AS (
  SELECT t, n, k, sk, sn,
         (sk*sk)::DOUBLE / k::DOUBLE
           + ((sn-sk)*(sn-sk))::DOUBLE / (n-k)::DOUBLE
           - (sn*sn)::DOUBLE / n::DOUBLE AS red
  FROM pre WHERE k < n
)
SELECT t AS split_bucket, n::BIGINT AS n_buckets,
       round(sk::DOUBLE / k::DOUBLE / 1000000.0, 6) AS mean_left,
       round((sn-sk)::DOUBLE / (n-k)::DOUBLE / 1000000.0, 6) AS mean_right,
       round(red / 1e12, 6) AS reduction
FROM c ORDER BY red DESC, t LIMIT 1
"""


@register("events_changepoint_mean_shift", _CHANGEPOINT_ORACLE)
def events_changepoint_mean_shift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Single mean-shift changepoint of the daily total — the first
    binary-segmentation split (operators/timeseries.
    changepoint_mean_shift): exact prefix sums over the bucket
    relation, three IEEE divides per candidate split, deterministic
    (reduction DESC, bucket ASC) argmax in both engines."""
    from olake_spark.operators.timeseries import changepoint_mean_shift

    return changepoint_mean_shift(table(spark, sf_dir, "events"), "ts", "value")


_TTR_ORACLE = r"""
WITH tok AS (
  SELECT source,
         unnest(string_split(
           regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS t
  FROM documents
),
per AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
agg AS (
  SELECT source, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax
  FROM per GROUP BY 1
)
SELECT source, n_tokens, n_types, n_hapax,
       round(n_types::DOUBLE / n_tokens::DOUBLE, 6) AS ttr,
       round(n_hapax::DOUBLE / n_types::DOUBLE, 6) AS hapax_share
FROM agg
"""


@register("documents_ttr_by_source", _TTR_ORACLE)
def documents_ttr_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio + hapax share per document source — the corpus
    lexical-diversity census (low TTR → boilerplate/templated source;
    high hapax share → noisy OCR or genuinely diverse text). One
    explode + one (source, token) shuffle; counts exact, two divides."""
    from olake_spark.operators.dedup import normalize_text

    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("_t"),
    )
    per = tok.groupBy("source", "_t").agg(F.count(F.lit(1)).alias("_c"))
    agg = per.groupBy("source").agg(
        F.sum("_c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)).alias("n_hapax"),
    )
    return agg.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        F.col("n_hapax").cast("long").alias("n_hapax"),
        F.round(
            F.col("n_types").cast("double") / F.col("n_tokens").cast("double"),
            6,
        ).alias("ttr"),
        F.round(
            F.col("n_hapax").cast("double") / F.col("n_types").cast("double"),
            6,
        ).alias("hapax_share"),
    )


_DAILY_ENTROPY_ORACLE = """
WITH c AS (
  SELECT floor(epoch_us(ts) / 86400000000)::BIGINT AS d, event_type,
         count(*)::HUGEINT AS c
  FROM events GROUP BY 1, 2
),
w AS (SELECT d, c, sum(c) OVER (PARTITION BY d) AS n FROM c),
s AS (
  SELECT d, any_value(n)::BIGINT AS n_events,
         sum(floor((c::DOUBLE / n::DOUBLE)
                   * ln(n::DOUBLE / c::DOUBLE) * 1000000000)::BIGINT)::BIGINT
           AS h_nano
  FROM w GROUP BY d
)
SELECT d AS day_bucket, n_events, h_nano,
       round(h_nano::DOUBLE / 1000000000.0, 6) AS h
FROM s
"""


@register("events_daily_type_entropy", _DAILY_ENTROPY_ORACLE)
def events_daily_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day Shannon entropy of the event-type mix — the
    "did the traffic composition shift today?" monitor (a collapse
    toward 0 means one type took over). Cells are one shuffle;
    per-cell double terms are nano-floored BIGINTs (the chi2/MI
    order-free pattern), summed exactly per day."""
    ev = table(spark, sf_dir, "events")
    d = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).alias(
        "_d"
    )
    cells = ev.select(d, "event_type").groupBy("_d", "event_type").agg(
        F.count(F.lit(1)).cast(_D38).alias("_c")
    )
    wn = W.partitionBy("_d")
    terms = cells.select(
        "_d",
        F.sum("_c").over(wn).alias("_n"),
        F.floor(
            (F.col("_c").cast("double") / F.sum("_c").over(wn).cast("double"))
            * F.log(
                F.sum("_c").over(wn).cast("double") / F.col("_c").cast("double")
            )
            * 1e9
        ).cast("long").alias("_t_nano"),
    )
    out = terms.groupBy("_d").agg(
        F.first("_n").cast("long").alias("n_events"),
        F.sum("_t_nano").alias("h_nano"),
    )
    return out.select(
        F.col("_d").alias("day_bucket"),
        "n_events",
        F.col("h_nano").cast("long").alias("h_nano"),
        F.round(F.col("h_nano").cast("double") / 1e9, 6).alias("h"),
    )


_SEASONAL_INDEX_ORACLE = """
WITH m AS (
  SELECT month(o_orderdate)::INT AS month, count(*)::BIGINT AS n_orders,
         sum(round(o_totalprice * 1000000)::BIGINT)::BIGINT AS rev_micro
  FROM orders GROUP BY 1
),
t AS (SELECT sum(rev_micro)::HUGEINT AS tot FROM m)
SELECT m.month, m.n_orders, m.rev_micro,
       round((12::HUGEINT * m.rev_micro)::DOUBLE / t.tot::DOUBLE, 6)
         AS seasonal_index
FROM m, t
"""


@register("orders_monthly_seasonal_index", _SEASONAL_INDEX_ORACLE)
def orders_monthly_seasonal_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classic monthly seasonal index of order revenue — month revenue
    over the uniform-month expectation (12·rev_m / total), the
    normalization behind every deseasonalized KPI. Exact micro sums;
    one divide per month; the 12-row total is a 1-row broadcast."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(F.month("o_orderdate").cast("int").alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.round(F.col("o_totalprice") * 1_000_000).cast("long")
        ).alias("rev_micro"),
    )
    tot = m.agg(F.sum(F.col("rev_micro").cast(_D38)).alias("_tot"))
    return m.crossJoin(F.broadcast(tot)).select(
        "month",
        "n_orders",
        "rev_micro",
        F.round(
            (F.lit(12).cast(_D38) * F.col("rev_micro").cast(_D38)).cast(
                "double"
            )
            / F.col("_tot").cast("double"),
            6,
        ).alias("seasonal_index"),
    )


_INTERARRIVAL_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderdate,
         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
),
g AS (
  SELECT date_diff('day', prev, o_orderdate)::BIGINT AS gap
  FROM o WHERE prev IS NOT NULL
),
m AS (
  SELECT count(*)::HUGEINT AS n, sum(gap)::HUGEINT AS s,
         sum(gap::HUGEINT * gap) AS q
  FROM g
)
SELECT n::BIGINT AS n_gaps,
       round(s::DOUBLE / n::DOUBLE, 6) AS mean_days,
       CASE WHEN n > 1 AND s > 0 THEN
         round(((n*q - s*s)::DOUBLE / (n*(n-1))::DOUBLE)
               / ((s::DOUBLE / n::DOUBLE) * (s::DOUBLE / n::DOUBLE)), 6)
       END AS cv2,
       CASE WHEN s > 0 THEN round(n::DOUBLE / s::DOUBLE, 6) END
         AS rate_per_day
FROM m
"""


@register("orders_interarrival_stats", _INTERARRIVAL_ORACLE)
def orders_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap census: per-customer consecutive order gaps in
    days (lag window, user-partitioned), then global exact moments —
    MLE exponential rate = 1/mean and CV² (≈1 ⟺ Poisson-like ordering,
    ≫1 ⟺ bursty). Gap ties on the same date break on o_orderkey in
    both engines."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.select(
            "o_custkey", "o_orderdate",
            F.lag("o_orderdate").over(w).alias("_prev"),
        )
        .filter(F.col("_prev").isNotNull())
        .select(
            F.datediff(F.col("o_orderdate"), F.col("_prev"))
            .cast("long")
            .cast(_D38)
            .alias("_gap")
        )
    )
    m = gaps.agg(
        F.count(F.lit(1)).cast(_D38).alias("_n"),
        F.sum("_gap").alias("_s"),
        F.sum(F.col("_gap") * F.col("_gap")).alias("_q"),
    )
    n, sg, q = F.col("_n"), F.col("_s"), F.col("_q")
    mean = F.try_divide(sg.cast("double"), n.cast("double"))
    var = F.try_divide(
        (n * q - sg * sg).cast("double"), (n * (n - 1)).cast("double")
    )
    return m.select(
        n.cast("long").alias("n_gaps"),
        F.round(mean, 6).alias("mean_days"),
        F.round(
            F.when((n > 1) & (sg > 0), var / (mean * mean)), 6
        ).alias("cv2"),
        F.round(
            F.when(sg > 0, F.try_divide(n.cast("double"), sg.cast("double"))),
            6,
        ).alias("rate_per_day"),
    )
