"""Round-11 gate queries: structurally-INDEPENDENT oracle proofs
(r10 verdict ask #6 — grow the independent-oracle family 4 → 6).

The pattern (established by the editdist, kendall, skyline and minhash
proofs): the Spark side runs the scale-shaped plan the engine ships;
the DuckDB oracle solves the same problem by a DIFFERENT formulation —
brute force, transitive closure, direct containment — so a bug in the
shared algebra cannot be green on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olake_spark.queries import register, table
from olake_spark.queries_data_ops import _NORM, _TOKS

# ---------------------------------------------------------------------------
# 1) Connected components vs a recursive-CTE reachability oracle.
#
# The existing graph_connected_components oracle mirrors the min-label
# round algebra (8 unrolled CTE round pairs) — a wrong round count or a
# propagation bug that both sides share would be gate-green. This proof
# certifies the SAME operator against DuckDB's WITH RECURSIVE transitive
# closure: component(v) = min(u : u reachable from v), no rounds, no
# labels — reachability is the definition, not the algorithm.
#
# Graph: the SAME sampled co-occurrence graph as the existing
# graph_connected_components gate query (25% of orders, 8% md5 edge
# sample — dense enough that every component's shortcut-compressed
# diameter fits the 8-round contract; sparser slices were measured to
# chain past 13 rounds and violate the operator's short-diameter
# contract). 1,779 nodes / 19 components; the closure oracle runs in
# ~3 s at sf0.01.
# ---------------------------------------------------------------------------

_CC_REACH_ORACLE = """
WITH RECURSIVE pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM (SELECT * FROM lineitem WHERE l_orderkey % 4 = 0) a
  JOIN (SELECT * FROM lineitem WHERE l_orderkey % 4 = 0) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (
  SELECT src, dst FROM pairs
  WHERE ('0x' || substring(md5(src::VARCHAR || '|' || dst::VARCHAR), 1, 15))
        ::BIGINT % 100 < 8
),
und AS (
  SELECT src AS a, dst AS b FROM edges WHERE src <> dst
  UNION
  SELECT dst AS a, src AS b FROM edges WHERE src <> dst
),
reach(node, r) AS (
  SELECT a AS node, a AS r FROM und
  UNION
  SELECT x.node, u.b AS r FROM reach x JOIN und u ON u.a = x.r
)
SELECT node, min(r) AS component FROM reach GROUP BY node
"""


@register("graph_cc_reachability_proof", _CC_REACH_ORACLE)
def graph_cc_reachability_proof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components certified against pure REACHABILITY: the
    Spark side is the shipped fixed-round min-label + pointer-jumping
    plan (operators/graph.connected_components_fixed — labels-sized
    relations iterate, the pair fan-out happens once); the oracle is
    DuckDB's recursive transitive closure, which never sees labels or
    rounds. Equal output proves the round-bound propagation actually
    reaches the fixpoint the DEFINITION demands, not just the fixpoint
    the mirrored algebra agrees on."""
    from olake_spark.operators.graph import connected_components_fixed

    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .filter(F.col("l_orderkey") % 4 == 0)
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    ).distinct()
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("src").cast("string"),
                    F.col("dst").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    edges = pairs.filter(F.pmod(h, F.lit(100)) < 8)
    return connected_components_fixed(edges, rounds=8)


# ---------------------------------------------------------------------------
# 2) ExactSubstr spans vs brute-force substring CONTAINMENT.
#
# The existing dedup_exact_substr_spans oracle rebuilds the k-gram
# positional-inverted-index formulation in SQL — a shared tokenization
# or hashing bug would be green on both sides. This proof pins a slice
# of the corpus and asks the DIRECT question: for every token position,
# does the 5-token substring STARTING THERE literally appear (as a
# space-joined string) inside any OTHER document's normalized text?
# position() over raw strings — no grams, no hashes, no inverted index.
# A 60-bit gram-hash collision, an off-by-one in the positional window,
# or a tokenizer drift between the sides all surface here.
# ---------------------------------------------------------------------------

_SUBSTR_PIN_MOD = 3  # pinned slice: doc_id % 3 = 0 (~33% — the
# smallest slice that still carries cross-doc duplicate grams at
# sf0.01: 177 dup 5-grams / 6 spans; sparser slices were measured
# duplicate-free, which would make the proof vacuous)

_SUBSTR_CONTAIN_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {_SUBSTR_PIN_MOD} = 0
),
toks AS (SELECT doc_id, {_TOKS} AS l FROM docs),
txt AS (
  SELECT doc_id, ' ' || array_to_string(l, ' ') || ' ' AS s FROM toks
),
grams AS (
  SELECT doc_id, l, unnest(generate_series(1, len(l) - 4)) AS p
  FROM toks WHERE len(l) >= 5
),
gs AS (
  SELECT doc_id, p, array_to_string(l[p:p+4], ' ') AS g FROM grams
),
hits AS (
  SELECT g.doc_id, g.p FROM gs g
  WHERE EXISTS (
    SELECT 1 FROM txt t
    WHERE t.doc_id <> g.doc_id
      AND position(' ' || g.g || ' ' IN t.s) > 0
  )
),
pre AS (
  SELECT doc_id, p, lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
  FROM hits
),
isl AS (
  SELECT doc_id, p,
         sum(CASE WHEN prev IS NULL OR p - prev > 5 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING)
           AS island
  FROM pre
)
SELECT doc_id, min(p)::INT AS span_start, (max(p)+4)::INT AS span_end,
       (max(p)+4-min(p)+1)::INT AS span_len, count(*) AS n_grams
FROM isl GROUP BY doc_id, island
"""


@register("dedup_exact_substr_containment_proof", _SUBSTR_CONTAIN_ORACLE)
def dedup_exact_substr_containment_proof(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ExactSubstr span detection (operators/dedup.duplicate_spans — the
    k-gram positional-inverted-index plan: gram-hash shuffle for
    document frequency, id shuffle for the islands merge) certified on a
    pinned 1/3 corpus slice against a brute-force oracle that never
    builds grams: literal substring containment of each 5-token window
    in every other document's normalized text. The slice bounds the
    oracle's O(positions × docs) string scan; the Spark side runs the
    exact shipped plan on the same slice."""
    from olake_spark.operators import dedup as dd

    docs = table(spark, sf_dir, "documents").filter(
        F.pmod(F.col("doc_id"), F.lit(_SUBSTR_PIN_MOD)) == 0
    )
    return dd.duplicate_spans(docs, "doc_id", "text", min_len=5, min_docs=2)


# ---------------------------------------------------------------------------
# Round-11 operator wave: effect size, Kruskal-Wallis, BH-FDR, KS-GOF,
# log-rank, Cohen's kappa, chi2 goodness-of-fit, Jensen-Shannon,
# trimmed mean, power means, Shewhart I-MR.
# ---------------------------------------------------------------------------

_EFFECT_ORACLE = """
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
         CASE WHEN na > 0 THEN
           (na*qa - sa*sa)::DOUBLE / na::DOUBLE END AS ssa,
         CASE WHEN nb > 0 THEN
           (nb*qb - sb*sb)::DOUBLE / nb::DOUBLE END AS ssb
  FROM m
),
e AS (
  SELECT na, nb, ma, mb,
         CASE WHEN na + nb > 2
              THEN (ssa + ssb) / (na + nb - 2)::DOUBLE END AS sp2
  FROM d
)
SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
       round(ma / 1000000.0, 6) AS mean_a,
       round(mb / 1000000.0, 6) AS mean_b,
       round(sqrt(sp2) / 1000000.0, 6) AS pooled_sd,
       CASE WHEN sp2 > 0 THEN round((ma - mb) / sqrt(sp2), 6) END AS cohens_d,
       CASE WHEN sp2 > 0 THEN
         round(((ma - mb) / sqrt(sp2))
               * (1.0 - 3.0 / (4.0 * (na + nb)::DOUBLE - 9.0)), 6)
       END AS hedges_g
FROM e
"""


@register("lineitem_effect_size", _EFFECT_ORACLE)
def lineitem_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d + Hedges' g between returned and rejected lineitem
    prices (operators/abtest.effect_size_two_sample) — the magnitude
    companion to lineitem_welch_ttest's significance read. Same one-pass
    exact micro moments; reference-pinned in
    tests/test_stats_reference_pins.py."""
    from olake_spark.operators.abtest import effect_size_two_sample

    return effect_size_two_sample(
        table(spark, sf_dir, "lineitem"), "l_returnflag",
        "l_extendedprice", "A", "R",
    )


_KRUSKAL_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS g, round(l_quantity * 1000000)::BIGINT AS v
  FROM lineitem WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL
),
per_gv AS (
  SELECT g, v, count(*)::HUGEINT AS c FROM base GROUP BY 1, 2
),
vals AS (
  SELECT v, sum(c) AS tv FROM per_gv GROUP BY 1
),
ranked AS (
  SELECT v,
         2 * (sum(tv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - tv)
           + tv + 1 AS rank2
  FROM vals
),
per_g AS (
  SELECT g, sum(c) AS ng, sum(c * r.rank2) AS r2g
  FROM per_gv JOIN ranked r USING (v) GROUP BY g
),
ties AS (
  SELECT coalesce(sum(tv*tv*tv - tv), 0) AS tie FROM vals
),
agg AS (
  SELECT count(*) AS k, sum(ng) AS n,
         list_reduce(
           list(CASE WHEN ng > 0
                     THEN (r2g*r2g)::DOUBLE / (4*ng)::DOUBLE END
                ORDER BY g),
           (a, b) -> a + b
         ) AS rsum
  FROM per_g
)
SELECT k::BIGINT AS k_groups, n::BIGINT AS n, tie::BIGINT AS tie_correction,
       CASE WHEN n > 1 THEN
         round(12.0 * rsum / (n*(n+1))::DOUBLE - 3.0 * (n+1)::DOUBLE, 6)
       END AS h,
       CASE WHEN k > 1 AND n*n*n - n - tie > 0 THEN
         round((12.0 * rsum / (n*(n+1))::DOUBLE - 3.0 * (n+1)::DOUBLE)
               / (1.0 - tie::DOUBLE / (n*n*n - n)::DOUBLE), 6)
       END AS h_tie_corrected
FROM agg, ties
"""


@register("lineitem_kruskal_wallis", _KRUSKAL_ORACLE)
def lineitem_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H across the three returnflag arms on quantity
    (operators/abtest.kruskal_wallis) — the k-sample rank test, doubled
    ranks over the 50-value quantity domain (values-sized windows), the
    ordered-fold group sum. Reference-pinned vs a plain-Python rank
    computation in tests/test_stats_reference_pins.py."""
    from olake_spark.operators.abtest import kruskal_wallis

    return kruskal_wallis(
        table(spark, sf_dir, "lineitem"), "l_returnflag", "l_quantity"
    )


_BH_ORACLE = """
WITH fam AS (
  SELECT n_name,
         (('0x' || substring(md5(n_name || '|bh11'), 1, 15))::BIGINT
          % 1000000) / 1000000.0 AS p
  FROM nation
),
ranked AS (
  SELECT n_name, p,
         row_number() OVER (ORDER BY p, n_name) AS i,
         count(*) OVER () AS m
  FROM fam
)
SELECT n_name, round(p, 6) AS p, i::BIGINT AS rank,
       round(least(
         min(p * m::DOUBLE / i::DOUBLE)
           OVER (ORDER BY i DESC ROWS UNBOUNDED PRECEDING),
         1.0), 6) AS q,
       least(
         min(p * m::DOUBLE / i::DOUBLE)
           OVER (ORDER BY i DESC ROWS UNBOUNDED PRECEDING),
         1.0) <= 0.05 AS reject
FROM ranked
"""


@register("nation_bh_fdr", _BH_ORACLE)
def nation_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg step-up over a 25-member p-value family
    (operators/abtest.bh_fdr_adjust) — the correction every per-key
    test fleet owes. The family's p's are a deterministic md5-uniform
    fixture per nation (the operator consumes any p column; the gate
    certifies the rank / suffix-min / clip mechanics cross-engine)."""
    from olake_spark.operators.abtest import bh_fdr_adjust

    n = table(spark, sf_dir, "nation").select(
        "n_name",
        (
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("n_name"), F.lit("|bh11"))),
                        1, 15,
                    ),
                    16, 10,
                ).cast("long"),
                F.lit(1_000_000),
            )
            / 1_000_000.0
        ).alias("p"),
    )
    return bh_fdr_adjust(n, ["n_name"], "p", alpha=0.05)


_KSU_ORACLE = """
WITH s AS (
  SELECT round(((round(o_totalprice * 100)::BIGINT % 100) / 100.0)
               * 1000000)::BIGINT AS v
  FROM orders WHERE o_totalprice IS NOT NULL
),
per_val AS (SELECT v, count(*)::HUGEINT AS t FROM s GROUP BY 1),
cum AS (
  SELECT v, t,
         sum(t) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c,
         sum(t) OVER () AS n
  FROM per_val
),
agg AS (
  SELECT max(c * 1000000 - v::HUGEINT * n) AS dp_num,
         max(v::HUGEINT * n - (c - t) * 1000000) AS dm_num,
         any_value(n) AS n
  FROM cum
)
SELECT n::BIGINT AS n,
       round(greatest(dp_num::DOUBLE / (n * 1000000)::DOUBLE, 0.0), 6)
         AS d_plus,
       round(greatest(dm_num::DOUBLE / (n * 1000000)::DOUBLE, 0.0), 6)
         AS d_minus,
       round(greatest(greatest(dp_num::DOUBLE / (n * 1000000)::DOUBLE, 0.0),
                      greatest(dm_num::DOUBLE / (n * 1000000)::DOUBLE, 0.0)),
             6) AS d,
       round(sqrt(n::DOUBLE)
             * greatest(
                 greatest(dp_num::DOUBLE / (n * 1000000)::DOUBLE, 0.0),
                 greatest(dm_num::DOUBLE / (n * 1000000)::DOUBLE, 0.0)), 6)
         AS sqrt_n_d
FROM agg
"""


@register("orders_ks_uniform_cents", _KSU_ORACLE)
def orders_ks_uniform_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sample KS goodness-of-fit of the order totals' CENTS digits
    against Uniform[0,1] (operators/abtest.ks_uniform_gof) — the
    classic price-digit uniformity audit (fabricated or rounded prices
    fail it). Score = (cents mod 100)/100; exact-rational D over the
    101-value domain."""
    from olake_spark.operators.abtest import ks_uniform_gof

    o = table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    ).select(
        (
            F.pmod(
                F.round(F.col("o_totalprice") * 100).cast("long"), F.lit(100)
            )
            / 100.0
        ).alias("s")
    )
    return ks_uniform_gof(o, "s")


_LOGRANK_ORACLE = """
WITH subj AS (
  SELECT user_id,
         (epoch_us(max(ts)) // 3600000000)
           - (epoch_us(min(ts)) // 3600000000) AS dur,
         epoch_us(max(ts)) AS last_us,
         (user_id % 2)::INT AS grp
  FROM events GROUP BY user_id
),
cut AS (SELECT max(epoch_us(ts)) - 86400000000 AS cut_us FROM events),
per AS (
  SELECT dur,
         sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)::BIGINT AS cb,
         sum(CASE WHEN grp = 0 AND last_us < (SELECT cut_us FROM cut)
                  THEN 1 ELSE 0 END)::BIGINT AS da,
         sum(CASE WHEN grp = 1 AND last_us < (SELECT cut_us FROM cut)
                  THEN 1 ELSE 0 END)::BIGINT AS db
  FROM subj GROUP BY 1
),
risk AS (
  SELECT dur, da, db,
         (sum(ca) OVER ()
          - coalesce(sum(ca) OVER (ORDER BY dur
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         )::BIGINT AS n1,
         (sum(cb) OVER ()
          - coalesce(sum(cb) OVER (ORDER BY dur
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         )::BIGINT AS n2,
         sum(ca) OVER () AS na, sum(cb) OVER () AS nb
  FROM per
),
terms AS (
  SELECT any_value(na)::BIGINT AS n_a, any_value(nb)::BIGINT AS n_b,
         sum(da)::BIGINT AS o1,
         sum(CASE WHEN da + db > 0 THEN
           floor((da + db)::DOUBLE * (n1::DOUBLE / (n1 + n2)::DOUBLE)
                 * 1000000000)::BIGINT ELSE 0 END) AS e_nano,
         sum(CASE WHEN da + db > 0 AND n1 + n2 > 1 THEN
           floor((da + db)::DOUBLE * (n1::DOUBLE / (n1 + n2)::DOUBLE)
                 * (1.0 - n1::DOUBLE / (n1 + n2)::DOUBLE)
                 * ((n1 + n2 - da - db)::DOUBLE / (n1 + n2 - 1)::DOUBLE)
                 * 1000000000)::BIGINT ELSE 0 END) AS v_nano
  FROM risk
)
SELECT n_a, n_b, o1 AS observed_a,
       round(e_nano::DOUBLE / 1000000000, 6) AS expected_a,
       round(v_nano::DOUBLE / 1000000000, 6) AS variance,
       CASE WHEN v_nano > 0 THEN
         round((o1::DOUBLE - e_nano::DOUBLE / 1000000000)
               / sqrt(v_nano::DOUBLE / 1000000000), 6) END AS z,
       CASE WHEN v_nano > 0 THEN
         round(((o1::DOUBLE - e_nano::DOUBLE / 1000000000)
                / sqrt(v_nano::DOUBLE / 1000000000))
               * ((o1::DOUBLE - e_nano::DOUBLE / 1000000000)
                / sqrt(v_nano::DOUBLE / 1000000000)), 6) END AS chi2
FROM terms
"""


@register("events_logrank_by_parity", _LOGRANK_ORACLE)
def events_logrank_by_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test between even and odd user cohorts
    (operators/survival.logrank_test) — the hypothesis-test companion
    to events_survival_km, over the SAME subject derivation (duration =
    active hours; observed = lifetime ended before the global last day,
    the KM query's censoring rule). Risk sets are reverse-cumulative
    integers over the duration grid; E/V terms nano-floor."""
    from olake_spark.operators.survival import logrank_test

    ev = table(spark, sf_dir, "events")
    hours = (F.unix_micros(F.col("ts")) / F.lit(3_600_000_000)).cast("long")
    subj = ev.groupBy("user_id").agg(
        (F.max(hours) - F.min(hours)).alias("dur"),
        F.max(F.unix_micros(F.col("ts"))).alias("_last_us"),
    )
    cut = ev.agg(
        (F.max(F.unix_micros(F.col("ts"))) - F.lit(86_400_000_000)).alias(
            "_cut_us"
        )
    )
    subj = subj.crossJoin(F.broadcast(cut)).select(
        "dur",
        (F.col("_last_us") < F.col("_cut_us")).alias("observed"),
        (F.col("user_id") % 2).cast("int").alias("grp"),
    )
    return logrank_test(subj, "dur", "observed", "grp", 0, 1)


_KAPPA_ORACLE = """
WITH base AS (
  SELECT CASE WHEN value > 250.0 THEN 'hi' ELSE 'lo' END AS a,
         CASE WHEN event_type IN ('purchase', 'signup') THEN 'hi'
              ELSE 'lo' END AS b
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
),
cells AS (SELECT a, b, count(*)::HUGEINT AS c FROM base GROUP BY 1, 2),
la AS (SELECT a AS l, sum(c) AS r FROM cells GROUP BY 1),
lb AS (SELECT b AS l, sum(c) AS s FROM cells GROUP BY 1),
cross_m AS (
  SELECT coalesce(sum(la.r * lb.s), 0) AS rc
  FROM la JOIN lb USING (l)
),
agg AS (
  SELECT sum(c) AS n,
         sum(CASE WHEN a = b THEN c ELSE 0 END) AS diag,
         count(DISTINCT a) AS ka, count(DISTINCT b) AS kb
  FROM cells
)
SELECT n::BIGINT AS n, ka::BIGINT AS n_labels_a, kb::BIGINT AS n_labels_b,
       round(diag::DOUBLE / n::DOUBLE, 6) AS p_observed,
       round(rc::DOUBLE / (n * n)::DOUBLE, 6) AS p_expected,
       CASE WHEN n * n > rc THEN
         round((diag::DOUBLE / n::DOUBLE - rc::DOUBLE / (n * n)::DOUBLE)
               / (1.0 - rc::DOUBLE / (n * n)::DOUBLE), 6)
       END AS kappa
FROM agg, cross_m
"""


@register("events_cohens_kappa", _KAPPA_ORACLE)
def events_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between a value-threshold rater and an event-type
    rater over the events table (operators/audit.cohens_kappa) — the
    chance-corrected agreement audit (a heuristic label vs a rule label
    of the same items). Exact cell/marginal integers; reference-pinned
    in tests/test_stats_reference_pins.py."""
    from olake_spark.operators.audit import cohens_kappa

    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        F.when(F.col("value") > 250.0, "hi").otherwise("lo").alias("ra"),
        F.when(
            F.col("event_type").isin(["purchase", "signup"]), "hi"
        ).otherwise("lo").alias("rb"),
    )
    return cohens_kappa(ev, "ra", "rb")


_CHI2_GOF_ORACLE = """
WITH observed AS (
  SELECT c_nationkey::VARCHAR AS cat, count(*)::HUGEINT AS o
  FROM customer WHERE c_nationkey IS NOT NULL GROUP BY 1
),
m AS (
  SELECT o, 1000000::HUGEINT AS w,
         sum(o) OVER () AS n, sum(1000000::HUGEINT) OVER () AS wt
  FROM observed
),
cells AS (
  SELECT n,
         ((o * wt - n * w) * (o * wt - n * w) * 1000000)
           // (n * w * wt) AS cm
  FROM m
)
SELECT any_value(n)::BIGINT AS n, count(*)::BIGINT AS k_categories,
       coalesce(sum(cm), 0)::BIGINT AS chi2_total_micro,
       round(coalesce(sum(cm), 0)::DOUBLE / 1e6, 6) AS chi2
FROM cells
"""


@register("customer_chi2_gof_nations", _CHI2_GOF_ORACLE)
def customer_chi2_gof_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square goodness-of-fit of the customer→nation assignment
    against uniform (operators/audit.chi_square_gof) — "is the synthetic
    assignment actually balanced?". Floor-micro cell discipline, exact
    integer total."""
    from olake_spark.operators.audit import chi_square_gof

    return chi_square_gof(
        table(spark, sf_dir, "customer"), "c_nationkey"
    )


_JSD_ORACLE = """
WITH base AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS s, event_type
  FROM events WHERE event_type IS NOT NULL
),
cells AS (
  SELECT event_type,
         sum(CASE WHEN s = 'a' THEN 1 ELSE 0 END)::HUGEINT AS ca,
         sum(CASE WHEN s = 'b' THEN 1 ELSE 0 END)::HUGEINT AS cb
  FROM base GROUP BY 1
),
m AS (
  SELECT ca, cb, sum(ca) OVER () AS na, sum(cb) OVER () AS nb FROM cells
),
t AS (
  SELECT any_value(na) AS na, any_value(nb) AS nb, count(*) AS k,
         sum(CASE WHEN ca > 0 THEN
           floor((ca::DOUBLE / na::DOUBLE)
                 * ln((ca::DOUBLE / na::DOUBLE)
                      / ((ca::DOUBLE / na::DOUBLE
                          + cb::DOUBLE / nb::DOUBLE) / 2.0))
                 * 1000000000)::BIGINT ELSE 0 END) AS tp,
         sum(CASE WHEN cb > 0 THEN
           floor((cb::DOUBLE / nb::DOUBLE)
                 * ln((cb::DOUBLE / nb::DOUBLE)
                      / ((ca::DOUBLE / na::DOUBLE
                          + cb::DOUBLE / nb::DOUBLE) / 2.0))
                 * 1000000000)::BIGINT ELSE 0 END) AS tq
  FROM m
)
SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, k::BIGINT AS k_categories,
       round((tp + tq)::DOUBLE / 2.0 / 1000000000, 6) AS jsd_nats,
       round((tp + tq)::DOUBLE / 2.0 / 1000000000 / ln(2), 6) AS jsd_bits
FROM t
"""


@register("events_jsd_user_parity", _JSD_ORACLE)
def events_jsd_user_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between the event-type mixes of the
    even and odd user cohorts (operators/audit.js_divergence) — the
    bounded symmetric drift read (an A/A-style check here: the parity
    split should read ≈ 0). Nano-floored cell terms."""
    from olake_spark.operators.audit import js_divergence

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    ).select(
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias("side"),
        "event_type",
    )
    return js_divergence(ev, "side", "event_type", "a", "b")


_TRIMMED_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS g, round(l_extendedprice * 1000000)::BIGINT AS vm
  FROM lineitem WHERE l_extendedprice IS NOT NULL
),
ranked AS (
  SELECT g, vm,
         row_number() OVER (PARTITION BY g ORDER BY vm) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM base
),
cut AS (SELECT g, vm, rn, n, (n * 100000) // 1000000 AS k FROM ranked)
SELECT g AS l_returnflag, any_value(n)::BIGINT AS n,
       any_value(k)::BIGINT AS k_each_side,
       CASE WHEN any_value(n) > 2 * any_value(k) THEN
         round(sum(CASE WHEN rn > k AND rn <= n - k THEN vm
                        ELSE 0 END)::DOUBLE
               / ((any_value(n) - 2 * any_value(k))::DOUBLE * 1000000.0), 6)
       END AS trimmed_mean
FROM cut GROUP BY g
"""


@register("lineitem_trimmed_mean_by_flag", _TRIMMED_ORACLE)
def lineitem_trimmed_mean_by_flag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """10%-trimmed mean of extendedprice per returnflag
    (operators/quantiles.trimmed_mean) — robust location with the tails
    DROPPED. The Spark side never sorts rows: per-(group, value) counts
    + one cumulative window over each group's distinct-value relation,
    kept mass = exact rank-interval overlap. The oracle is the
    independent row_number formulation (sort-and-slice) — a different
    algorithm for the same order statistics, so rank/tie bugs can't
    hide."""
    from olake_spark.operators.quantiles import trimmed_mean

    return trimmed_mean(
        table(spark, sf_dir, "lineitem"),
        ["l_returnflag"],
        "l_extendedprice",
        trim=0.1,
    )


_PMEANS_ORACLE = """
WITH base AS (
  SELECT p_brand, round(p_retailprice * 1000000)::BIGINT AS vm
  FROM part WHERE p_retailprice IS NOT NULL
),
agg AS (
  SELECT p_brand,
         sum(CASE WHEN vm > 0 THEN 1 ELSE 0 END)::BIGINT AS n,
         sum(CASE WHEN vm <= 0 THEN 1 ELSE 0 END)::BIGINT AS n_nonpositive,
         sum(CASE WHEN vm > 0 THEN vm ELSE 0 END)::HUGEINT AS s,
         sum(CASE WHEN vm > 0
             THEN floor(ln(vm::DOUBLE / 1e6) * 1e9)::BIGINT
             ELSE 0 END)::HUGEINT AS lns,
         sum(CASE WHEN vm > 0 THEN 1000000000000000 // vm
             ELSE 0 END)::HUGEINT AS inv
  FROM base GROUP BY 1
)
SELECT p_brand, n, n_nonpositive,
       CASE WHEN n > 0
            THEN round(s::DOUBLE / (n::DOUBLE * 1e6), 6) END AS mean_arith,
       CASE WHEN n > 0
            THEN round(exp(lns::DOUBLE / (n::DOUBLE * 1e9)), 6)
       END AS mean_geom,
       CASE WHEN inv > 0
            THEN round(n::DOUBLE * 1e9 / inv::DOUBLE, 6)
       END AS mean_harm
FROM agg
"""


@register("part_power_means_by_brand", _PMEANS_ORACLE)
def part_power_means_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic/geometric/harmonic retail-price means per brand
    (operators/profile.power_means) — the three Pythagorean means in
    one pass; the harmonic reciprocal sum is PURE integer division
    (10^15 div micro-value), the geometric log-sum nano-floors.
    AM >= GM >= HM on every row for free."""
    from olake_spark.operators.profile import power_means

    return power_means(
        table(spark, sf_dir, "part"), ["p_brand"], "p_retailprice"
    )


_SHEWHART_ORACLE = """
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS t,
         sum(round(value * 1000000)::BIGINT) AS x
  FROM events GROUP BY 1
),
mr AS (
  SELECT x, abs(x - lag(x) OVER (ORDER BY t)) AS m FROM daily
),
agg AS (
  SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS s,
         sum(m)::HUGEINT AS smr
  FROM mr
),
lim AS (
  SELECT n, s::DOUBLE / n::DOUBLE AS center,
         CASE WHEN n > 1 THEN smr::DOUBLE / (n - 1)::DOUBLE END AS mrbar
  FROM agg
),
f AS (
  SELECT n, center, mrbar,
         center + 2.66 * mrbar AS ucl, center - 2.66 * mrbar AS lcl
  FROM lim
)
SELECT f.n::BIGINT AS n_buckets,
       round(f.center / 1e6, 6) AS center,
       round(f.mrbar / 1e6, 6) AS mr_bar,
       round(f.ucl / 1e6, 6) AS ucl,
       round(f.lcl / 1e6, 6) AS lcl,
       CASE WHEN f.n > 1 THEN (
         SELECT count(*) FROM daily WHERE daily.x::DOUBLE > f.ucl
       ) ELSE 0 END::BIGINT AS n_above,
       CASE WHEN f.n > 1 THEN (
         SELECT count(*) FROM daily WHERE daily.x::DOUBLE < f.lcl
       ) ELSE 0 END::BIGINT AS n_below
FROM f
"""


@register("events_shewhart_imr", _SHEWHART_ORACLE)
def events_shewhart_imr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart individuals/moving-range control chart over the daily
    value totals (operators/anomaly.shewhart_individuals) — SPC limits
    x-bar ± 2.66·MR-bar and the out-of-control day counts. Exact
    integer series and moving ranges; one lag window over the bucket
    relation."""
    from olake_spark.operators.anomaly import shewhart_individuals

    return shewhart_individuals(
        table(spark, sf_dir, "events"), "ts", "value"
    )


_MSPRT_ORACLE = """
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
         (CASE WHEN na > 0 THEN sa::DOUBLE / na::DOUBLE END
          - CASE WHEN nb > 0 THEN sb::DOUBLE / nb::DOUBLE END) / 1e6
           AS delta,
         (CASE WHEN na > 1 THEN
            ((na*qa - sa*sa)::DOUBLE / (na*(na-1))::DOUBLE) / na::DOUBLE
          END
          + CASE WHEN nb > 1 THEN
            ((nb*qb - sb*sb)::DOUBLE / (nb*(nb-1))::DOUBLE) / nb::DOUBLE
          END) / 1e12 AS v
  FROM m
),
l AS (
  SELECT na, nb, delta, v,
         CASE WHEN v > 0 THEN
           sqrt(v / (v + 10000.0))
           * exp(delta * delta * 10000.0 / (2.0 * v * (v + 10000.0)))
         END AS lam
  FROM d
)
SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
       round(delta, 6) AS delta, round(v, 6) AS v,
       round(lam, 6) AS lambda_mix,
       CASE WHEN lam IS NOT NULL
            THEN round(least(1.0, 1.0 / lam), 6) END AS p_always_valid
FROM l
"""


@register("lineitem_msprt_always_valid", _MSPRT_ORACLE)
def lineitem_msprt_always_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid mSPRT p-value for the A-vs-R price difference
    (operators/abtest.msprt_always_valid, Johari et al. 2017) — the
    peek-safe sequential companion to lineitem_welch_ttest; prior
    effect scale τ = 100 price units. Reference-pinned in
    tests/test_stats_reference_pins.py."""
    from olake_spark.operators.abtest import msprt_always_valid

    return msprt_always_valid(
        table(spark, sf_dir, "lineitem"), "l_returnflag",
        "l_extendedprice", "A", "R", tau=100.0,
    )


_EB_ORACLE = """
WITH per AS (
  SELECT n_nationkey,
         count(*)::BIGINT AS n,
         sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)::BIGINT AS k
  FROM customer JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1
),
staged AS (
  SELECT n_nationkey, n, k,
         floor((k::DOUBLE / n::DOUBLE) * 1000000000)::BIGINT AS p_nano,
         floor((k::DOUBLE / n::DOUBLE) * (k::DOUBLE / n::DOUBLE)
               * 1000000000)::BIGINT AS pp_nano
  FROM per WHERE n > 0
),
fam AS (
  SELECT n_nationkey, n, k,
         count(*) OVER () AS kk,
         sum(p_nano) OVER () AS sp, sum(pp_nano) OVER () AS spp
  FROM staged
),
fit AS (
  SELECT n_nationkey, n, k, kk,
         sp::DOUBLE / 1000000000 / kk::DOUBLE AS m,
         CASE WHEN kk > 1 THEN
           (spp::DOUBLE / 1000000000
            - kk::DOUBLE * (sp::DOUBLE / 1000000000 / kk::DOUBLE)
                         * (sp::DOUBLE / 1000000000 / kk::DOUBLE))
           / (kk::DOUBLE - 1.0) END AS v
  FROM fam
),
pri AS (
  SELECT n_nationkey, n, k, m, v,
         (v > 0 AND v < m * (1.0 - m)) AS ok,
         CASE WHEN v > 0 AND v < m * (1.0 - m)
              THEN m * (m * (1.0 - m) / v - 1.0) END AS alpha,
         CASE WHEN v > 0 AND v < m * (1.0 - m)
              THEN (1.0 - m) * (m * (1.0 - m) / v - 1.0) END AS beta
  FROM fit
)
SELECT n_nationkey, n, k,
       round(k::DOUBLE / n::DOUBLE, 6) AS p_raw,
       round(alpha, 6) AS alpha, round(beta, 6) AS beta,
       round(CASE WHEN ok
                  THEN (k::DOUBLE + alpha) / (n::DOUBLE + alpha + beta)
                  ELSE k::DOUBLE / n::DOUBLE END, 6) AS p_shrunk
FROM pri
"""


@register("customer_eb_shrunk_rates", _EB_ORACLE)
def customer_eb_shrunk_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of per-nation
    positive-balance rates (operators/abtest.eb_beta_binomial_shrink) —
    the leaderboard fix: method-of-moments Beta prior over the
    25-nation family, small nations shrink toward it. Nano-floored
    family moments; reference-pinned."""
    from olake_spark.operators.abtest import eb_beta_binomial_shrink

    c = table(spark, sf_dir, "customer").join(
        F.broadcast(table(spark, sf_dir, "nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select(
        "n_nationkey",
        (F.col("c_acctbal") > 0).cast("long").alias("succ"),
        F.lit(1).alias("trial"),
    )
    return eb_beta_binomial_shrink(c, ["n_nationkey"], "succ", "trial")


_JT_ORACLE = """
WITH lx AS (
  SELECT l_quantity,
         (['AIR','REG AIR','MAIL','SHIP','TRUCK','RAIL','FOB'])
           [1 + (l_orderkey + l_linenumber) % 7] AS l_shipmode
  FROM lineitem
),
base AS (
  SELECT CASE l_shipmode
           WHEN 'AIR' THEN 0 WHEN 'FOB' THEN 1 WHEN 'MAIL' THEN 2
           WHEN 'RAIL' THEN 3 WHEN 'REG AIR' THEN 4 WHEN 'SHIP' THEN 5
           WHEN 'TRUCK' THEN 6 END AS g,
         round(l_quantity * 1000000)::BIGINT AS v
  FROM lx WHERE l_quantity IS NOT NULL AND l_shipmode IS NOT NULL
),
cells AS (SELECT g, v, count(*)::HUGEINT AS c FROM base GROUP BY 1, 2),
j AS (
  SELECT coalesce(sum(CASE WHEN a.v < b.v THEN 2 * a.c * b.c
                           WHEN a.v = b.v THEN a.c * b.c
                           ELSE 0 END), 0) AS j2
  FROM cells a JOIN cells b ON a.g < b.g
),
sizes AS (
  SELECT count(*) AS k, coalesce(sum(ng), 0) AS n,
         coalesce(sum(ng * ng), 0) AS n2,
         coalesce(sum(ng * ng * (2 * ng + 3)), 0) AS n23
  FROM (SELECT g, sum(c) AS ng FROM cells GROUP BY 1)
)
SELECT k::BIGINT AS k_groups, n::BIGINT AS n, j2::BIGINT AS j2,
       CASE WHEN (n * n * (2 * n + 3) - n23) > 0 THEN
         round((j2::DOUBLE - (n * n - n2)::DOUBLE / 2.0)
               / (2.0 * sqrt((n * n * (2 * n + 3) - n23)::DOUBLE / 72.0)), 6)
       END AS z
FROM j, sizes
"""


@register("lineitem_jonckheere_shipmode", _JT_ORACLE)
def lineitem_jonckheere_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere–Terpstra ordered-trend test of quantity across the
    seven DERIVED ship modes (the TPC-H _li_ext closed form) in lexical order
    (operators/abtest.jonckheere_terpstra) — the ordered-alternative
    k-sample test via the kendall cell-histogram trick (7 × 50-value
    grid, never row pairs). Reference-pinned."""
    from olake_spark.operators.abtest import jonckheere_terpstra
    from olake_spark.queries import _li_ext

    modes = ["AIR", "FOB", "MAIL", "RAIL", "REG AIR", "SHIP", "TRUCK"]
    return jonckheere_terpstra(
        _li_ext(table(spark, sf_dir, "lineitem")),
        "l_shipmode", "l_quantity", modes,
    )


_HEAPS_ORACLE = f"""
WITH ids AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
base AS (
  SELECT CAST(((doc_id - lo) * 32) // (hi - lo + 1) AS INT) AS b,
         {_TOKS} AS l
  FROM documents, ids
),
tok AS (
  SELECT b, unnest(l) AS t FROM base
),
tok_ne AS (SELECT b, t FROM tok WHERE t <> ''),
first_seen AS (SELECT t, min(b) AS fb FROM tok_ne GROUP BY 1),
new_vocab AS (SELECT fb AS b, count(*)::HUGEINT AS nv FROM first_seen GROUP BY 1),
tok_mass AS (SELECT b, count(*)::HUGEINT AS nt FROM tok_ne GROUP BY 1),
docs_per AS (SELECT b, count(*)::HUGEINT AS nd FROM base GROUP BY 1),
per_bucket AS (
  SELECT d.b, coalesce(m.nt, 0) AS nt, coalesce(v.nv, 0) AS nv, d.nd
  FROM docs_per d
  LEFT JOIN tok_mass m ON m.b = d.b
  LEFT JOIN new_vocab v ON v.b = d.b
),
cum AS (
  SELECT b, nd,
         sum(nt) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cn,
         sum(nv) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cv
  FROM per_bucket
),
pts AS (
  SELECT nd, cn, cv,
         floor(ln(cn::DOUBLE) * 1e9)::BIGINT AS x,
         floor(ln(cv::DOUBLE) * 1e9)::BIGINT AS y,
         floor(ln(cn::DOUBLE) * ln(cn::DOUBLE) * 1e9)::BIGINT AS xx,
         floor(ln(cn::DOUBLE) * ln(cv::DOUBLE) * 1e9)::BIGINT AS xy
  FROM cum WHERE cn > 0 AND cv > 0
),
agg AS (
  SELECT count(*)::HUGEINT AS n, sum(nd) AS docs,
         max(cn) AS toktot, max(cv) AS vocab,
         sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
         sum(xx)::HUGEINT AS sxx, sum(xy)::HUGEINT AS sxy
  FROM pts
),
fit AS (
  SELECT n, docs, toktot, vocab,
         (n * 1000000000 * sxx - sx * sx)::DOUBLE AS den,
         (n * 1000000000 * sxy - sx * sy)::DOUBLE AS num,
         sx, sy
  FROM agg
)
SELECT n::BIGINT AS n_buckets_used, docs::BIGINT AS n_docs,
       toktot::BIGINT AS n_tokens, vocab::BIGINT AS vocab,
       CASE WHEN n > 1 AND den > 0
            THEN round(num / den, 6) END AS heaps_beta,
       CASE WHEN n > 1 AND den > 0 THEN
         round(exp((sy::DOUBLE - (num / den) * sx::DOUBLE)
                   / n::DOUBLE / 1e9), 6)
       END AS heaps_k
FROM fit
"""


@register("documents_heaps_law", _HEAPS_ORACLE)
def documents_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit over the documents corpus in
    doc_id order (operators/text.heaps_law) — "is new data bringing new
    words?". 32 fixed id-range buckets via a 1-row (min, max)
    broadcast; token first-appearance buckets; the ln-ln OLS over the
    bucket relation with the loglog-elasticity nano discipline."""
    from olake_spark.operators.text import heaps_law

    return heaps_law(
        table(spark, sf_dir, "documents"), "doc_id", "text", buckets=32
    )


_ETA2_ORACLE = """
WITH per AS (
  SELECT l_returnflag AS g,
         count(*)::HUGEINT AS n,
         sum(round(l_extendedprice * 1000000)::BIGINT)::HUGEINT AS s,
         sum(round(l_extendedprice * 1000000)::BIGINT::HUGEINT
             * round(l_extendedprice * 1000000)::BIGINT) AS q
  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1
),
terms AS (
  SELECT g,
         (n*q - s*s)::DOUBLE / n::DOUBLE AS w,
         (s*s)::DOUBLE / n::DOUBLE AS b
  FROM per
),
agg AS (
  SELECT count(*) AS k,
         (SELECT sum(n) FROM per) AS nt,
         (SELECT sum(s) FROM per) AS st,
         list_reduce(list(w ORDER BY g), (a, x) -> a + x) AS ssw,
         list_reduce(list(b ORDER BY g), (a, x) -> a + x) AS sb_sum
  FROM terms
),
ss AS (
  SELECT k, nt,
         round((sb_sum - (st*st)::DOUBLE / nt::DOUBLE) / 1e12, 6) AS ssb6,
         round(ssw / 1e12, 6) AS ssw6
  FROM agg
)
SELECT k::BIGINT AS k_groups, nt::BIGINT AS n,
       CASE WHEN ssb6 + ssw6 > 0
            THEN round(ssb6 / (ssb6 + ssw6), 6) END AS eta2,
       CASE WHEN ssb6 + ssw6 > 0
            THEN round(sqrt(ssb6 / (ssb6 + ssw6)), 6) END AS eta
FROM ss
"""


@register("lineitem_eta_squared", _ETA2_ORACLE)
def lineitem_eta_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation ratio eta-squared of extendedprice across the
    returnflag arms (operators/abtest.correlation_ratio) — the
    effect-size companion to the ANOVA F: SS_between/SS_total on the
    0-1 scale. Same exact-moment + ordered-fold core."""
    from olake_spark.operators.abtest import correlation_ratio

    return correlation_ratio(
        table(spark, sf_dir, "lineitem"), "l_returnflag", "l_extendedprice"
    )


_TOPSHARE_ORACLE = """
WITH base AS (
  SELECT c_nationkey, round(c_acctbal * 1000000)::BIGINT AS vm
  FROM customer WHERE c_acctbal IS NOT NULL
),
ranked AS (
  SELECT c_nationkey, vm,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY vm DESC) AS rn,
         count(*) OVER (PARTITION BY c_nationkey) AS n,
         sum(vm::HUGEINT) OVER (PARTITION BY c_nationkey) AS tot
  FROM base
),
cut AS (
  SELECT c_nationkey, vm, rn, n, tot,
         n - ((n * 900000) // 1000000) AS k
  FROM ranked
)
SELECT c_nationkey, any_value(n)::BIGINT AS n,
       any_value(k)::BIGINT AS k_top,
       round(any_value(tot)::DOUBLE / 1e6, 6) AS total,
       round(sum(CASE WHEN rn <= k THEN vm ELSE 0 END)::DOUBLE / 1e6, 6)
         AS top_sum,
       round(sum(CASE WHEN rn <= k THEN vm ELSE 0 END)::DOUBLE
             / any_value(tot)::DOUBLE, 6) AS top_share
FROM cut GROUP BY c_nationkey
"""


@register("customer_top_decile_share", _TOPSHARE_ORACLE)
def customer_top_decile_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation share of account-balance mass held by the top 10% of
    customers (operators/audit.top_share) — the operating-point
    concentration read next to Gini. Spark side is the rank-interval
    counts formulation (no per-group sort); the oracle is the
    independent row_number sort-and-slice."""
    from olake_spark.operators.audit import top_share

    return top_share(
        table(spark, sf_dir, "customer"), ["c_nationkey"], "c_acctbal",
        p=0.1,
    )


_FLESCH_ORACLE = """
WITH per_doc AS (
  SELECT lang,
         CASE WHEN trim(lower(text)) = '' THEN 0
              ELSE len(string_split_regex(trim(lower(text)), '\\s+'))
         END::BIGINT AS w,
         greatest(1, len(regexp_split_to_array(text, '[.!?]+')) - 1)
           ::BIGINT AS s,
         (len(regexp_split_to_array(lower(text), '[aeiouy]+')) - 1)
           ::BIGINT AS y
  FROM documents
),
staged AS (
  SELECT lang, (w > 0) AS ok,
         CASE WHEN w > 0
              THEN floor((w::DOUBLE / s::DOUBLE) * 1000000000)::BIGINT
              ELSE 0 END AS wps_n,
         CASE WHEN w > 0
              THEN floor((y::DOUBLE / w::DOUBLE) * 1000000000)::BIGINT
              ELSE 0 END AS spw_n,
         CASE WHEN w > 0
              THEN floor((206.835 - 1.015 * (w::DOUBLE / s::DOUBLE)
                          - 84.6 * (y::DOUBLE / w::DOUBLE))
                         * 1000000000)::BIGINT
              ELSE 0 END AS fre_n
  FROM per_doc
)
SELECT lang,
       sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT AS n_docs,
       sum(CASE WHEN ok THEN 0 ELSE 1 END)::BIGINT AS n_empty,
       round(sum(wps_n)::DOUBLE / 1000000000
             / sum(CASE WHEN ok THEN 1 ELSE 0 END)::DOUBLE, 6)
         AS avg_words_per_sentence,
       round(sum(spw_n)::DOUBLE / 1000000000
             / sum(CASE WHEN ok THEN 1 ELSE 0 END)::DOUBLE, 6)
         AS avg_syllables_per_word,
       round(sum(fre_n)::DOUBLE / 1000000000
             / sum(CASE WHEN ok THEN 1 ELSE 0 END)::DOUBLE, 6)
         AS avg_flesch
FROM staged GROUP BY lang
"""


@register("documents_flesch_by_lang", _FLESCH_ORACLE)
def documents_flesch_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease census per language
    (operators/quality.flesch_reading_ease) — readability screen with
    engine-portable word/sentence/vowel-run proxies; per-doc ratios
    nano-floored before the group sums."""
    from olake_spark.operators.quality import flesch_reading_ease

    return flesch_reading_ease(
        table(spark, sf_dir, "documents"), "doc_id", "text", by=["lang"]
    )


_BRIDGE_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS g,
         year(l_shipdate) AS yr,
         round((l_extendedprice / l_quantity) * 1000000)::BIGINT AS pm,
         round(l_quantity * 1000000)::BIGINT AS qm
  FROM lineitem
  WHERE l_quantity > 0 AND l_extendedprice IS NOT NULL
    AND year(l_shipdate) IN (1996, 1997)
),
agg AS (
  SELECT g,
         sum(CASE WHEN yr = 1996 THEN qm ELSE 0 END)::HUGEINT AS qa,
         sum(CASE WHEN yr = 1996 THEN pm::HUGEINT * qm ELSE 0 END) AS ra,
         sum(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS na,
         sum(CASE WHEN yr = 1997 THEN qm ELSE 0 END)::HUGEINT AS qb,
         sum(CASE WHEN yr = 1997 THEN pm::HUGEINT * qm ELSE 0 END) AS rb,
         sum(CASE WHEN yr = 1997 THEN 1 ELSE 0 END) AS nb
  FROM base GROUP BY 1
),
eff AS (
  SELECT g, na, nb,
         ra::DOUBLE / 1e12 AS rad, rb::DOUBLE / 1e12 AS rbd,
         qa::DOUBLE / 1e6 AS qad, qb::DOUBLE / 1e6 AS qbd,
         CASE WHEN qa > 0 THEN (ra::DOUBLE / 1e12) / (qa::DOUBLE / 1e6) END
           AS pa,
         CASE WHEN qb > 0 THEN (rb::DOUBLE / 1e12) / (qb::DOUBLE / 1e6) END
           AS pb
  FROM agg
)
SELECT g AS l_returnflag,
       round(rad, 6) AS rev_a, round(rbd, 6) AS rev_b,
       round(rbd - rad, 6) AS delta_rev,
       CASE WHEN na > 0 AND nb > 0
            THEN round((pb - pa) * qad, 6) END AS price_effect,
       CASE WHEN na > 0 AND nb > 0
            THEN round((qbd - qad) * pa, 6) END AS volume_effect,
       CASE WHEN na > 0 AND nb > 0
            THEN round((pb - pa) * (qbd - qad), 6) END AS joint_effect
FROM eff
"""


@register("lineitem_revenue_bridge", _BRIDGE_ORACLE)
def lineitem_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/volume revenue bridge 1996 -> 1997 per returnflag
    (operators/timeseries.revenue_bridge) — why did revenue move:
    realized-unit-price effect, volume effect, joint residual; the
    three effects reconcile to delta_rev."""
    from olake_spark.operators.timeseries import revenue_bridge

    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & F.col("l_extendedprice").isNotNull()
    ).select(
        "l_returnflag",
        F.year("l_shipdate").alias("yr"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        "l_quantity",
    )
    return revenue_bridge(
        li, ["l_returnflag"], "yr", "unit_price", "l_quantity", 1996, 1997
    )


_PROPZ_ORACLE = """
WITH base AS (
  SELECT CASE WHEN o_custkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
         (o_totalprice > 150000.0) AS s
  FROM orders WHERE o_totalprice IS NOT NULL
),
agg AS (
  SELECT sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END)::BIGINT AS na,
         sum(CASE WHEN g = 'a' AND s THEN 1 ELSE 0 END)::BIGINT AS ka,
         sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END)::BIGINT AS nb,
         sum(CASE WHEN g = 'b' AND s THEN 1 ELSE 0 END)::BIGINT AS kb
  FROM base
)
SELECT na AS n_a, ka AS k_a, nb AS n_b, kb AS k_b,
       round(ka::DOUBLE / na::DOUBLE, 6) AS p_a,
       round(kb::DOUBLE / nb::DOUBLE, 6) AS p_b,
       CASE WHEN ((ka + kb)::DOUBLE / (na + nb)::DOUBLE)
                 * (1.0 - (ka + kb)::DOUBLE / (na + nb)::DOUBLE)
                 * (1.0 / na::DOUBLE + 1.0 / nb::DOUBLE) > 0 THEN
         round((ka::DOUBLE / na::DOUBLE - kb::DOUBLE / nb::DOUBLE)
               / sqrt(((ka + kb)::DOUBLE / (na + nb)::DOUBLE)
                      * (1.0 - (ka + kb)::DOUBLE / (na + nb)::DOUBLE)
                      * (1.0 / na::DOUBLE + 1.0 / nb::DOUBLE)), 6)
       END AS z
FROM agg
"""


@register("orders_two_prop_ztest", _PROPZ_ORACLE)
def orders_two_prop_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z of the big-order rate between even and odd
    customer cohorts (operators/abtest.two_proportion_ztest) — the
    pooled-variance conversion test; an A/A-style check here (parity
    should read z near 0). Reference-pinned."""
    from olake_spark.operators.abtest import two_proportion_ztest

    o = table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    ).select(
        F.when(F.col("o_custkey") % 2 == 0, "a").otherwise("b").alias("g"),
        (F.col("o_totalprice") > 150000.0).alias("s"),
    )
    return two_proportion_ztest(o, "g", "s", "a", "b")


_ODDS_ORACLE = """
WITH base AS (
  SELECT (user_id % 2 = 0) AS e, (value > 250.0) AS o
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
),
agg AS (
  SELECT sum(CASE WHEN e AND o THEN 1 ELSE 0 END)::BIGINT AS a,
         sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS b,
         sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)::BIGINT AS c,
         sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS d
  FROM base
),
f AS (
  SELECT a, b, c, d,
         CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
              THEN (a::DOUBLE * d::DOUBLE) / (b::DOUBLE * c::DOUBLE)
         END AS orr,
         CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
              THEN sqrt(1.0/a::DOUBLE + 1.0/b::DOUBLE
                        + 1.0/c::DOUBLE + 1.0/d::DOUBLE)
         END AS se
  FROM agg
)
SELECT a AS n_eo, b AS n_en, c AS n_ce, d AS n_cn,
       round(orr, 6) AS odds_ratio,
       round(ln(orr), 6) AS log_or,
       round(se, 6) AS se_log_or,
       round(exp(ln(orr) - 1.96 * se), 6) AS ci_lo,
       round(exp(ln(orr) + 1.96 * se), 6) AS ci_hi
FROM f
"""


@register("events_odds_ratio", _ODDS_ORACLE)
def events_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x2 odds ratio of high-value events between the even and odd
    user cohorts (operators/abtest.odds_ratio) with the Woolf log-OR
    interval — exact cells, one IEEE sequence."""
    from olake_spark.operators.abtest import odds_ratio

    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        (F.col("user_id") % 2 == 0).alias("e"),
        (F.col("value") > 250.0).alias("o"),
    )
    return odds_ratio(ev, "e", "o")


_NEYMAN_ORACLE = """
WITH per AS (
  SELECT s_nationkey,
         count(*)::HUGEINT AS n,
         sum(round(s_acctbal * 1000000)::BIGINT)::HUGEINT AS s,
         sum(round(s_acctbal * 1000000)::BIGINT::HUGEINT
             * round(s_acctbal * 1000000)::BIGINT) AS q
  FROM supplier WHERE s_acctbal IS NOT NULL GROUP BY 1
),
sdv AS (
  SELECT s_nationkey, n,
         coalesce(CASE WHEN n > 1 THEN
           sqrt((n*q - s*s)::DOUBLE / (n*(n-1))::DOUBLE) / 1e6 END, 0.0)
           AS sd
  FROM per
),
meas AS (
  SELECT s_nationkey, n, sd,
         round(n::DOUBLE * sd * 1000000)::HUGEINT AS m
  FROM sdv
),
frac AS (
  SELECT s_nationkey, n, sd,
         coalesce(1000.0 * (
           (CASE WHEN sum(m) OVER () > 0 THEN m ELSE n END)::DOUBLE
           / nullif(CASE WHEN sum(m) OVER () > 0 THEN sum(m) OVER ()
                         ELSE sum(n) OVER () END, 0)::DOUBLE), 0.0) AS f
  FROM meas
),
ranked AS (
  SELECT s_nationkey, n, sd, f,
         floor(f)::BIGINT AS base,
         row_number() OVER (ORDER BY f - floor(f) DESC, s_nationkey)
           AS rk,
         1000 - sum(floor(f)::BIGINT) OVER () AS leftn
  FROM frac
)
SELECT s_nationkey, n::BIGINT AS n_pop, round(sd, 6) AS sd,
       round(f, 6) AS alloc_frac,
       (base + CASE WHEN rk <= leftn THEN 1 ELSE 0 END)::BIGINT AS alloc_n
FROM ranked
"""


@register("supplier_neyman_allocation", _NEYMAN_ORACLE)
def supplier_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal allocation of a 1000-unit sample budget across
    supplier nations by account-balance SD
    (operators/sampling.neyman_allocation) — n_h proportional to
    N_h*S_h, with the Hamilton largest-remainder integerization whose
    alloc_n column sums exactly to the budget."""
    from olake_spark.operators.sampling import neyman_allocation

    return neyman_allocation(
        table(spark, sf_dir, "supplier"), ["s_nationkey"], "s_acctbal",
        total_n=1000,
    )


_KISH_ORACLE = """
WITH base AS (
  SELECT o_orderpriority,
         (1 + o_custkey % 5)::DOUBLE AS w, o_totalprice AS x
  FROM orders WHERE o_totalprice IS NOT NULL
),
agg AS (
  SELECT o_orderpriority,
         count(*)::BIGINT AS n,
         sum(round(w * 1000000)::BIGINT)::HUGEINT AS sw,
         sum(round(w * 1000000)::BIGINT::HUGEINT
             * round(w * 1000000)::BIGINT) AS sww,
         sum(round(w * 1000000)::BIGINT::HUGEINT
             * round(x * 1000000)::BIGINT) AS swx
  FROM base GROUP BY 1
)
SELECT o_orderpriority, n, 0::BIGINT AS n_excluded,
       round(swx::DOUBLE / sw::DOUBLE / 1e6, 6) AS mean_w,
       round((sw*sw)::DOUBLE / sww::DOUBLE, 6) AS n_eff,
       round(n::DOUBLE / ((sw*sw)::DOUBLE / sww::DOUBLE), 6) AS deff
FROM agg
"""


@register("orders_kish_weighted_mean", _KISH_ORACLE)
def orders_kish_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey-weighted order-total mean per priority with Kish n_eff
    and design effect (operators/abtest.kish_weighted_mean); weights
    are the deterministic 1+(custkey%5) replication fixture. Exact
    micro-squared moment products."""
    from olake_spark.operators.abtest import kish_weighted_mean

    o = table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    ).select(
        "o_orderpriority",
        (1 + F.col("o_custkey") % 5).cast("double").alias("w"),
        F.col("o_totalprice").alias("x"),
    )
    return kish_weighted_mean(o, ["o_orderpriority"], "x", "w")


_CA_ORACLE = """
WITH base AS (
  SELECT o_orderpriority AS g,
         CASE o_orderpriority
           WHEN '1-URGENT' THEN 1000000 WHEN '2-HIGH' THEN 2000000
           WHEN '3-MEDIUM' THEN 3000000 WHEN '4-NOT SPECIFIED' THEN 4000000
           WHEN '5-LOW' THEN 5000000 END::HUGEINT AS w,
         CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END AS s
  FROM orders WHERE o_totalprice IS NOT NULL
),
agg AS (
  SELECT count(*)::HUGEINT AS n, sum(s)::HUGEINT AS k,
         sum(w) AS nw, sum(w * s) AS kw, sum(w * w) AS nww,
         count(DISTINCT g)::BIGINT AS kg
  FROM base WHERE w IS NOT NULL
)
SELECT kg AS k_groups, n::BIGINT AS n, k::BIGINT AS k_total,
       CASE WHEN (n*nww - nw*nw) > 0 AND k > 0 AND k < n THEN
         round(((n*kw - k*nw)::DOUBLE / n::DOUBLE)
               / sqrt((k*(n-k))::DOUBLE * (n*nww - nw*nw)::DOUBLE
                      / (n::DOUBLE * n::DOUBLE * n::DOUBLE)), 6)
       END AS z
FROM agg
"""


@register("orders_cochran_armitage", _CA_ORACLE)
def orders_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage linear-trend test of the big-order rate across
    the five priority tiers scored 1..5
    (operators/abtest.cochran_armitage_trend) — the proportions sibling
    of the Jonckheere ordered-trend test; exact cross-multiplied T and
    variance moments."""
    from olake_spark.operators.abtest import cochran_armitage_trend

    o = table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    ).select(
        "o_orderpriority",
        (F.col("o_totalprice") > 150000.0).alias("s"),
    )
    scores = {"1-URGENT": 1.0, "2-HIGH": 2.0, "3-MEDIUM": 3.0,
              "4-NOT SPECIFIED": 4.0, "5-LOW": 5.0}
    return cochran_armitage_trend(o, "o_orderpriority", "s", scores)


# ---------------------------------------------------------------------------
# independent-oracle proof #7: exact ANN with triangle-inequality pruning
# ---------------------------------------------------------------------------

# deterministic CLUSTERED 8-dim vectors derived from orders: cluster
# center from o_orderkey % 32 (integers, exact), jitter from a Knuth
# multiplicative hash (exact integer math then one divide) — identical
# doubles in both engines, and genuinely clustered so the triangle
# pruning is non-vacuous (random high-dim vectors concentrate distances
# and prune nothing; the embeddings table proved that empirically).
_CLUSTER_DIM = 8


def _clustered_vec_exprs(key: str) -> list[str]:
    exprs = []
    for j in range(_CLUSTER_DIM):
        center = f"(CAST(({key} % 32) * 7 + {13 * j} AS BIGINT) % 11) - 5"
        jitter = f"((({key} + {j}) * 2654435761) % 997) / 2000.0 - 0.25"
        exprs.append(f"(({center}) + ({jitter}))")
    return exprs


def _clustered_vec_sql(key: str) -> str:
    return "[" + ", ".join(_clustered_vec_exprs(key)) + "]"


def _cos8(a: str, b: str) -> str:
    dot = " + ".join(f"{a}[{i + 1}] * {b}[{i + 1}]" for i in range(_CLUSTER_DIM))
    na = " + ".join(f"{a}[{i + 1}] * {a}[{i + 1}]" for i in range(_CLUSTER_DIM))
    nb = " + ".join(f"{b}[{i + 1}] * {b}[{i + 1}]" for i in range(_CLUSTER_DIM))
    return f"(0.0 + {dot}) / (sqrt(0.0 + {na}) * sqrt(0.0 + {nb}))"


_EXACT_PRUNED_ORACLE = f"""
WITH vecs AS (
  SELECT o_orderkey AS vec_id, {_clustered_vec_sql('o_orderkey')}::DOUBLE[] AS v
  FROM orders
),
q AS (SELECT vec_id AS query_id, v AS qv FROM vecs WHERE vec_id < 16),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({_cos8('q.qv', 'c.v')}, 9) AS s9
  FROM q JOIN vecs c ON c.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, neighbor_id) AS "rank"
  FROM scored
)
SELECT query_id, neighbor_id, "rank", round(s9, 6) AS cosine_sim
FROM ranked WHERE "rank" <= 5
"""


def _clustered_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    dims = [F.expr(e).cast("double") for e in _clustered_vec_exprs("o_orderkey")]
    return o.select(
        F.col("o_orderkey").alias("vec_id"), F.array(*dims).alias("embedding")
    )


@register("similarity_topk_exact_pruned", _EXACT_PRUNED_ORACLE)
def similarity_topk_exact_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Independent-oracle proof #7: `ivf_exact_topk` — exact top-k that
    PRUNES cells by the triangle inequality (d(q,cent) − radius > d_k ⇒
    skip the cell) — against a plain brute-force cross-join oracle that
    knows nothing about cells, bounds, or the two-phase plan. The
    operator's losslessness is mathematical (every true neighbor's cell
    must survive the bound), so exact hash equality is the expected
    outcome and any divergence is a real bug in the pruning algebra.
    tests/test_similarity_fast_paths.py asserts the pruning is also
    non-vacuous on this fixture (measured: 1.6% of (query, cell) pairs
    survive at sf0.01). The centroid stride scales with the corpus so
    the CELL COUNT stays ~fixed (~160): with a constant stride the
    centroid set grows ∝N and index assignment degenerates to
    O(N²/stride) — the r11 SF sweep caught exactly that (exponent 1.5
    at stride 97) — while a bounded cell count keeps assignment linear,
    the way production IVF holds n_cells at a trained constant. The
    one-row count() is index-BUILD sizing, not per-query work."""
    from olake_spark.operators.similarity import ivf_exact_topk

    vecs = _clustered_vectors(spark, sf_dir)
    stride = max(97, vecs.count() // 160)
    return ivf_exact_topk(
        vecs.filter(F.col("vec_id") < 16),
        vecs,
        k=5,
        centroid_stride=stride,
        p_init=2,
        dim=_CLUSTER_DIM,
    )


# ---------------------------------------------------------------------------
# r11 post-close wave: richness/smoothing + paired/stratified tests +
# distribution distance + autocorrelation diagnostic
# ---------------------------------------------------------------------------

_CHAO1_ORACLE = """
WITH counts AS (
  SELECT user_id, date_trunc('day', ts) AS day, count(*)::BIGINT AS c
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
),
m AS (
  SELECT count(*)::BIGINT AS vocab, sum(c)::BIGINT AS n_tokens,
         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS f1,
         sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS f2
  FROM counts
)
SELECT vocab, n_tokens, f1, f2,
       round(vocab::DOUBLE + (f1::DOUBLE * (f1::DOUBLE - 1.0))
             / (2.0 * (f2::DOUBLE + 1.0)), 6) AS chao1
FROM m
"""


@register("events_chao1_user_days", _CHAO1_ORACLE)
def events_chao1_user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 capture-recapture estimate of the TRUE number of active
    user-days from sighting counts (operators/text.
    chao1_from_occurrences — the estimator is unit-agnostic): f1=1109 /
    f2=1158 singleton/doubleton user-days at sf0.01, so the estimate is
    a real extrapolation, not the degenerate vocab echo the templated
    `documents` corpus produces (31 token types, min count 26 — zero
    singletons; that near-vacuous fixture is exactly what the r11
    mod-sweep lesson says to avoid)."""
    from olake_spark.operators.text import chao1_from_occurrences

    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    occ = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    return chao1_from_occurrences(occ, ["user_id", "day"])


_GT_ORACLE = """
WITH counts AS (
  SELECT user_id, date_trunc('day', ts) AS day, count(*)::BIGINT AS c
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
),
fof AS (
  SELECT c AS r, count(*)::BIGINT AS n_r FROM counts GROUP BY 1
)
SELECT a.r::BIGINT AS r, a.n_r,
       round((a.r + 1)::DOUBLE * b.n_r::DOUBLE / a.n_r::DOUBLE, 6) AS r_star
FROM fof a LEFT JOIN fof b ON b.r = a.r + 1
WHERE a.r <= 10
"""


@register("events_good_turing_user_days", _GT_ORACLE)
def events_good_turing_user_days(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Good–Turing adjusted sighting counts r* over the user-day
    frequency-of-frequencies (operators/text.
    good_turing_from_occurrences), r ≤ 10 — all ten rows populated at
    sf0.01 (the documents corpus's count floor of 26 made the text
    version an empty relation: a vacuous green)."""
    from olake_spark.operators.text import good_turing_from_occurrences

    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    occ = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    return good_turing_from_occurrences(occ, ["user_id", "day"], max_r=10)


_MH_ORACLE = """
WITH cells AS (
  SELECT o_orderpriority,
         sum(CASE WHEN e AND o THEN 1 ELSE 0 END)::BIGINT AS a,
         sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS b,
         sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)::BIGINT AS c,
         sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS d
  FROM (
    SELECT o_orderpriority, o_custkey % 2 = 0 AS e,
           o_totalprice > 150000.0 AS o
    FROM orders WHERE o_totalprice IS NOT NULL
  ) GROUP BY 1
),
terms AS (
  SELECT a + b + c + d AS cn,
         a::DOUBLE * d::DOUBLE / (a+b+c+d)::DOUBLE AS r,
         b::DOUBLE * c::DOUBLE / (a+b+c+d)::DOUBLE AS s,
         (a+d)::DOUBLE / (a+b+c+d)::DOUBLE AS p,
         (b+c)::DOUBLE / (a+b+c+d)::DOUBLE AS q
  FROM cells
),
m AS (
  SELECT count(*)::BIGINT AS k_strata, sum(cn)::BIGINT AS n,
         sum(floor(r * 1000000000)::BIGINT)::HUGEINT AS sr,
         sum(floor(s * 1000000000)::BIGINT)::HUGEINT AS ss,
         sum(floor(p * r * 1000000000)::BIGINT)::HUGEINT AS spr,
         sum(floor((p * s + q * r) * 1000000000)::BIGINT)::HUGEINT AS spsqr,
         sum(floor(q * s * 1000000000)::BIGINT)::HUGEINT AS sqs
  FROM terms
),
f AS (
  SELECT k_strata, n,
         CASE WHEN sr > 0 AND ss > 0
              THEN (sr::DOUBLE / 1000000000) / (ss::DOUBLE / 1000000000) END AS orm,
         CASE WHEN sr > 0 AND ss > 0 THEN sqrt(
           (spr::DOUBLE / 1000000000)
             / (2.0 * (sr::DOUBLE / 1000000000) * (sr::DOUBLE / 1000000000))
           + (spsqr::DOUBLE / 1000000000)
             / (2.0 * (sr::DOUBLE / 1000000000) * (ss::DOUBLE / 1000000000))
           + (sqs::DOUBLE / 1000000000)
             / (2.0 * (ss::DOUBLE / 1000000000) * (ss::DOUBLE / 1000000000))
         ) END AS se
  FROM m
)
SELECT k_strata, n, round(orm, 6) AS or_mh, round(ln(orm), 6) AS log_or_mh,
       round(se, 6) AS se_log_or,
       round(exp(ln(orm) - 1.96 * se), 6) AS ci_lo,
       round(exp(ln(orm) + 1.96 * se), 6) AS ci_hi
FROM f
"""


@register("orders_mantel_haenszel", _MH_ORACLE)
def orders_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel–Haenszel pooled odds ratio of big orders vs the even-
    custkey cohort, stratified by order priority
    (operators/abtest.mantel_haenszel_or) with the RBG interval —
    the Simpson's-paradox-proof sibling of events_odds_ratio."""
    from olake_spark.operators.abtest import mantel_haenszel_or

    o = table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    ).select(
        "o_orderpriority",
        (F.col("o_custkey") % 2 == 0).alias("e"),
        (F.col("o_totalprice") > 150000.0).alias("o"),
    )
    return mantel_haenszel_or(o, ["o_orderpriority"], "e", "o")


_MCNEMAR_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) = 1 AS x,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1 AS y
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
),
m AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN x = y THEN 1 ELSE 0 END)::BIGINT AS n_concordant,
         sum(CASE WHEN x AND NOT y THEN 1 ELSE 0 END)::BIGINT AS b,
         sum(CASE WHEN NOT x AND y THEN 1 ELSE 0 END)::BIGINT AS c
  FROM per_user
)
SELECT n, n_concordant, b, c,
       CASE WHEN b + c > 0 THEN round(
         (b::DOUBLE - c::DOUBLE) * (b::DOUBLE - c::DOUBLE)
         / (b::DOUBLE + c::DOUBLE), 6) END AS chi2,
       CASE WHEN b + c > 0 THEN round(
         (abs(b::DOUBLE - c::DOUBLE) - 1.0) * (abs(b::DOUBLE - c::DOUBLE) - 1.0)
         / (b::DOUBLE + c::DOUBLE), 6) END AS chi2_cc,
       CASE WHEN b + c > 0 THEN round(
         (b::DOUBLE - c::DOUBLE) / sqrt(b::DOUBLE + c::DOUBLE), 6) + 0.0
       END AS z
FROM m
"""


@register("events_mcnemar_clicks_purchases", _MCNEMAR_ORACLE)
def events_mcnemar_clicks_purchases(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """McNemar's paired test of per-user click-reach vs purchase-reach
    (operators/abtest.mcnemar_paired) — only the discordant users
    carry information; the within-subject sibling of the two-prop z."""
    from olake_spark.operators.abtest import mcnemar_paired

    per_user = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            (F.max((F.col("event_type") == "click").cast("int")) == 1).alias(
                "x"
            ),
            (
                F.max((F.col("event_type") == "purchase").cast("int")) == 1
            ).alias("y"),
        )
    )
    return mcnemar_paired(per_user, "x", "y")


_W1_ORACLE = """
WITH per AS (
  SELECT round(l_extendedprice * 1000000)::BIGINT AS v,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::HUGEINT AS ca,
         sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)::HUGEINT AS cb
  FROM lineitem WHERE l_returnflag IN ('R', 'A')
    AND l_extendedprice IS NOT NULL
  GROUP BY 1
),
cum AS (
  SELECT v,
         sum(ca) OVER (ORDER BY v) AS cuma,
         sum(cb) OVER (ORDER BY v) AS cumb,
         (lead(v) OVER (ORDER BY v) - v)::HUGEINT AS dx,
         sum(ca) OVER () AS na, sum(cb) OVER () AS nb
  FROM per
),
m AS (
  SELECT max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b,
         count(*)::BIGINT AS n_values,
         coalesce(sum(CASE WHEN dx IS NOT NULL
             THEN abs(cuma * nb - cumb * na) * dx END), 0) AS num,
         max(na) AS tna, max(nb) AS tnb
  FROM cum
)
SELECT n_a, n_b, n_values,
       round(num::DOUBLE / (tna * tnb)::DOUBLE / 1e6, 6) AS w1
FROM m
"""


@register("lineitem_wasserstein_price", _W1_ORACLE)
def lineitem_wasserstein_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein distance between the R and A return
    flags' extended-price distributions
    (operators/abtest.wasserstein_1d) — every segment term an exact
    DECIMAL product, one final divide."""
    from olake_spark.operators.abtest import wasserstein_1d

    return wasserstein_1d(
        table(spark, sf_dir, "lineitem"), "l_returnflag", "l_extendedprice",
        "R", "A",
    )


_DW_ORACLE = """
WITH daily AS (
  -- per-day revenue in exact CENTS (per-event round, integer sum) so
  -- the series fed to the DW quantizer carries no order-dependent
  -- float sum on either engine
  SELECT event_type,
         date_trunc('day', ts) AS day,
         sum(round(value * 100)::BIGINT)::BIGINT AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, v::HUGEINT AS v,
         (v - lag(v) OVER (PARTITION BY event_type ORDER BY day))::HUGEINT AS d
  FROM daily
),
m AS (
  SELECT event_type, count(*)::HUGEINT AS n, sum(v) AS s,
         sum(v * v) AS q, sum(d * d) AS sd2
  FROM lagged GROUP BY 1
)
SELECT event_type, n::BIGINT AS n,
       CASE WHEN n > 1 AND n * q - s * s > 0
            THEN round((n * sd2)::DOUBLE / (n * q - s * s)::DOUBLE, 6)
       END AS dw
FROM m
"""


@register("events_durbin_watson", _DW_ORACLE)
def events_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson lag-1 autocorrelation diagnostic of each event
    type's daily-revenue series (operators/timeseries.durbin_watson) —
    the mean cancels in the differences, so both moments are exact
    micro integers."""
    from olake_spark.operators.timeseries import durbin_watson

    daily = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            # exact cents (per-event round, integer sum) — a float daily
            # sum would be partition-order-dependent right at the
            # operator's micro-round boundary
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev")
        )
    )
    return durbin_watson(daily, ["event_type"], "day", "rev")


# ---------------------------------------------------------------------------
# r11 post-close wave 2: repeated-measures/reliability + dependence
# diagnostics + cumulative hazard
# ---------------------------------------------------------------------------

_LB_ORACLE = """
WITH daily AS (
  SELECT event_type, floor(epoch_us(ts) / 86400000000)::BIGINT AS t,
         sum(round(value * 1000000)::BIGINT)::HUGEINT AS x
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, count(*)::HUGEINT AS n, sum(x) AS s
  FROM daily GROUP BY 1
),
c AS (
  SELECT d.event_type, d.t, st.n AS n, st.n * d.x - st.s AS dev
  FROM daily d JOIN stats st USING (event_type)
),
den AS (SELECT event_type, sum(dev*dev) AS den FROM c GROUP BY 1),
per_lag AS (
  SELECT a.event_type, l.lag, any_value(a.n) AS n,
         CASE WHEN any_value(dn.den) > 0
              THEN sum(a.dev * b.dev)::DOUBLE / any_value(dn.den)::DOUBLE
         END AS r
  FROM (SELECT unnest([1, 2, 3]) AS lag) l
  JOIN c a ON TRUE
  JOIN c b ON b.event_type = a.event_type AND b.t = a.t + l.lag
  JOIN den dn ON dn.event_type = a.event_type
  GROUP BY 1, 2
),
m AS (
  SELECT event_type, any_value(n)::BIGINT AS n,
         count(*)::BIGINT AS m_used,
         sum(floor(r * r / (n::DOUBLE - lag) * 1000000000)::BIGINT)
           ::HUGEINT AS st
  FROM per_lag WHERE r IS NOT NULL AND n > lag
  GROUP BY 1
)
SELECT event_type, n, m_used,
       round(n::DOUBLE * (n::DOUBLE + 2.0) * (st::DOUBLE / 1000000000), 6)
         AS q_lb
FROM m
"""


@register("events_ljung_box", _LB_ORACLE)
def events_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau Q per event type over the daily micro-sum
    series, lags 1..3 (operators/forecast.ljung_box) — the any-serial-
    dependence companion to events_acf_by_type and events_durbin_watson,
    from the same bucket-relation plan."""
    from olake_spark.operators.forecast import ljung_box

    return ljung_box(
        table(spark, sf_dir, "events"), "ts", "value",
        step="1 day", max_lag=3, by=["event_type"],
    )


_FRIEDMAN_ORACLE = """
WITH cells AS (
  SELECT date_trunc('day', ts) AS b, event_type AS tr,
         sum(round(value * 100)::BIGINT)::BIGINT AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
k AS (SELECT count(DISTINCT tr)::BIGINT AS k FROM cells),
complete AS (
  SELECT b FROM cells GROUP BY b
  HAVING count(*) = (SELECT k FROM k)
),
ranked AS (
  SELECT c.b, c.tr,
         (2 * rank() OVER (PARTITION BY c.b ORDER BY c.v)
          + count(*) OVER (PARTITION BY c.b, c.v) - 1)::HUGEINT AS r2
  FROM cells c JOIN complete USING (b)
),
per_treat AS (
  SELECT tr, count(*)::HUGEINT AS n, sum(r2) AS R2, sum(r2 * r2) AS A4
  FROM ranked GROUP BY 1
),
m AS (
  SELECT any_value((SELECT k FROM k)) AS kt, any_value(n) AS n,
         sum((R2 - n * (kt_inner + 1)) * (R2 - n * (kt_inner + 1))) AS num4,
         sum(A4) AS sa4
  FROM (SELECT tr, n, R2, A4, (SELECT k FROM k)::HUGEINT AS kt_inner
        FROM per_treat)
)
SELECT kt::BIGINT AS k_treatments, n::BIGINT AS n_blocks,
       CASE WHEN sa4 - n * kt * (kt + 1) * (kt + 1) > 0
            THEN round((kt - 1)::DOUBLE * num4::DOUBLE
                 / (sa4 - n * kt * (kt + 1) * (kt + 1))::DOUBLE, 6)
       END AS t_stat
FROM m
"""


@register("events_friedman_daily_revenue", _FRIEDMAN_ORACLE)
def events_friedman_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Friedman tie-corrected rank test of the five event types'
    daily-revenue cells, blocked by day
    (operators/abtest.friedman_test) — each day ranks its own five
    cells, so day-level traffic shifts can't masquerade as a
    type effect. Cells are exact cents."""
    from olake_spark.operators.abtest import friedman_test

    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return friedman_test(ev, "day", "event_type", "cents")


_COCHRANQ_ORACLE = """
WITH users AS (
  SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
),
reach AS (
  SELECT DISTINCT user_id, event_type FROM events
  WHERE user_id IS NOT NULL
),
cells AS (
  SELECT u.user_id, t.tr,
         (r.user_id IS NOT NULL) AS s
  FROM users u
  CROSS JOIN (SELECT unnest(['click', 'purchase', 'error']) AS tr) t
  LEFT JOIN reach r ON r.user_id = u.user_id AND r.event_type = t.tr
),
per_unit AS (
  SELECT user_id, sum(CASE WHEN s THEN 1 ELSE 0 END)::HUGEINT AS ri
  FROM cells GROUP BY 1
),
per_treat AS (
  SELECT tr, sum(CASE WHEN s THEN 1 ELSE 0 END)::HUGEINT AS cj
  FROM cells GROUP BY 1
),
m AS (
  SELECT (SELECT count(*)::HUGEINT FROM per_treat) AS k,
         (SELECT count(*)::BIGINT FROM per_unit) AS n_units,
         (SELECT sum(cj) FROM per_treat) AS N,
         (SELECT sum(cj * cj) FROM per_treat) AS sc2,
         (SELECT sum(ri * ri) FROM per_unit) AS sr2
)
SELECT k::BIGINT AS k_treatments, n_units,
       N::BIGINT AS n_success,
       CASE WHEN k * N - sr2 > 0
            THEN round(((k - 1) * (k * sc2 - N * N))::DOUBLE
                       / (k * N - sr2)::DOUBLE, 6)
       END AS q_stat
FROM m
"""


@register("events_cochran_q_reach", _COCHRANQ_ORACLE)
def events_cochran_q_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across three matched binary reach treatments per
    user — did the user ever click / purchase / hit an error
    (operators/abtest.cochran_q) — the k-treatment McNemar. The
    complete design is BUILT (user universe × treatment list,
    left-join reach), which is also what arms the operator's
    incomplete-design raise_error guard."""
    from olake_spark.operators.abtest import cochran_q

    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    users = ev.select("user_id").distinct()
    treats = users.crossJoin(
        F.broadcast(
            spark.createDataFrame(
                [("click",), ("purchase",), ("error",)], "tr string"
            )
        )
    )
    reach = ev.select("user_id", F.col("event_type").alias("tr")).distinct()
    cells = treats.join(
        reach.withColumn("_hit", F.lit(1)), ["user_id", "tr"], "left"
    ).select(
        "user_id", "tr", F.col("_hit").isNotNull().alias("s")
    )
    return cochran_q(cells, "user_id", "tr", "s")


_CLIFFS_ORACLE = """
WITH per AS (
  SELECT round(l_quantity * 1000000)::BIGINT AS v,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::HUGEINT AS ca,
         sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)::HUGEINT AS cb
  FROM lineitem WHERE l_returnflag IN ('R', 'A')
    AND l_quantity IS NOT NULL
  GROUP BY 1
),
-- DELIBERATELY a different formulation than the operator's cumulative
-- windows: the domain² theta-join over distinct-value pairs
pairs AS (
  SELECT sum(a.ca * b.cb) FILTER (WHERE a.v > b.v) AS gt,
         sum(a.ca * b.cb) FILTER (WHERE a.v < b.v) AS lt
  FROM per a CROSS JOIN per b
),
m AS (
  SELECT (SELECT sum(ca) FROM per) AS na, (SELECT sum(cb) FROM per) AS nb,
         coalesce(gt, 0) AS gt, coalesce(lt, 0) AS lt
  FROM pairs
)
SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, gt::BIGINT AS n_gt,
       lt::BIGINT AS n_lt,
       round((gt - lt)::DOUBLE / (na * nb)::DOUBLE, 6) + 0.0 AS delta
FROM m
"""


@register("lineitem_cliffs_delta_qty", _CLIFFS_ORACLE)
def lineitem_cliffs_delta_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta ordinal effect size of quantity between the R and
    A return flags (operators/abtest.cliffs_delta). The Spark side is
    the cumulative-window grid fold; the oracle DELIBERATELY recomputes
    the win counts as the domain² theta-join over distinct-value pairs
    — a structurally different formulation of the same counts (the
    50-value quantity domain keeps it trivially cheap), so agreement
    checks the cumulative algebra, not a mirrored expression."""
    from olake_spark.operators.abtest import cliffs_delta

    return cliffs_delta(
        table(spark, sf_dir, "lineitem"), "l_returnflag", "l_quantity",
        "R", "A",
    )


_NA_ORACLE = """
WITH subj AS (
  SELECT user_id,
         (epoch_us(max(ts)) // 3600000000)
           - (epoch_us(min(ts)) // 3600000000) AS dur,
         epoch_us(max(ts)) AS last_us
  FROM events GROUP BY 1
),
cut AS (SELECT max(epoch_us(ts)) - 86400000000 AS cut_us FROM events),
per AS (
  SELECT dur,
         sum(CASE WHEN last_us < (SELECT cut_us FROM cut)
                  THEN 1 ELSE 0 END)::BIGINT AS d,
         count(*)::BIGINT AS c
  FROM subj GROUP BY 1
),
w1 AS (
  SELECT dur, d,
         (sum(c) OVER ()
          - coalesce(sum(c) OVER (ORDER BY dur
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         )::BIGINT AS n_at_risk
  FROM per
),
w2 AS (
  SELECT dur, n_at_risk, d,
         d * 1000000 // n_at_risk AS h_micro,
         d * 1000000000000 // (n_at_risk * n_at_risk) AS v1
  FROM w1
)
SELECT dur AS duration, n_at_risk, d, h_micro,
       (sum(h_micro) OVER (ORDER BY duration ROWS UNBOUNDED PRECEDING))
         ::BIGINT AS cum_hazard_micro,
       (sum(v1) OVER (ORDER BY duration ROWS UNBOUNDED PRECEDING))
         ::BIGINT AS var_micro2
FROM w2
"""


@register("events_nelson_aalen", _NA_ORACLE)
def events_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative churn hazard over the same user-lifetime
    subjects as events_survival_km (operators/survival.nelson_aalen) —
    exact integer micro-floor hazards, prefix-summed over the tiny
    period relation."""
    from olake_spark.operators.survival import nelson_aalen

    HOUR = 3_600_000_000
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("_us")
    )
    subj = ev.groupBy("user_id").agg(
        F.min("_us").alias("_first_us"), F.max("_us").alias("_last_us")
    )
    cut = ev.groupBy().agg(
        (F.max("_us") - F.lit(24 * HOUR)).alias("_cut_us")
    )
    subjects = subj.crossJoin(F.broadcast(cut)).select(
        (
            F.expr(f"_last_us div {HOUR}") - F.expr(f"_first_us div {HOUR}")
        ).alias("dur"),
        (F.col("_last_us") < F.col("_cut_us")).alias("observed"),
    )
    return nelson_aalen(subjects, "dur", "observed")


_CRONBACH_ORACLE = """
WITH base AS (
  SELECT user_id AS u, event_type AS it,
         (sum(round(value * 100)::BIGINT) * 1000000)::BIGINT AS v
  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
uu AS (SELECT count(DISTINCT u)::HUGEINT AS U FROM base),
per_item AS (
  SELECT it, sum(v::HUGEINT) AS s, sum(v::HUGEINT * v) AS q
  FROM base GROUP BY 1
),
mi AS (
  SELECT count(*)::BIGINT AS k_items,
         sum((SELECT U FROM uu) * q - s * s) AS iv
  FROM per_item
),
per_unit AS (SELECT u, sum(v::HUGEINT) AS t FROM base GROUP BY 1),
mu AS (
  SELECT (SELECT U FROM uu)::BIGINT AS n_units,
         (SELECT U FROM uu) * sum(t * t) - sum(t) * sum(t) AS tv
  FROM per_unit
)
SELECT k_items, n_units,
       CASE WHEN tv > 0 AND k_items > 1
            THEN round(k_items::DOUBLE / (k_items - 1)::DOUBLE
                 * (1.0 - iv::DOUBLE / tv::DOUBLE), 6)
       END AS alpha
FROM mi, mu
"""


@register("events_cronbach_alpha", _CRONBACH_ORACLE)
def events_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha of the five event types' per-user value totals
    (operators/abtest.cronbach_alpha) — do the per-type engagement
    signals cohere into one scale? Implicit zeros: a user who never
    hit a type measures 0 on that item; the totals feed exact cents."""
    from olake_spark.operators.abtest import cronbach_alpha

    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    per = ev.groupBy("user_id", "event_type").agg(
        # exact cents, then /100 at the operator's micro scale: feed
        # cents as the value so the operator's x1e6 quantization is an
        # exact integer scale-up of an already-exact integer
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    return cronbach_alpha(per, "user_id", "event_type", "cents")


_ISO_ORACLE = """
WITH per AS (
  SELECT least(greatest(floor((l_quantity / 50.0) * 20)::INT, 0), 19)
           AS bucket,
         count(*)::BIGINT AS n,
         sum(CASE WHEN l_extendedprice > 30000.0 THEN 1 ELSE 0 END)::BIGINT
           AS k
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
  GROUP BY 1
),
pre AS (
  SELECT bucket, n, k,
         sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)::HUGEINT
           AS cn,
         sum(k) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)::HUGEINT
           AS ck
  FROM per
),
lo AS (
  SELECT bucket AS jb, cn AS cnj, ck AS ckj FROM pre
  UNION ALL SELECT -1, 0::HUGEINT, 0::HUGEINT
),
seg AS (
  SELECT lo.jb, hi.bucket AS kb,
         (hi.ck - lo.ckj)::DOUBLE / (hi.cn - lo.cnj)::DOUBLE AS m
  FROM lo JOIN pre hi ON hi.bucket > lo.jb
),
sufmin AS (
  SELECT jb, kb,
         min(m) OVER (PARTITION BY jb ORDER BY kb DESC
                      ROWS UNBOUNDED PRECEDING) AS minmean
  FROM seg
),
iso AS (
  SELECT kb AS bucket, max(minmean) AS isov FROM sufmin GROUP BY 1
)
SELECT p.bucket::BIGINT AS bucket, p.n,
       round(p.k::DOUBLE / p.n::DOUBLE, 6) AS rate_raw,
       round(i.isov, 6) AS rate_iso
FROM per p JOIN iso i USING (bucket)
ORDER BY bucket
"""


@register("lineitem_isotonic_price_by_qty", _ISO_ORACLE)
def lineitem_isotonic_price_by_qty(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Isotonic calibration of P(extendedprice > 30k) against the
    quantity score (operators/abtest.isotonic_calibration, 20 buckets)
    — the minimax-identity PAVA fit, monotone by construction, pooling
    the noisy mid-range buckets; pinned against a hand-pooled PAVA
    fixture."""
    from olake_spark.operators.abtest import isotonic_calibration

    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    ).select(
        (F.col("l_quantity") / 50.0).alias("score"),
        (F.col("l_extendedprice") > 30000.0).alias("big"),
    )
    return isotonic_calibration(li, "score", "big", n_buckets=20)


_ENERGY_ORACLE = """
WITH per AS (
  SELECT round(l_extendedprice * 1000000)::BIGINT AS v,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::HUGEINT AS ca,
         sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)::HUGEINT AS cb
  FROM lineitem WHERE l_returnflag IN ('R', 'A')
    AND l_extendedprice IS NOT NULL
  GROUP BY 1
),
cum AS (
  SELECT v,
         sum(ca) OVER (ORDER BY v) AS cuma,
         sum(cb) OVER (ORDER BY v) AS cumb,
         (lead(v) OVER (ORDER BY v) - v)::HUGEINT AS dx,
         sum(ca) OVER () AS na, sum(cb) OVER () AS nb
  FROM per
),
m AS (
  SELECT max(na) AS na, max(nb) AS nb,
         coalesce(sum(CASE WHEN dx IS NOT NULL
             THEN (cuma * (nb - cumb) + cumb * (na - cuma)) * dx END), 0)
           AS sxy,
         coalesce(sum(CASE WHEN dx IS NOT NULL
             THEN cuma * (na - cuma) * 2 * dx END), 0) AS sxx,
         coalesce(sum(CASE WHEN dx IS NOT NULL
             THEN cumb * (nb - cumb) * 2 * dx END), 0) AS syy
  FROM cum
)
SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
       round(sxy::DOUBLE / (na * nb)::DOUBLE / 1e6, 6) AS e_xy,
       round(sxx::DOUBLE / (na * na)::DOUBLE / 1e6, 6) AS e_xx,
       round(syy::DOUBLE / (nb * nb)::DOUBLE / 1e6, 6) AS e_yy,
       round(2.0 * (sxy::DOUBLE / (na * nb)::DOUBLE / 1e6)
             - (sxx::DOUBLE / (na * na)::DOUBLE / 1e6)
             - (syy::DOUBLE / (nb * nb)::DOUBLE / 1e6), 6) AS energy_d2
FROM m
"""


@register("lineitem_energy_distance_price", _ENERGY_ORACLE)
def lineitem_energy_distance_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact 1-D energy distance between the R and A extended-price
    distributions (operators/abtest.energy_distance_1d) — the
    characteristic-function metric next to lineitem_wasserstein_price,
    from the same exact-integer value grid."""
    from olake_spark.operators.abtest import energy_distance_1d

    return energy_distance_1d(
        table(spark, sf_dir, "lineitem"), "l_returnflag", "l_extendedprice",
        "R", "A",
    )


_KW_ORACLE = """
WITH cells AS (
  SELECT date_trunc('day', ts) AS b, event_type AS tr,
         sum(round(value * 100)::BIGINT)::BIGINT AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
k AS (SELECT count(DISTINCT tr)::BIGINT AS k FROM cells),
complete AS (
  SELECT b FROM cells GROUP BY b
  HAVING count(*) = (SELECT k FROM k)
),
ranked AS (
  SELECT c.b, c.tr,
         (2 * rank() OVER (PARTITION BY c.b ORDER BY c.v)
          + count(*) OVER (PARTITION BY c.b, c.v) - 1)::HUGEINT AS r2
  FROM cells c JOIN complete USING (b)
),
per_treat AS (
  SELECT tr, count(*)::HUGEINT AS n, sum(r2) AS R2, sum(r2 * r2) AS A4
  FROM ranked GROUP BY 1
),
m AS (
  SELECT any_value((SELECT k FROM k)) AS kt, any_value(n) AS n,
         sum((R2 - n * (kt_inner + 1)) * (R2 - n * (kt_inner + 1))) AS num4,
         sum(A4) AS sa4
  FROM (SELECT tr, n, R2, A4, (SELECT k FROM k)::HUGEINT AS kt_inner
        FROM per_treat)
)
SELECT kt::BIGINT AS k_treatments, n::BIGINT AS n_blocks,
       CASE WHEN sa4 - n * kt * (kt + 1) * (kt + 1) > 0
            THEN round(((kt - 1)::DOUBLE * num4::DOUBLE
                 / (sa4 - n * kt * (kt + 1) * (kt + 1))::DOUBLE)
                 / (n::DOUBLE * (kt - 1)::DOUBLE), 6)
       END AS w
FROM m
"""


@register("events_kendalls_w", _KW_ORACLE)
def events_kendalls_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W across days on the
    ranking of the five event types' daily revenue
    (operators/abtest.kendalls_w = T/(n(k−1)), tie-corrected, same
    exact doubled-rank moments as the Friedman query)."""
    from olake_spark.operators.abtest import kendalls_w

    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return kendalls_w(ev, "day", "event_type", "cents")


_CVM_ORACLE = """
WITH per AS (
  SELECT round(l_extendedprice * 1000000)::BIGINT AS v,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::HUGEINT AS ca,
         sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)::HUGEINT AS cb
  FROM lineitem WHERE l_returnflag IN ('R', 'A')
    AND l_extendedprice IS NOT NULL
  GROUP BY 1
),
cum AS (
  SELECT v,
         sum(ca) OVER (ORDER BY v) AS cuma,
         sum(cb) OVER (ORDER BY v) AS cumb,
         (ca + cb) AS w,
         sum(ca) OVER () AS na, sum(cb) OVER () AS nb
  FROM per
),
m AS (
  SELECT max(na) AS na, max(nb) AS nb,
         coalesce(sum(w * (cuma * nb - cumb * na) * (cuma * nb - cumb * na)),
                  0) AS s
  FROM cum
)
SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
       round((na::DOUBLE * nb::DOUBLE) / ((na + nb)::DOUBLE * (na + nb)::DOUBLE)
             * (s::DOUBLE / ((na::DOUBLE * nb::DOUBLE)
                             * (na::DOUBLE * nb::DOUBLE))), 6) AS t_cvm
FROM m
"""


@register("lineitem_cvm_price", _CVM_ORACLE)
def lineitem_cvm_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises statistic between the R and A
    extended-price distributions
    (operators/abtest.cramer_von_mises_2samp) — the integrated-gap
    member of the distance family next to KS/W1/energy, every summand
    an exact DECIMAL over the shared value grid."""
    from olake_spark.operators.abtest import cramer_von_mises_2samp

    return cramer_von_mises_2samp(
        table(spark, sf_dir, "lineitem"), "l_returnflag", "l_extendedprice",
        "R", "A",
    )


_KUIPER_ORACLE = """
WITH per AS (
  SELECT round(o_totalprice * 1000000)::BIGINT AS v,
         sum(CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END)::HUGEINT AS ca,
         sum(CASE WHEN o_custkey % 2 = 1 THEN 1 ELSE 0 END)::HUGEINT AS cb
  FROM orders WHERE o_totalprice IS NOT NULL
  GROUP BY 1
),
cum AS (
  SELECT sum(ca) OVER (ORDER BY v) AS cuma,
         sum(cb) OVER (ORDER BY v) AS cumb,
         sum(ca) OVER () AS na, sum(cb) OVER () AS nb
  FROM per
),
m AS (
  SELECT max(na) AS na, max(nb) AS nb,
         coalesce(greatest(max(cuma * nb - cumb * na), 0), 0) AS dp,
         coalesce(greatest(max(cumb * na - cuma * nb), 0), 0) AS dm
  FROM cum
)
SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
       round(dp::DOUBLE / (na::DOUBLE * nb::DOUBLE), 6) AS d_plus,
       round(dm::DOUBLE / (na::DOUBLE * nb::DOUBLE), 6) AS d_minus,
       round(dp::DOUBLE / (na::DOUBLE * nb::DOUBLE)
             + dm::DOUBLE / (na::DOUBLE * nb::DOUBLE), 6) AS v_kuiper
FROM m
"""


@register("orders_kuiper_totalprice", _KUIPER_ORACLE)
def orders_kuiper_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kuiper V = D⁺ + D⁻ between the even- and odd-custkey cohorts'
    order totals (operators/abtest.kuiper_two_sample) — the
    tail-equal-sensitive KS variant; both sups are maxima of exact
    signed DECIMAL gaps."""
    from olake_spark.operators.abtest import kuiper_two_sample

    o = table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    ).select(
        (F.col("o_custkey") % 2 == 0).alias("even"),
        "o_totalprice",
    )
    return kuiper_two_sample(o, "even", "o_totalprice", True, False)


_HELLINGER_ORACLE = """
WITH per AS (
  SELECT floor(value / 50.0)::BIGINT AS b,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::HUGEINT AS a,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::HUGEINT
           AS bn
  FROM events WHERE event_type IN ('click', 'purchase')
    AND value IS NOT NULL
  GROUP BY 1
),
m AS (
  SELECT sum(a) AS tna, sum(bn) AS tnb, count(*)::BIGINT AS n_bins,
         sum(floor(sqrt((a * bn)::DOUBLE) * 1000000000)::BIGINT)::HUGEINT
           AS sr
  FROM per
)
SELECT tna::BIGINT AS n_a, tnb::BIGINT AS n_b, n_bins,
       CASE WHEN tna > 0 AND tnb > 0 THEN
         round((sr::DOUBLE / 1000000000) / sqrt((tna * tnb)::DOUBLE), 6)
       END AS bc,
       CASE WHEN tna > 0 AND tnb > 0 THEN
         round(sqrt(greatest(0.0, 1.0
               - (sr::DOUBLE / 1000000000) / sqrt((tna * tnb)::DOUBLE))), 6)
       END AS hellinger
FROM m
"""


@register("events_hellinger_value", _HELLINGER_ORACLE)
def events_hellinger_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hellinger distance between the click and purchase value
    distributions over width-50 bins
    (operators/abtest.hellinger_binned) — the bounded metric member of
    the divergence family next to PSI/JSD."""
    from olake_spark.operators.abtest import hellinger_binned

    return hellinger_binned(
        table(spark, sf_dir, "events"), "event_type", "value",
        "click", "purchase", bin_width=50.0,
    )


# ---------------------------------------------------------------------------
# independent-oracle proof #8: sessionization from the quantifier
# definition, not the lag/cumsum algebra
# ---------------------------------------------------------------------------

_SESSION_PROOF_ORACLE = """
WITH ev AS (
  SELECT user_id, ts FROM events WHERE user_id IS NOT NULL
),
-- a session START is an event with NO other event of the same user in
-- the preceding 30 minutes: the definition as a quantifier, no lag()
starts AS (
  SELECT user_id, ts FROM ev e
  WHERE NOT EXISTS (
    SELECT 1 FROM ev p
    WHERE p.user_id = e.user_id
      AND p.ts < e.ts
      AND p.ts >= e.ts - INTERVAL 30 MINUTE
  )
),
-- an event belongs to the LATEST start at-or-before it (correlated max)
membered AS (
  SELECT e.user_id, e.ts,
         (SELECT max(s.ts) FROM starts s
          WHERE s.user_id = e.user_id AND s.ts <= e.ts) AS sess_start
  FROM ev e
)
SELECT user_id,
       count(*)::BIGINT AS n_events,
       epoch_ms(min(ts))::BIGINT AS start_ms,
       epoch_ms(max(ts))::BIGINT AS end_ms,
       (epoch_us(max(ts)) - epoch_us(min(ts)))::BIGINT AS duration_us
FROM membered GROUP BY user_id, sess_start
"""


@register("events_sessionize_proof", _SESSION_PROOF_ORACLE)
def events_sessionize_proof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Independent-oracle proof #8: the Spark side runs the SAME
    one-shuffle lag→flag→cumsum sessionize plan as events_sessionize
    (operators/sessions.session_stats); the oracle re-derives sessions
    from the QUANTIFIER definition — a session start is an event with
    no same-user predecessor within the gap (NOT EXISTS), membership
    is the latest start at-or-before the event (correlated max) — a
    structurally different formulation with no window functions at
    all. Ordinal session ids are dropped so only definition-derived
    columns (per-session event count, bounds, duration) are compared;
    agreement proves the cumsum algebra implements the definition."""
    from olake_spark.operators.sessions import session_stats

    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    ).select("user_id", "ts")
    return session_stats(ev, "ts", ["user_id"], gap="30 minutes").select(
        "user_id", "n_events", "start_ms", "end_ms", "duration_us"
    )
