"""Text analysis operators for large-scale training-data pipelines.

All hot-path logic is built from native ``pyspark.sql.functions`` column
expressions — JVM-side, whole-stage-codegen'd, no Python per row. Each
operator scales linearly with a narrow projection of the corpus and needs no
shuffle (per-document map work), so a 100 TB corpus is embarrassingly
parallel at ``maxPartitionBytes`` granularity.

Operators:
- ``with_token_count``     : whitespace tokenization count
- ``with_quality_features``: length / punctuation ratio / stopword ratio /
                             mean token length → a composite quality score
- ``with_lang_id``         : marker-word + CJK-codepoint heuristic language ID
- ``with_fingerprint``     : normalization-invariant document fingerprint
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "heaps_law",
    "chao1_richness",
    "chao1_from_occurrences",
    "good_turing_counts",
    "good_turing_from_occurrences",
    "STOPWORDS",
    "LANG_MARKERS",
    "tokens",
    "with_token_count",
    "with_quality_features",
    "with_lang_id",
    "with_fingerprint",
    "strip_html",
    "with_html_text",
    "SCRIPT_CLASSES",
    "with_script_stats",
    "zipf_slope",
]

# small fixed english stopword list (quality signal, not linguistics)
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# distinctive marker words per language for the n-gram/marker heuristic;
# checked in fixed order, first strictly-greater count wins (deterministic)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "is", "of"],
    "de": ["der", "die", "und", "ist"],
    "es": ["el", "la", "y", "es"],
    "fr": ["le", "la", "et", "est"],
}

_PUNCT_CLASS = r"[.,!?;:'\"()\[\]{}-]"


def tokens(col: Column) -> Column:
    """Whitespace tokens of trimmed lowered text; empty text → empty array."""
    t = F.trim(F.lower(col))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def with_token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.size(tokens(F.col(text_col))).cast("long"))


def _stopword_count(toks: Column) -> Column:
    arr = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))


def with_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features + composite score in [0, 1].

    Score = mean of three bounded signals: length saturation (chars/500
    capped), non-punctuation ratio, non-stopword ratio. Deterministic,
    engine-native, reproducible in ANSI SQL for the oracle.
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_chars = F.length(c).cast("double")
    n_tokens = F.size(toks).cast("double")
    n_punct = (n_chars - F.length(F.regexp_replace(c, _PUNCT_CLASS, ""))).cast("double")
    n_stop = _stopword_count(toks).cast("double")
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(
        F.lit(0.0)
    )
    # NULL text scores 0, not a silent perfect 1.0: least() IGNORES a NULL
    # operand (both here and in ANSI SQL), so least(NULL/500, 1.0) is 1.0
    # and the two ratio terms default to 0 — a NULL doc would top the
    # quality ranking without the explicit guard
    score = F.when(c.isNull(), F.lit(0.0)).otherwise(
        (
            F.least(n_chars / F.lit(500.0), F.lit(1.0))
            + (F.lit(1.0) - punct_ratio)
            + (F.lit(1.0) - stop_ratio)
        )
        / F.lit(3.0)
    )
    return (
        df.withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("mean_token_len", F.round(mean_tok_len, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def with_lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Marker-word heuristic language ID with a CJK-codepoint fast path.

    Any CJK character → ``zh``; otherwise the language whose marker-word
    count (``\\b``-delimited matches over the lowered text) is strictly
    greatest; ties and no-markers → ``und``. Counting uses ``regexp_count``
    — whole-stage-codegen'd, unlike higher-order array filters which are
    interpreted per element.
    """
    low = F.lower(F.col(text_col))

    def marker_count(markers: list[str]) -> Column:
        out_c = F.lit(0)
        for w in markers:
            out_c = out_c + F.regexp_count(low, F.lit(rf"\b{w}\b"))
        return out_c

    counts = {lang: marker_count(markers) for lang, markers in LANG_MARKERS.items()}
    has_cjk = F.col(text_col).rlike(r"[一-鿿]")
    langs = list(LANG_MARKERS)
    # lang wins iff its count strictly exceeds every other and is > 0
    expr = F.lit("und")
    for lang in reversed(langs):
        cond = counts[lang] > 0
        for other in langs:
            if other != lang:
                cond = cond & (counts[lang] > counts[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return df.withColumn(out, F.when(has_cjk, F.lit("zh")).otherwise(expr))


def with_fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Normalization-invariant fingerprint: md5 over lowercased text with all
    whitespace runs collapsed — catches trivially-reformatted duplicates."""
    normalized = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out, F.md5(normalized))


# entity map shared verbatim with the SQL oracle (the HTML4 core set a
# text-extraction pass actually meets; numeric references handled by regex)
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: decoding it earlier would double-decode &amp;lt;
]


def strip_html(col: Column) -> Column:
    """Visible text of an HTML fragment — the WET-extraction step of a web
    corpus pipeline, as a pure codegen regex chain (no parser, no Python):

    1. drop ``<script>``/``<style>`` elements WITH their content (their text
       is never visible),
    2. block-level closers/br become newlines (so paragraphs survive as
       line structure for the line-level dedup pass),
    3. every remaining tag is removed,
    4. the core character entities decode (``&amp;`` last — see
       ``HTML_ENTITIES``),
    5. horizontal whitespace collapses per line; blank-run trimming keeps
       at most one empty line.

    A regex stripper is the honest scalable choice here: it is what
    CCNet/C4-class pipelines run at corpus scale, and malformed markup
    degrades to extra whitespace, never to dropped visible text.
    """
    # one rule per tag (no backreference): the SQL oracle runs RE2, which
    # has no \1 — and Java/RE2 agree on everything else used here
    x = col
    for tag in ("script", "style"):
        x = F.regexp_replace(x, rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>", " ")
    x = F.regexp_replace(x, r"(?i)<br\s*/?>|</(p|div|li|h[1-6]|tr|table|ul|ol)\s*>", "\n")
    x = F.regexp_replace(x, r"(?s)<[^>]*>", " ")
    for ent, rep in HTML_ENTITIES:
        x = F.regexp_replace(x, ent, rep)
    x = F.regexp_replace(x, r"&#(\d+);", " ")  # rare numeric refs -> spacing
    x = F.regexp_replace(x, r"[ \t\r]+", " ")
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    x = F.regexp_replace(x, r"\n{2,}", "\n")
    # trim() strips only spaces in both engines — drop edge newlines too
    x = F.regexp_replace(x, r"^\n+|\n+$", "")
    return F.trim(x)


def with_html_text(df: DataFrame, html_col: str, out: str = "text") -> DataFrame:
    return df.withColumn(out, strip_html(F.col(html_col)))


# Unicode script classes for script detection — (name, java_regex,
# re2_regex): Spark's regexp_replace speaks Java character classes
# (\uXXXX), DuckDB's speaks RE2 (\x{XXXX}); the oracle generator renders
# the same ranges in RE2 so both engines count identical characters.
# Priority order = tie-break order for the dominant script.
SCRIPT_CLASSES: list[tuple[str, str, str]] = [
    ("latin", "[A-Za-z]", "[A-Za-z]"),
    ("cyrillic", "[\\u0400-\\u04FF]", "[\\x{0400}-\\x{04FF}]"),
    ("cjk", "[\\u4E00-\\u9FFF]", "[\\x{4E00}-\\x{9FFF}]"),
    ("arabic", "[\\u0600-\\u06FF]", "[\\x{0600}-\\x{06FF}]"),
    ("digit", "[0-9]", "[0-9]"),
]


def with_script_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Unicode script profile — the script-level complement of
    the marker-word language id (multilingual corpora are routed by script
    BEFORE language: CJK/Arabic/Cyrillic text never reaches a Latin
    marker-word model).

    Adds, per script class: ``n_<script>`` (character count via the
    count-by-deletion identity ``length(s) - length(replace(s, cls, ''))``
    — pure codegen, no explode), ``ratio_<script>`` (of total chars,
    round-6), plus ``n_chars_total`` and ``dominant_script`` (max count;
    ties break by the fixed class order; empty text → 'none'). All counts
    are exact integers, so the profile is partitioning- and
    engine-independent."""
    txt = F.coalesce(F.col(text_col), F.lit(""))  # NULL text = empty profile
    total = F.length(txt)
    counts = {
        name: (total - F.length(F.regexp_replace(txt, jre, ""))).cast("long")
        for name, jre, _ in SCRIPT_CLASSES
    }
    out = df.withColumn("n_chars_total", total.cast("long"))
    for name in counts:
        out = out.withColumn(f"n_{name}", counts[name])
    for name in counts:
        out = out.withColumn(
            f"ratio_{name}",
            F.when(total > 0, F.round(counts[name] / total, 6)).otherwise(F.lit(0.0)),
        )
    mx = F.greatest(*counts.values())
    dominant = F.when(mx == 0, F.lit("none"))
    for name, _, _ in SCRIPT_CLASSES:
        dominant = dominant.when(counts[name] == mx, F.lit(name))
    return out.withColumn("dominant_script", dominant)


def zipf_slope(
    df: DataFrame, text_col: str = "text", top_v: int = 1000
) -> DataFrame:
    """Zipf rank-frequency fit over the corpus unigram distribution:
    the least-squares slope of ln(freq) vs ln(rank) across the top-V
    tokens — the one-number corpus-health probe (natural language sits
    near −1; templated/boilerplate-heavy or synthetic corpora drift
    off, so it's a cheap generated-text / corpus-mix alarm).

    Counts are the one map-side-combinable token shuffle every text
    operator here shares; ranking the top-V runs through a row_number
    over (count DESC, token ASC) LIMITed to V — vocabulary-sized, and
    the limit compiles to the map-side WindowGroupLimit path. The
    regression moments are sums of per-token doubles (ln of exact
    counts — identical IEEE per term in any engine) accumulated as
    nano-floored BIGINTs, the order-free float-sum discipline, then one
    closed-form slope/intercept division each (round 6).

    Returns one row: (v, slope, intercept).
    """
    if top_v < 2:
        raise ValueError(f"top_v must be >= 2, got {top_v}")
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("_tok"))
        .filter(F.col("_tok") != "")
        .groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = W.orderBy(F.col("_c").desc(), F.col("_tok"))
    ranked = (
        counts.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= top_v)
    )
    nano = 1_000_000_000
    x = F.log(F.col("_r").cast("double"))
    y = F.log(F.col("_c").cast("double"))

    def _nsum(term):
        return F.sum(F.floor(term * nano).cast("long"))

    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("v"),
        _nsum(x).alias("_sx"),
        _nsum(y).alias("_sy"),
        _nsum(x * x).alias("_sxx"),
        _nsum(x * y).alias("_sxy"),
    )
    n = F.col("v").cast("double")
    sx = F.col("_sx") / float(nano)
    sy = F.col("_sy") / float(nano)
    sxx = F.col("_sxx") / float(nano)
    sxy = F.col("_sxy") / float(nano)
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den
    return m.select(
        "v",
        F.when(den > 0, F.round(slope, 6)).alias("slope"),
        F.when(den > 0, F.round((sy - slope * sx) / n, 6)).alias("intercept"),
    )


def heaps_law(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    buckets: int = 64,
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit V(N) ≈ K·N^β over the corpus in
    ``id_col`` order — the companion to :func:`zipf_slope` (natural
    corpora grow vocabulary at β ≈ 0.4–0.6; templated or synthetic
    corpora plateau, near-dup-heavy corpora undershoot — a one-number
    "is new data bringing new words?" probe for a growing training
    mix).

    Scale shape (the part a naive cumulative-distinct gets wrong): no
    per-document global ordering ever exists. Documents map to
    ``buckets`` fixed id-range buckets via one 1-row (min, max) id
    broadcast; each token contributes to its FIRST bucket (min bucket —
    one token-shuffle groupBy, vocabulary-sized output); cumulative
    vocabulary and token mass are windows over the BUCKET relation
    (≤ ``buckets`` rows). The ln-ln OLS uses the loglog-elasticity
    nano discipline: per-bucket ln doubles FLOOR-quantized to integers
    before summation, n·10⁹-rescaled closed-form slope — one fixed IEEE
    sequence, hash-stable at round 6. Buckets with zero cumulative mass
    contribute no point. Degenerate fits (< 2 populated buckets or zero
    x-variance) report NULL β/K.

    Returns one row (n_buckets_used, n_docs, n_tokens, vocab,
    heaps_beta, heaps_k).
    """
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    d38 = "decimal(38,0)"
    ids = df.agg(
        F.min(F.col(id_col)).alias("_lo"), F.max(F.col(id_col)).alias("_hi")
    )
    base = df.crossJoin(F.broadcast(ids)).select(
        F.expr(
            f"CAST(({id_col} - _lo) * {buckets} DIV "
            f"(_hi - _lo + 1) AS INT)"
        ).alias("_b"),
        tokens(F.col(text_col)).alias("_toks"),
    )
    tok = base.select("_b", F.explode("_toks").alias("_t")).filter(
        F.col("_t") != ""
    )
    # per-token first bucket + total occurrences per bucket. The three
    # aggregates all derive from the same base lineage — rename each
    # join key distinctly or Catalyst reports MISSING_ATTRIBUTES on the
    # self-derived join.
    first_seen = tok.groupBy("_t").agg(F.min("_b").alias("_fb"))
    new_vocab = first_seen.groupBy(F.col("_fb").alias("_bv")).agg(
        F.count(F.lit(1)).cast(d38).alias("_nv")
    )
    tok_mass = tok.groupBy(F.col("_b").alias("_bm")).agg(
        F.count(F.lit(1)).cast(d38).alias("_nt")
    )
    docs_per = base.groupBy(F.col("_b").alias("_bd")).agg(
        F.count(F.lit(1)).cast(d38).alias("_nd")
    )
    per_bucket = (
        docs_per.join(tok_mass, F.col("_bd") == F.col("_bm"), "left")
        .join(new_vocab, F.col("_bd") == F.col("_bv"), "left")
        .select(
            F.col("_bd").alias("_b"),
            F.coalesce(F.col("_nt"), F.lit(0).cast(d38)).alias("_nt"),
            F.coalesce(F.col("_nv"), F.lit(0).cast(d38)).alias("_nv"),
            "_nd",
        )
    )
    wcum = W.orderBy("_b").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = per_bucket.select(
        "_b",
        "_nd",
        F.sum("_nt").over(wcum).alias("_cn"),
        F.sum("_nv").over(wcum).alias("_cv"),
    ).filter((F.col("_cn") > 0) & (F.col("_cv") > 0))
    nano = 1e9
    lx = F.log(F.col("_cn").cast("double"))
    ly = F.log(F.col("_cv").cast("double"))
    pts = cum.select(
        "_nd",
        "_cn",
        "_cv",
        F.floor(lx * nano).cast("long").cast(d38).alias("_x"),
        F.floor(ly * nano).cast("long").cast(d38).alias("_y"),
        F.floor(lx * lx * nano).cast("long").cast(d38).alias("_xx"),
        F.floor(lx * ly * nano).cast("long").cast(d38).alias("_xy"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).cast(d38).alias("_n"),
        F.sum("_nd").alias("_docs"),
        F.max("_cn").alias("_toktot"),
        F.max("_cv").alias("_vocab"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum("_xx").alias("_sxx"),
        F.sum("_xy").alias("_sxy"),
    )
    n = F.col("_n")
    n9 = n * F.lit(1_000_000_000).cast(d38)
    den = (n9 * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
    beta = (n9 * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(
        "double"
    ) / den
    icept = (
        (F.col("_sy").cast("double") - beta * F.col("_sx").cast("double"))
        / n.cast("double")
        / 1e9
    )
    ok = (n > 1) & (den > 0)
    return agg.select(
        n.cast("long").alias("n_buckets_used"),
        F.col("_docs").cast("long").alias("n_docs"),
        F.col("_toktot").cast("long").alias("n_tokens"),
        F.col("_vocab").cast("long").alias("vocab"),
        F.when(ok, F.round(beta, 6)).alias("heaps_beta"),
        F.when(ok, F.round(F.exp(icept), 6)).alias("heaps_k"),
    )


def chao1_from_occurrences(df: DataFrame, unit_cols: list[str]) -> DataFrame:
    """Chao1 over ANY occurrence relation — each row is one sighting of
    the unit identified by ``unit_cols`` (a token, a user-day, a URL);
    the estimator needs only the sighting-count histogram. The text
    wrapper :func:`chao1_richness` explodes tokens into this."""
    counts = (
        df.groupBy(*unit_cols)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    m = counts.agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum("_c").cast("long").alias("n_tokens"),
        F.sum((F.col("_c") == 1).cast("long")).alias("f1"),
        F.sum((F.col("_c") == 2).cast("long")).alias("f2"),
    )
    f1 = F.col("f1").cast("double")
    chao1 = F.col("vocab").cast("double") + (f1 * (f1 - 1.0)) / (
        2.0 * (F.col("f2").cast("double") + 1.0)
    )
    return m.select(
        "vocab", "n_tokens", "f1", "f2", F.round(chao1, 6).alias("chao1")
    )


def chao1_richness(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Chao1 estimate of the TRUE vocabulary size from the observed
    token counts — "how many word types exist that this corpus hasn't
    sampled yet?", the coverage companion to :func:`heaps_law` (Heaps
    extrapolates growth; Chao1 lower-bounds the asymptote from the
    rare-type counts alone):

        chao1 = D + f1·(f1 − 1) / (2·(f2 + 1))

    (bias-corrected form — defined even when no type occurs exactly
    twice), with D the observed distinct types and f1/f2 the singleton/
    doubleton type counts. Everything through the formula's inputs is
    the one map-side-combinable token-count shuffle every text operator
    shares plus a three-cell aggregation of exact integers; the
    estimate is one IEEE sequence. Returns one row
    (vocab, n_tokens, f1, f2, chao1).
    """
    occ = df.select(
        F.explode(tokens(F.col(text_col))).alias("_tok")
    ).filter(F.col("_tok") != "")
    return chao1_from_occurrences(occ, ["_tok"])


def good_turing_from_occurrences(
    df: DataFrame, unit_cols: list[str], max_r: int = 10
) -> DataFrame:
    """Good–Turing adjusted counts over ANY occurrence relation (see
    :func:`chao1_from_occurrences` for the unit framing)."""
    if max_r < 1:
        raise ValueError(f"max_r must be >= 1, got {max_r}")
    counts = (
        df.groupBy(*unit_cols)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    fof = counts.groupBy(F.col("_c").alias("r")).agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    )
    nxt = fof.select(
        (F.col("r") - 1).alias("_rp"), F.col("n_r").alias("_n_next")
    )
    return (
        fof.filter(F.col("r") <= max_r)
        .join(nxt, F.col("r") == F.col("_rp"), "left")
        .select(
            F.col("r").cast("long").alias("r"),
            "n_r",
            F.round(
                (F.col("r") + 1).cast("double")
                * F.try_divide(
                    F.col("_n_next").cast("double"),
                    F.col("n_r").cast("double"),
                ),
                6,
            ).alias("r_star"),
        )
    )


def good_turing_counts(
    df: DataFrame, text_col: str = "text", max_r: int = 10
) -> DataFrame:
    """Good–Turing adjusted counts over the corpus frequency-of-
    frequencies — the smoothing table every count-based LM needs
    (r* answers "a type seen r times: how many times does it REALLY
    occur per corpus-worth of text?"; r*=0's mass N1/N is the unseen-
    event probability):

        r* = (r + 1) · N_{r+1} / N_r

    Two shuffles, both shrinking fast: token counts (vocabulary-sized),
    then frequency-of-frequencies (count-domain-sized — tens of rows);
    the adjusted count is one divide over exact integer cells via a
    self-join on r+1 (NULL where N_{r+1} is unobserved — honest gaps,
    not zeros). Returns (r, n_r, r_star) for 1 ≤ r ≤ ``max_r``.
    """
    occ = df.select(
        F.explode(tokens(F.col(text_col))).alias("_tok")
    ).filter(F.col("_tok") != "")
    return good_turing_from_occurrences(occ, ["_tok"], max_r=max_r)
