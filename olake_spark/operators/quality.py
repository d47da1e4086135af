"""Corpus-quality operators for training-data curation.

Implements the repetition-based quality signals popularized by the Gopher /
MassiveText filtering rules (Rae et al. 2021, "Scaling Language Models",
appendix A1.1) and the C4 cleaning heuristics — the standard pre-training
corpus filters:

- ``with_dup_token_frac``   : fraction of tokens that are repeats of an
                              earlier token (per-row, zero shuffle)
- ``repetition_stats``      : top-n-gram coverage (n=2,3) and duplicated
                              n-gram coverage (n=5) per document
- ``with_bpe_token_estimate``: subword-ish token count from a GPT-2-style
                              pretokenizer regex (words / numbers /
                              punctuation runs), cheap proxy for a real BPE
                              tokenizer without shipping a vocab
- ``ngrams``                : word n-gram column builder (shared with
                              decontamination)

Scale notes (100 TB): ``with_*`` functions are pure per-row column
expressions — embarrassingly parallel, whole-stage-codegen'd, no shuffle.
``repetition_stats`` explodes word n-grams and aggregates twice, both times
keyed by ``(doc_id, ...)`` — the document id is effectively unique, so the
hash aggregation is near-perfectly distributed and map-side partial
aggregation collapses each document's grams within its own partition before
any shuffle. No join against the corpus text is needed: the stats relation
carries only ids + longs.

Reference parity note: the reference engine (olake) has no corpus-quality
operators — this family is part of the training-data-pipeline extension
surface (BASELINE north star), not a port.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from olake_spark.operators.text import tokens

__all__ = [
    "BPE_PRETOKEN_RE",
    "ngrams",
    "with_dup_token_frac",
    "with_bpe_token_estimate",
    "repetition_stats",
    "rare_token_ratio",
    "unigram_info_score",
    "gopher_quality_flags",
    "dup_span_stats",
    "source_quality_report",
    "source_quality_filter",
]

# GPT-2-style pretokenizer classes, simplified so the SAME pattern means
# the SAME thing in Spark (Java regex) and DuckDB (RE2) oracles:
# contraction suffixes, letter runs, digit runs, non-space symbol runs.
# Whitespace is the EXPLICIT class below, never `\s`: Java's \s includes
# vertical tab (0x0B) while RE2's does not, so `\s` pretokenizes text
# containing VT differently in the two engines (verified divergence) —
# with the explicit class both agree byte-for-byte.
BPE_WS_CLASS = r" \t\n\r\f\x0B"
BPE_PRETOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9" + BPE_WS_CLASS + r"']+"
)


def ngrams(toks: Column, n: int) -> Column:
    """Array of space-joined word ``n``-grams; docs shorter than ``n`` tokens
    yield an empty array (guard needed: ``sequence`` with a negative stop
    would count *down* and fabricate grams)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def with_dup_token_frac(
    df: DataFrame, text_col: str = "text", out: str = "dup_token_frac"
) -> DataFrame:
    """1 - distinct/total tokens — crude but effective word-repetition signal
    computed entirely per-row (array_distinct), no shuffle."""
    toks = tokens(F.col(text_col))
    n = F.size(toks).cast("double")
    frac = F.when(n > 0, F.lit(1.0) - F.size(F.array_distinct(toks)) / n).otherwise(F.lit(0.0))
    return df.withColumn(out, F.round(frac, 6))


def with_bpe_token_estimate(
    df: DataFrame, text_col: str = "text", out: str = "n_bpe_tokens"
) -> DataFrame:
    """Count GPT-2-pretokenizer matches as a subword-token estimate.

    A real BPE tokenizer only ever *splits* pretokens further, so this is a
    lower bound proportional to true token counts on natural text — good
    enough for per-document cost accounting / length filtering without a
    vocab file. Pure ``regexp_count``: JVM-side, no Python."""
    return df.withColumn(
        out, F.regexp_count(F.col(text_col), F.lit(BPE_PRETOKEN_RE)).cast("long")
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3),
    dup_ns: tuple[int, ...] = (5,),
) -> DataFrame:
    """Per-document n-gram repetition coverage (Gopher A1.1 style).

    For each ``n`` in ``top_ns``: fraction of tokens covered by occurrences
    of the single most frequent ``n``-gram (``top{n}_frac``). For each ``n``
    in ``dup_ns``: fraction of tokens covered by all n-grams occurring more
    than once (``dup{n}_frac``; overlapping occurrences counted, may exceed
    1 — same convention as Gopher). Output: one row per input document with
    ``n_tokens``, ``dup_token_frac`` and the coverage columns.

    Dataflow: one explode of all requested n sizes tagged by ``n`` → one
    two-level hash aggregation keyed by (id, n, gram) then (id, n) → pivot
    via conditional aggregation → broadcast-free left join back to the
    per-row stats on the unique ``id`` — all shuffles are on the document
    id, so partial aggregation does almost all the work map-side.
    """
    all_ns = sorted(set(top_ns) | set(dup_ns))
    base = df.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("_toks"),
    ).select(
        id_col,
        F.size("_toks").cast("long").alias("n_tokens"),
        F.round(
            F.when(
                F.size("_toks") > 0,
                F.lit(1.0) - F.size(F.array_distinct("_toks")) / F.size("_toks").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_token_frac"),
        "_toks",
    )
    exploded = None
    for n in all_ns:
        part = base.select(
            id_col, F.lit(n).alias("n"), F.explode(ngrams(F.col("_toks"), n)).alias("gram")
        )
        exploded = part if exploded is None else exploded.unionByName(part)
    counts = exploded.groupBy(id_col, "n", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = counts.groupBy(id_col, "n").agg(
        F.max("cnt").alias("max_cnt"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))).alias("dup_cnt"),
    )
    aggs = []
    for n in top_ns:
        aggs.append(
            F.max(F.when(F.col("n") == n, F.col("max_cnt") * n)).alias(f"_top{n}_tok")
        )
    for n in dup_ns:
        aggs.append(
            F.max(F.when(F.col("n") == n, F.col("dup_cnt") * n)).alias(f"_dup{n}_tok")
        )
    pivoted = per_doc.groupBy(id_col).agg(*aggs)
    out = base.drop("_toks").join(pivoted, id_col, "left")
    for n in top_ns:
        out = out.withColumn(
            f"top{n}_frac",
            F.round(
                F.coalesce(F.col(f"_top{n}_tok"), F.lit(0)) / F.col("n_tokens").cast("double"), 6
            ),
        ).drop(f"_top{n}_tok")
    for n in dup_ns:
        out = out.withColumn(
            f"dup{n}_frac",
            F.round(
                F.coalesce(F.col(f"_dup{n}_tok"), F.lit(0)) / F.col("n_tokens").cast("double"), 6
            ),
        ).drop(f"_dup{n}_tok")
    return out


def rare_token_ratio(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int | None = None,
    min_df_fraction: float | None = None,
) -> DataFrame:
    """Per-document fraction of token occurrences whose corpus document
    frequency is below the threshold — high ratios flag gibberish/OCR
    noise, near-zero ratios flag boilerplate (everything it says, everyone
    says). Threshold: an absolute ``min_df``, or ``min_df_fraction`` of the
    corpus size folded INTO the plan (a broadcast one-row count frame — no
    driver-side action while building the query, same trick as
    mixture_weighted_sample's feasibility cap).

    Scale shape: document frequency is one explode+distinct aggregation;
    the join back to occurrences is a LEFT SEMI against only the RARE
    vocabulary — every join key has df < min_df by construction, so the
    join is provably skew-free (the Zipf head never enters it). Output:
    (id, n_tokens, n_rare, rare_ratio_e6 — scaled integer for exact
    cross-engine comparison).
    """
    if (min_df is None) == (min_df_fraction is None):
        raise ValueError("pass exactly one of min_df / min_df_fraction")
    from olake_spark.operators.text import tokens

    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t"))
    dfreq = toks.distinct().groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    if min_df_fraction is not None:
        total = df.agg(F.count(F.lit(1)).alias("_total"))
        rare_vocab = (
            dfreq.join(F.broadcast(total))
            .filter(
                F.col("_df") < F.floor(F.lit(float(min_df_fraction)) * F.col("_total"))
            )
            .select("_t")
        )
    else:
        rare_vocab = dfreq.filter(F.col("_df") < min_df).select("_t")
    n_rare = (
        toks.join(rare_vocab, "_t", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_rare"))
    )
    base = df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens")
    )
    out = base.join(n_rare, id_col, "left").withColumn(
        "n_rare", F.coalesce(F.col("n_rare"), F.lit(0)).cast("long")
    )
    ratio = F.when(
        F.col("n_tokens") > 0,
        F.round(F.col("n_rare") * 1000000.0 / F.col("n_tokens"), 0),
    ).otherwise(F.lit(0.0))
    return out.withColumn("rare_ratio_e6", ratio.cast("long"))


def unigram_info_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-trained unigram surprisal per document — the model-free stand-in
    for perplexity filtering: info(w) = floor(log2 T) - floor(log2 c_w),
    where c_w is w's corpus occurrence count and T the total token count.
    High mean info = rare-token-heavy text (gibberish, OCR noise, codes);
    near-zero = boilerplate (every token is a corpus stop-word).

    All arithmetic is EXACT-INTEGER so the score is bit-identical in any
    engine under any partitioning (a float sum of log-probs is
    order-nondeterministic at the last ulp, which an exact-value oracle
    would flake on): floor(log2 n) computes as length(bin(n)) - 1, the mean
    is a scaled integer division. Scale shape: one token-frequency
    aggregation (map-side combinable), a 1-row total broadcast, and the
    occurrence↔vocab hash join — Zipf-hot tokens match exactly one vocab
    row each, so the join cannot explode. Output: (id, n_tokens, info_sum,
    mean_info_e3).
    """
    from olake_spark.operators.text import tokens

    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t"))
    vocab = toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_c"))
    total = toks.agg(F.count(F.lit(1)).alias("_tt"))
    info = F.length(F.bin("_tt")) - F.length(F.bin("_c"))
    per_doc = (
        toks.join(vocab, "_t")
        .join(F.broadcast(total))
        .select(F.col(id_col), info.alias("_info"))
        .groupBy(id_col)
        .agg(
            F.sum("_info").cast("long").alias("info_sum"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    base = df.select(F.col(id_col))
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("info_sum"), F.lit(0)).cast("long").alias("info_sum"),
        )
        .withColumn(
            "mean_info_e3",
            F.when(
                F.col("n_tokens") > 0,
                F.expr("1000 * info_sum div n_tokens"),
            ).otherwise(F.lit(0)).cast("long"),
        )
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The Gopher corpus-filter rule set (Rae et al. 2021, §A1.1) as
    per-document boolean flags plus the combined verdict.

    Every threshold compares EXACT INTEGERS (``10·symbols ≤ words`` instead
    of ``symbols/words ≤ 0.1``), so the flags are bit-identical in any
    engine under any partitioning — no float ratio ever materializes.
    Mean word length uses total-non-space-chars / words (identical to the
    per-token sum for whitespace tokenization, far cheaper than a
    higher-order fold). Single projection + one pass; no joins, no shuffle
    beyond the scan.

    Rules: 50 ≤ words ≤ 100000; 3 ≤ mean word length ≤ 10; hash/ellipsis
    symbol-to-word ratio ≤ 0.1; ≥ 80% of words contain a letter; ≥ 2
    distinct stop words present.
    """
    from olake_spark.operators.text import tokens

    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    toks = tokens(F.col(text_col))
    n_words = F.size(toks).cast("long")
    # chars excluding separators == Σ len(token) for whitespace tokens
    char_sum = (F.length(norm) - (n_words - 1)).cast("long")
    hashes = F.length(norm) - F.length(F.replace(norm, F.lit("#"), F.lit("")))
    ellipses = (
        F.length(norm) - F.length(F.replace(norm, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbols = (hashes + ellipses).cast("long")
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("long")
    stops = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
        )
    ).cast("long")
    flags = {
        "ok_word_count": (n_words >= 50) & (n_words <= 100_000),
        "ok_mean_word_len": (char_sum >= 3 * n_words) & (char_sum <= 10 * n_words),
        "ok_symbol_ratio": (10 * symbols) <= n_words,
        "ok_alpha_words": (5 * alpha_words) >= (4 * n_words),
        "ok_stopwords": stops >= 2,
    }
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        *[v.alias(k) for k, v in flags.items()],
    )
    passes = None
    for k in flags:
        passes = F.col(k) if passes is None else (passes & F.col(k))
    return out.withColumn("passes_gopher", passes)


def dup_span_stats(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """Cross-document duplicate-span exposure per document: the fraction of
    a doc's word ``k``-gram positions whose k-gram also occurs in at least
    one OTHER document (the sub-document duplication signal behind
    train-set memorization studies — exact repeated spans, not whole-doc
    near-dups, and invisible to doc-level dedup).

    Returns ``(id, n_grams, n_dup_grams, dup_fraction)``; docs shorter than
    k tokens report 0 grams and fraction 0.0. Scale shape mirrors
    ``rare_token_ratio``: one explode for gram positions, a distinct
    (doc, gram) pass folds to a VOCABULARY-sized document-frequency
    relation, and the join back to positions is a gram equi-join — no
    self-join of the corpus, no Python. Zipf-hot grams are exactly the
    boilerplate being measured, so they are kept (bounded: each doc
    contributes each position once).
    """
    toks = tokens(F.col(text_col))
    pos = df.select(F.col(id_col), F.explode(ngrams(toks, k)).alias("g"))
    gram_df = (
        pos.select(id_col, "g")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("_gdf"))
    )
    marked = pos.join(gram_df, "g").select(
        id_col, (F.col("_gdf") >= 2).cast("int").alias("_dup")
    )
    per_doc = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"), F.sum("_dup").alias("n_dup_grams")
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("n_dup_grams"), F.lit(0)).cast("long").alias("n_dup_grams"),
            F.round(
                F.coalesce(F.col("n_dup_grams"), F.lit(0))
                / F.greatest(F.coalesce(F.col("n_grams"), F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_fraction"),
        )
    )


def source_quality_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    min_docs: int = 10,
    min_quality: float = 0.5,
    max_dup_rate: float = 0.2,
) -> DataFrame:
    """Per-source (domain/crawl-feed) hygiene report — the RefinedWeb /
    FineWeb pattern of filtering at the SOURCE level, where spam and
    boilerplate concentrate, before any per-document pass: aggregate
    doc-level quality scores and the exact-dup rate per source, and flag
    sources failing either bar (with a ``min_docs`` support floor so a
    two-document source can't be condemned on noise).

    Output: (source, n_docs, sum_quality_micro, mean_quality, dup_rate,
    flagged). The flag decision is EXACT-INTEGER arithmetic end to end:
    round-6 doc scores become micro-units (×1e6, integral), the group sum
    is an order-free integer, and both threshold comparisons cross-multiply
    instead of dividing — identical bits on any partitioning and in the
    SQL oracle. ``mean_quality``/``dup_rate`` are derived round-6 ratios of
    those exact integers, for the report reader.

    Scale shape: one map-side-combinable aggregate keyed by source (plus
    the distinct-fingerprint sub-aggregate); sources are few relative to
    documents, so the shuffled frame is tiny.
    """
    from olake_spark.operators.dedup import normalize_text
    from olake_spark.operators.text import with_quality_features

    scored = with_quality_features(
        df.select(source_col, id_col, text_col), text_col
    )
    # NULL-text docs: score 0 micro (worst quality, not skipped — they still
    # count in n_docs so they must weigh on the mean) and a definite ''
    # fingerprint (md5(NULL) is NULL and count_distinct would DROP it,
    # inflating dup_rate as if every NULL-text doc were a duplicate).
    per_doc = scored.select(
        source_col,
        F.coalesce(
            F.round(F.col("quality_score") * 1e6).cast("long"), F.lit(0)
        ).alias("_q"),
        F.md5(F.coalesce(normalize_text(F.col(text_col)), F.lit(""))).alias("_fp"),
    )
    agg = per_doc.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_q").alias("sum_quality_micro"),
        F.count_distinct("_fp").alias("_nfp"),
    )
    mq = F.lit(int(round(min_quality * 1e6)))
    md = F.lit(int(round(max_dup_rate * 1e6)))
    dup_micro = (F.col("n_docs") - F.col("_nfp")) * F.lit(1_000_000)
    flagged = (F.col("n_docs") >= F.lit(int(min_docs))) & (
        (F.col("sum_quality_micro") < mq * F.col("n_docs"))
        | (dup_micro > md * F.col("n_docs"))
    )
    return agg.select(
        source_col,
        "n_docs",
        "sum_quality_micro",
        F.round(F.col("sum_quality_micro") / (F.col("n_docs") * F.lit(1e6)), 6).alias(
            "mean_quality"
        ),
        F.round(
            (F.col("n_docs") - F.col("_nfp")) / F.col("n_docs").cast("double"), 6
        ).alias("dup_rate"),
        flagged.alias("flagged"),
    )


def source_quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    min_docs: int = 10,
    min_quality: float = 0.5,
    max_dup_rate: float = 0.2,
) -> DataFrame:
    """Corpus minus every document from a flagged source: one anti-join
    against the (tiny, AQE-broadcast) flagged-source set."""
    bad = (
        source_quality_report(
            df, id_col, text_col, source_col, min_docs, min_quality, max_dup_rate
        )
        .filter(F.col("flagged"))
        .select(source_col)
    )
    return df.join(bad, source_col, "left_anti")


def flesch_reading_ease(
    df: DataFrame,
    id_col: str,
    text_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Flesch reading-ease census — the classic readability screen a
    text-quality pipeline runs next to the Gopher flags (very low FRE =
    legalese/boilerplate, implausibly high = fragment soup):

        FRE = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)

    with deterministic, ENGINE-PORTABLE proxies: words = whitespace
    tokens; sentences = [.!?]+ runs (min 1); syllables = [aeiouy]+
    vowel-group runs of the lowered text (the standard cheap syllable
    estimate — both counts are computed by delete-then-length-diff, so
    any regexp engine that agrees on these two character classes agrees
    on the number). Documents with zero words drop (FRE undefined) and
    are counted in ``n_empty``.

    Per-group aggregation nano-floors each document's FRE and the two
    per-doc ratios before the integer sums (the surprisal/MI order-free
    discipline). Returns (by..., n_docs, n_empty,
    avg_words_per_sentence, avg_syllables_per_word, avg_flesch).
    """
    by = list(by or [])
    norm = F.lower(F.col(text_col))
    # runs of X = len(text) - len(text with [X]+ deleted) ... counts
    # CHARACTERS; to count RUNS, replace each run with one marker char
    syl = F.size(F.split(norm, "[aeiouy]+", -1)).cast("long") - 1
    sent = F.greatest(
        F.lit(1).cast("long"),
        F.size(F.split(F.col(text_col), "[.!?]+", -1)).cast("long") - 1,
    )
    toks = F.split(F.trim(norm), r"\s+")
    words = (
        F.when(F.trim(norm) == "", F.lit(0)).otherwise(F.size(toks))
    ).cast("long")
    per_doc = df.select(
        *by,
        F.col(id_col).alias("_id"),
        words.alias("_w"),
        sent.alias("_s"),
        syl.alias("_y"),
    )
    wps = F.col("_w").cast("double") / F.col("_s").cast("double")
    spw = F.col("_y").cast("double") / F.col("_w").cast("double")
    fre = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    nano = 1_000_000_000
    staged = per_doc.select(
        *by,
        (F.col("_w") > 0).alias("_ok"),
        F.when(F.col("_w") > 0, F.floor(wps * nano).cast("long"))
        .otherwise(0).alias("_wps_n"),
        F.when(F.col("_w") > 0, F.floor(spw * nano).cast("long"))
        .otherwise(0).alias("_spw_n"),
        F.when(F.col("_w") > 0, F.floor(fre * nano).cast("long"))
        .otherwise(0).alias("_fre_n"),
    )
    agg = staged.groupBy(*by).agg(
        F.sum(F.col("_ok").cast("long")).alias("n_docs"),
        F.sum((~F.col("_ok")).cast("long")).alias("n_empty"),
        F.sum("_wps_n").alias("_sw"),
        F.sum("_spw_n").alias("_ss"),
        F.sum("_fre_n").alias("_sf"),
    )
    n = F.col("n_docs").cast("double")
    return agg.select(
        *by,
        "n_docs",
        "n_empty",
        F.round(F.try_divide(F.col("_sw").cast("double") / nano, n), 6)
        .alias("avg_words_per_sentence"),
        F.round(F.try_divide(F.col("_ss").cast("double") / nano, n), 6)
        .alias("avg_syllables_per_word"),
        F.round(F.try_divide(F.col("_sf").cast("double") / nano, n), 6)
        .alias("avg_flesch"),
    )
