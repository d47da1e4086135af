"""URL / domain operators for corpus curation.

Web-scraped training corpora are filtered by source domain (C4 blocklist,
RefinedWeb URL rules): extract URLs from document text, aggregate per
registrable domain, and drop documents that cite blocklisted domains.

All extraction is per-row ``regexp_extract_all`` (JVM, codegen'd). The only
shuffle is the per-domain aggregation, keyed by domain — web domains are
Zipf-skewed, but counts are algebraic aggregates so map-side partial
aggregation absorbs the skew before the shuffle; no row explosion survives
past the partial agg.

Training-data extension surface (no reference counterpart).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["URL_RE", "extract_urls", "domain_of", "domain_stats", "filter_blocked_domains"]

# RE2-compatible (also valid Java regex): scheme + non-space run. Trailing
# punctuation is deliberately kept — curation counts, not link resolution.
URL_RE = r"https?://[^\s]+"
_DOMAIN_RE = r"https?://([^/\s:]+)"


def extract_urls(df: DataFrame, text_col: str = "text", out: str = "urls") -> DataFrame:
    """Array of URL matches per document (empty array when none)."""
    return df.withColumn(out, F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0))


def domain_of(url: Column) -> Column:
    """Host part of a URL ('' when the pattern finds none)."""
    return F.regexp_extract(url, _DOMAIN_RE, 1)


def domain_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-domain URL and document counts over the corpus.

    ``n_urls`` counts every mention; ``n_docs`` counts distinct documents
    (exact distinct on the unique id — at 100 TB swap for
    ``approx_count_distinct`` if an estimate suffices)."""
    urls = extract_urls(df, text_col).select(
        id_col, F.explode("urls").alias("url")
    )
    return (
        urls.withColumn("domain", domain_of(F.col("url")))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct(id_col).alias("n_docs"),
        )
    )


def filter_blocked_domains(
    df: DataFrame,
    blocked: list[str],
    text_col: str = "text",
    mode: str = "drop",
) -> DataFrame:
    """Drop (or flag, ``mode='flag'`` adds a ``blocked`` int column)
    documents whose text cites any blocklisted domain.

    The blocklist is compiled into ONE alternation regex evaluated per row —
    no join, no shuffle; a million-entry blocklist would instead broadcast a
    domain table and anti-join on the exploded domain column, but for the
    typical curated list (thousands) a single scan-side regex is cheaper.
    """
    if not blocked:
        return df.withColumn("blocked", F.lit(0)) if mode == "flag" else df
    # escape regex metacharacters conservatively ('.' is the common one)
    alts = "|".join(d.replace(".", r"\.") for d in blocked)
    pat = rf"https?://(?:[^/\s:]*\.)?(?:{alts})(?:[/\s:]|$)"
    hit = F.col(text_col).rlike(pat)
    if mode == "flag":
        return df.withColumn("blocked", F.when(hit, F.lit(1)).otherwise(F.lit(0)))
    return df.filter(~hit)
