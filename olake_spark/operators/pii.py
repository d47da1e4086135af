"""PII detection / redaction over text columns — pure codegen regex.

A training-data pipeline scrubs personally-identifying strings before
anything else sees the corpus. Patterns are deliberately conservative,
dialect-portable regexes (valid and identical under Java's engine and
RE2/DuckDB — no lookarounds, no backrefs) so the oracle can run the exact
same patterns:

- counting is `regexp_count` (one pass per pattern, JVM-side),
- redaction is a chained `regexp_replace` to ``[TYPE]`` placeholders,
- both are narrow per-row expressions: shuffle-free, scan-shaped at 100 TB.

Order matters in redaction: IPv4 before phone (a dotted quad is not a
phone), email first (an email contains no other pattern but its digits
could confuse nothing — fixed order keeps output deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "pii_counts",
    "redact_column",
    "redact_pii",
    "k_anonymity_report",
]

# pattern order is the redaction order (deterministic output)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+?\d{3}[- ]\d{3}[- ]\d{4}",
}


def pii_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Append one ``n_<type>`` count column per PII pattern."""
    out = df
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)))
    return out


def redact_column(col: Column) -> Column:
    """The chained-replace expression: every match → ``[TYPE]``."""
    for name, pat in PII_PATTERNS.items():
        col = F.regexp_replace(col, pat, f"[{name.upper()}]")
    return col


def redact_pii(df: DataFrame, text_col: str, out_col: str | None = None) -> DataFrame:
    """Redact all PII patterns in ``text_col`` (in place by default)."""
    return df.withColumn(out_col or text_col, redact_column(F.col(text_col)))


def k_anonymity_report(
    df: DataFrame,
    quasi_identifiers: list[str],
    sensitive_col: str,
    k: int = 5,
    l_diversity: int = 2,
) -> DataFrame:
    """Privacy audit before a dataset release: every equivalence class of
    the quasi-identifier combination, with its size (k-anonymity), its
    count of distinct sensitive values (l-diversity), and pass/fail flags.

    A release is k-anonymous iff EVERY class has >= k members (each row
    hides among at least k-1 others sharing its quasi-identifiers), and
    l-diverse iff every class carries >= l distinct sensitive values (a
    class of 50 rows all sharing one diagnosis still leaks it).

    Plan: one hash shuffle on the quasi-identifier tuple; both the count
    and the distinct-count are map-side combinable (count_distinct plans
    a partial/expand aggregate, never a collect). NULL quasi-identifier
    values form their own class (groupBy NULL semantics) — NULL is a
    disclosure-relevant value, not a droppable one. Output is bounded by
    class cardinality, not row count.
    """
    return df.groupBy(*quasi_identifiers).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.count_distinct(F.col(sensitive_col)).alias("sensitive_distinct"),
    ).select(
        *quasi_identifiers,
        "class_size",
        "sensitive_distinct",
        (F.col("class_size") >= k).alias("k_anonymous"),
        (F.col("sensitive_distinct") >= l_diversity).alias("l_diverse"),
    )
