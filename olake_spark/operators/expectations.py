"""Declarative data-contract expectations — the Great-Expectations-shaped
suite a sync pipeline asserts over its own output (beyond parity: the
reference replicates rows, it never validates them; SURVEY.md §2.12).

An expectation is (name, predicate Column); the whole suite evaluates in
ONE aggregation pass over the relation — every predicate becomes a
conditional count, so a 100-expectation suite over 100 TB costs exactly
one scan with map-side partial aggregation, not 100 queries. NULL
predicate results count as failures (SQL three-valued logic would
otherwise silently pass NULL rows through a ``between`` check).

Helpers build the standard expectation vocabulary: not_null, unique is
deliberately absent (uniqueness needs a groupBy — use audit_keys),
in_set, between, matches_regex.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "expect_not_null",
    "expect_in_set",
    "expect_between",
    "expect_matches",
    "expectations_report",
]


def expect_not_null(col: str) -> tuple[str, Column]:
    return (f"{col}_not_null", F.col(col).isNotNull())


def expect_in_set(col: str, values: list) -> tuple[str, Column]:
    return (f"{col}_in_set", F.col(col).isin(values))


def expect_between(col: str, lo, hi) -> tuple[str, Column]:
    return (f"{col}_between", F.col(col).between(F.lit(lo), F.lit(hi)))


def expect_matches(col: str, pattern: str) -> tuple[str, Column]:
    return (f"{col}_matches", F.col(col).rlike(pattern))


def expectations_report(
    df: DataFrame, expectations: list[tuple[str, Column]]
) -> DataFrame:
    """(expectation, n_rows, n_pass, n_fail, pass_rate) — one row per
    expectation, ONE scan total. ``n_fail`` counts rows where the
    predicate is false OR NULL (a NULL check result is a failed
    contract, not an abstention); ``pass_rate`` divides exact integers
    once."""
    if not expectations:
        raise ValueError("expectations must be non-empty")
    aggs = []
    for name, pred in expectations:
        aggs.append(
            F.sum(F.when(pred, 1).otherwise(0)).alias(f"_p_{name}")
        )
    totals = df.agg(F.count(F.lit(1)).alias("_n"), *aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("expectation"),
                    F.col("_n").alias("n_rows"),
                    F.col(f"_p_{name}").alias("n_pass"),
                    (F.col("_n") - F.col(f"_p_{name}")).alias("n_fail"),
                    F.round(F.col(f"_p_{name}") / F.col("_n"), 6).alias(
                        "pass_rate"
                    ),
                )
                for name, _ in expectations
            ]
        )
    ).alias("_e")
    return totals.select(rows).select("_e.*")
