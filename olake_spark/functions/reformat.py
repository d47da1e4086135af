"""Value-reformat family — per-type coercions as JVM-side Column expressions.

Reference semantics (utils/typeutils/reformat.go):

- ``DateTimeFormats`` (reformat.go:24-39): 14 accepted layouts, tried in
  order; a string must start with a ``YYYY-MM-DD``-shaped prefix before any
  layout is tried (reformat.go:231-259).
- Unparseable *database* timestamps fall back to the epoch start rather than
  erroring (reformat.go:276-280); unparseable *filter* values error.
- Year clamp (reformat.go:213-225): year < 1 → 1970-01-01 epoch start
  ("Spark only supports years from 1 to 9999"); year > 9999 → pulled back to
  year 9999 (we substitute the year component; the reference's
  ``AddDate(-(y-9999),0,0)`` differs only on Feb-29 sources).
- Bool table (reformat.go:118-142): "1/t/T/true/TRUE/True/YES/Yes/yes" and
  the negative mirror; ints 1/0.
- Integer epoch seconds → timestamp (reformat.go:159-167).
- TIME columns render as "15:04:05" strings (reformat.go:548-559).

Everything here is a pure ``pyspark.sql.functions`` expression — no Python
UDFs — so the coercions run inside whole-stage codegen and scale with the
executors. At 100 TB these run per-cell; staying JVM-side is the difference
between a scan-bound job and a Python-bound one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "TRUE_STRINGS",
    "FALSE_STRINGS",
    "SPARK_DATETIME_FORMATS",
    "to_bool",
    "parse_timestamp_multi",
    "clamp_year",
    "format_time",
    "to_int64",
    "to_float64",
]

TRUE_STRINGS = ["1", "t", "T", "true", "TRUE", "True", "YES", "Yes", "yes"]
FALSE_STRINGS = ["0", "f", "F", "false", "FALSE", "False", "NO", "No", "no"]

# java.time renderings of reformat.go:24-39's Go layouts, tried in order.
# Optional-section syntax ([...]) collapses several Go layouts into one
# pattern where the only difference is fractional-second width.
SPARK_DATETIME_FORMATS = [
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss XXX",
    "yyyy-MM-dd HH:mm:ssXXX",
    "yyyy-MM-dd HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd HH:mm:ss.SSSSSSx",
    "yyyy-MM-dd-HH.mm.ss.SSSSSS",  # DB2 style
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'",
    "yyyy-MM-dd'T'HH:mm:ssxx",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSS'Z'",
    "yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS]XXX",
    "yyyy-MM-dd",
]

# first-10-chars date guard (reformat.go:232-259): three dash-separated
# all-numeric groups; canonical data is zero-padded YYYY-MM-DD
_DATE_PREFIX = r"^\d{4}-\d{2}-\d{2}"

def _epoch() -> Column:
    # built lazily — Column construction needs an active SparkSession
    return F.timestamp_seconds(F.lit(0))


def to_bool(col: Column | str) -> Column:
    """Boolean from the reference's string/int acceptance table.

    Values outside the table become NULL (the reference raises; a distributed
    engine quarantines instead — callers can count NULLs to surface errors).
    """
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    return (
        F.when(s.isin(TRUE_STRINGS), F.lit(True))
        .when(s.isin(FALSE_STRINGS), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def parse_timestamp_multi(col: Column | str, db_timestamp: bool = True) -> Column:
    """Multi-layout timestamp parse with the reference's fallback rules.

    Integer-only strings (and integer columns) are epoch seconds
    (reformat.go:159-167). Strings must start with a date-shaped prefix
    before any layout is tried; when ``db_timestamp`` unparseable values
    collapse to the epoch start (reformat.go:276-280), otherwise NULL
    (the strict filter-value path).

    Documented divergence: the reference epoch-parses only values that are
    int-TYPED and sends digit-STRINGS ("2024") to the epoch-start fallback;
    a Column has one type for all rows, so digit-strings are epoch-parsed
    here too (a superset that keeps int columns correct after stringification).
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(c.cast("string"))
    attempts = [F.try_to_timestamp(s, F.lit(fmt)) for fmt in SPARK_DATETIME_FORMATS]
    parsed = F.coalesce(*attempts, F.try_to_timestamp(s))
    fallback = _epoch() if db_timestamp else F.lit(None).cast("timestamp")
    return (
        F.when(s.rlike(r"^-?\d+$"), F.timestamp_seconds(s.cast("long")))
        .when(s.rlike(_DATE_PREFIX), F.coalesce(parsed, fallback))
        .otherwise(fallback)
    )


def clamp_year(col: Column | str) -> Column:
    """Clamp timestamp years to Spark's supported [1, 9999] range.

    year < 1 → epoch start; year > 9999 → same instant with year 9999
    (reformat.go:213-225).
    """
    c = F.col(col) if isinstance(col, str) else col
    y = F.year(c)
    pulled = F.make_timestamp(
        F.lit(9999), F.month(c), F.day(c), F.hour(c), F.minute(c),
        F.second(c).cast("decimal(8,6)"),
    )
    return F.when(y < 1, _epoch()).when(y > 9999, pulled).otherwise(c)


def format_time(col: Column | str) -> Column:
    """TIME-typed values as "15:04:05"-style strings (reformat.go:548-559)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c.cast("timestamp"), "HH:mm:ss")


def to_int64(col: Column | str) -> Column:
    """Int64 from bool/int/float/numeric-string (reformat.go ReformatInt64).

    Floats truncate toward zero (Go int64(float) semantics); non-numeric
    strings become NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    return (
        F.when(s.isin(TRUE_STRINGS), F.lit(1).cast("long"))
        .when(s.isin(FALSE_STRINGS), F.lit(0).cast("long"))
        .otherwise(s.try_cast("double").try_cast("long"))
    )


def to_float64(col: Column | str) -> Column:
    """Float64 from any numeric-ish value; bools map to 1.0/0.0."""
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    return (
        F.when(s.isin(TRUE_STRINGS), F.lit(1.0))
        .when(s.isin(FALSE_STRINGS), F.lit(0.0))
        .otherwise(s.try_cast("double"))
    )
