"""Stream filter predicates.

The reference supports two filter surfaces (types/stream_configured.go:17-26,
209-266; validation protocol/sync.go:205-232):

1. **Structured filter config** — at most two conditions joined by AND/OR,
   operators ``= != < > <= >=``.
2. **Legacy string filter** — a tiny grammar ``col op value [and|or col op
   value]`` with optionally-quoted column names and values.

Both compile to a single Spark ``Column`` expression so Catalyst pushes them
into the source scan (JDBC WHERE / parquet row-group filters) — unlike the
reference, which evaluates structured filters post-read in the writer
(utils/typeutils/filter.go:24-110). Pushing both paths down is a deliberate
upgrade noted in SURVEY.md §4.

``compile_to_sql`` renders the same predicate as ANSI SQL for oracle parity
and for hand-built JDBC pushdown queries.

Null semantics follow the reference's SQL rendering (pkg/jdbc/jdbc.go:1244-1391):
``col = null`` → ``col IS NULL``, ``col != null`` → ``col IS NOT NULL``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["FilterCondition", "StreamFilter", "parse_legacy_filter"]

_OPS = {"=", "!=", "<", ">", "<=", ">="}


@dataclass(frozen=True)
class FilterCondition:
    column: str
    op: str
    value: object  # str | int | float | bool | None

    def __post_init__(self):
        if self.op not in _OPS:
            raise ValueError(f"unsupported filter operator: {self.op!r}")

    def to_column(self) -> Column:
        c = F.col(self.column)
        v = self.value
        if v is None:
            if self.op == "=":
                return c.isNull()
            if self.op == "!=":
                return c.isNotNull()
            raise ValueError(f"operator {self.op!r} not valid against null")
        ops = {
            "=": c.__eq__,
            "!=": c.__ne__,
            "<": c.__lt__,
            ">": c.__gt__,
            "<=": c.__le__,
            ">=": c.__ge__,
        }
        return ops[self.op](F.lit(v))

    def to_sql(self) -> str:
        if self.value is None:
            return f"{self.column} IS NULL" if self.op == "=" else f"{self.column} IS NOT NULL"
        v = self.value
        if isinstance(v, bool):
            rendered = "TRUE" if v else "FALSE"
        elif isinstance(v, (int, float)):
            rendered = repr(v)
        else:
            escaped = str(v).replace("'", "''")
            rendered = f"'{escaped}'"
        op = "<>" if self.op == "!=" else self.op
        return f"{self.column} {op} {rendered}"


@dataclass(frozen=True)
class StreamFilter:
    """≤2 conditions joined by one logical operator (reference contract)."""

    conditions: tuple[FilterCondition, ...] = field(default_factory=tuple)
    logical: str = "and"  # "and" | "or"

    def __post_init__(self):
        if len(self.conditions) > 2:
            raise ValueError("structured filters support at most 2 conditions")
        if self.logical.lower() not in ("and", "or"):
            raise ValueError(f"bad logical operator: {self.logical!r}")

    def to_column(self) -> Column:
        if not self.conditions:
            return F.lit(True)
        cols = [c.to_column() for c in self.conditions]
        if len(cols) == 1:
            return cols[0]
        return cols[0] & cols[1] if self.logical.lower() == "and" else cols[0] | cols[1]

    def to_sql(self) -> str:
        if not self.conditions:
            return "TRUE"
        parts = [c.to_sql() for c in self.conditions]
        return f" {self.logical.upper()} ".join(parts)


# legacy grammar: col op val [and|or col op val]; cols/vals may be quoted with "
_COND_RE = r'\s*("[^"]+"|[\w.]+)\s*(>=|<=|!=|=|>|<)\s*("[^"]*"|\'[^\']*\'|\S+)\s*'
_LEGACY_RE = re.compile(rf"^{_COND_RE}(?:\b(and|or)\b{_COND_RE})?$", re.IGNORECASE)


def _coerce(raw: str) -> object:
    if (raw.startswith('"') and raw.endswith('"')) or (raw.startswith("'") and raw.endswith("'")):
        return raw[1:-1]
    low = raw.lower()
    if low == "null":
        return None
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw


def parse_legacy_filter(text: str) -> StreamFilter:
    """Parse the legacy string filter grammar into a StreamFilter."""
    text = text.strip()
    if not text:
        return StreamFilter()
    m = _LEGACY_RE.match(text)
    if not m:
        raise ValueError(f"unparseable legacy filter: {text!r}")
    g = m.groups()

    def col(raw: str) -> str:
        return raw[1:-1] if raw.startswith('"') and raw.endswith('"') else raw

    conds = [FilterCondition(col(g[0]), g[1], _coerce(g[2]))]
    logical = "and"
    if g[3]:
        logical = g[3].lower()
        conds.append(FilterCondition(col(g[4]), g[5], _coerce(g[6])))
    return StreamFilter(tuple(conds), logical)
