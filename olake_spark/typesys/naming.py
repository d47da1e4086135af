"""Destination column naming.

Reference behavior (utils/utils.go:396-407): destination column names are
lowercased with every non-alphanumeric run replaced by ``_``, unless the
stream opts into ``use_source_column_names``.
"""

from __future__ import annotations

import re

__all__ = ["reformat_column_name", "reformat_all"]

_NON_ALNUM = re.compile(r"[^a-z0-9]")


def reformat_column_name(name: str, use_source_names: bool = False) -> str:
    if use_source_names:
        return name
    return _NON_ALNUM.sub("_", name.lower())


def reformat_all(names: list[str], use_source_names: bool = False) -> dict[str, str]:
    """Map source→destination names; collisions get a numeric suffix."""
    out: dict[str, str] = {}
    seen: dict[str, int] = {}
    for n in names:
        d = reformat_column_name(n, use_source_names)
        if d in seen:
            seen[d] += 1
            d = f"{d}_{seen[d]}"
        else:
            seen[d] = 0
        out[n] = d
    return out
