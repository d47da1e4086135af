"""Column selection (projection) semantics.

Reference contract (types/stream_configured.go:52-159): a stream may carry a
``selected_columns`` allowlist plus ``sync_new_columns``:

- ``selected_columns is None``      → all columns sync.
- ``sync_new_columns = False``      → exactly the allowlist (intersected with
                                      what exists; missing entries ignored).
- ``sync_new_columns = True``       → the allowlist **plus any column not
  known at selection time** — i.e. "all except the ones the user explicitly
  de-selected". The de-selected set is (known_at_selection − allowlist).

Engine columns (_olake_*) always pass. Expressed as a plain ``df.select`` so
Catalyst prunes the source scan to exactly the surviving columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from olake_spark.functions.olake_columns import OLAKE_COLUMNS

__all__ = ["apply_projection"]


def apply_projection(
    df: DataFrame,
    selected_columns: list[str] | None,
    sync_new_columns: bool = True,
    known_at_selection: list[str] | None = None,
) -> DataFrame:
    """Apply selected-columns semantics; preserves source column order."""
    if selected_columns is None:
        return df
    present = list(df.columns)
    if sync_new_columns:
        known = set(known_at_selection if known_at_selection is not None else selected_columns)
        deselected = known - set(selected_columns)
        keep = [c for c in present if c not in deselected or c in OLAKE_COLUMNS]
    else:
        allow = set(selected_columns) | set(OLAKE_COLUMNS)
        keep = [c for c in present if c in allow]
    return df.select(*keep)
