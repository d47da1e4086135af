"""Postgres logical-replication slot management — driver-side SQL + rules.

The heavy lifting of PG CDC is split in two in this engine:

- decode: ``streaming/wal2json.py`` turns wal2json payload batches into
  changelog DataFrames declaratively (scan-shaped, distributed);
- control: THIS module — the tiny driver-side SQL that validates/positions
  the replication slot and the ordering rules that make replay safe.

Reference parity (drivers/postgres/internal/cdc.go:182-248,
pkg/waljs/replicator.go:20):

- slot existence + validation: must be a LOGICAL slot; pgoutput plugin
  requires a publication (cdc.go:214-230)
- state-vs-slot LSN agreement: a state LSN that diverges from the slot's
  confirmed_flush_lsn is non-retryable — "clear destination" (cdc.go:232-248)
- **ack BEFORE state write** (cdc.go:194-199): if the slot ack fails the
  state keeps its old value and the next run retries; sink-side idempotent
  MERGE absorbs the resulting replay (at-least-once + dedup ⇒ exactly-once)
- LSN format: PostgreSQL "X/Y" hex pairs, ordered numerically
"""

from __future__ import annotations

__all__ = [
    "slot_exists_query",
    "slot_info_query",
    "advance_slot_query",
    "parse_lsn",
    "format_lsn",
    "validate_slot",
    "reconcile_lsn",
]


def slot_exists_query(slot: str) -> str:
    _ident(slot)
    return (
        "SELECT EXISTS (SELECT 1 FROM pg_replication_slots "
        f"WHERE slot_name = '{slot}' AND database = current_database())"
    )


def slot_info_query(slot: str) -> str:
    """Plugin, type, confirmed position + server head in one probe
    (replicator.go:20)."""
    _ident(slot)
    return (
        "SELECT plugin, slot_type, confirmed_flush_lsn, "
        "pg_current_wal_lsn() AS current_lsn "
        f"FROM pg_replication_slots WHERE slot_name = '{slot}'"
    )


def advance_slot_query(slot: str, lsn: str) -> str:
    """Move the slot's confirmed position — the ack step. Issue BEFORE the
    state write (cdc.go:194-199 ordering)."""
    _ident(slot)
    return f"SELECT pg_replication_slot_advance('{slot}', '{format_lsn(parse_lsn(lsn))}')"


def parse_lsn(lsn: str) -> int:
    """'X/Y' hex pair → comparable 64-bit position."""
    hi, lo = lsn.split("/")
    return (int(hi, 16) << 32) | int(lo, 16)


def format_lsn(pos: int) -> str:
    return f"{pos >> 32:X}/{pos & 0xFFFFFFFF:X}"


def validate_slot(slot_type: str, plugin: str, publication: str | None) -> None:
    """cdc.go:214-230: logical slots only; pgoutput needs a publication."""
    if slot_type != "logical":
        raise ValueError(f"only logical slots are supported: {slot_type}")
    if plugin == "pgoutput" and not publication:
        raise ValueError("publication is required for pgoutput")


def reconcile_lsn(state_lsn: str | None, confirmed_flush_lsn: str) -> str:
    """cdc.go:232-248: empty or diverged state LSN is non-retryable — the
    slot has moved independently of the engine's state and a backfill from
    the wrong position would duplicate data. Matching LSNs resume."""
    if not state_lsn:
        raise RuntimeError("state lsn is empty — proceed with clear destination")
    if parse_lsn(state_lsn) != parse_lsn(confirmed_flush_lsn):
        raise RuntimeError(
            f"lsn mismatch — state [{state_lsn}] vs slot [{confirmed_flush_lsn}]; "
            "proceed with clear destination"
        )
    return state_lsn


def _ident(name: str) -> None:
    if not name.replace("_", "").isalnum():
        raise ValueError(f"suspicious identifier {name!r}")
