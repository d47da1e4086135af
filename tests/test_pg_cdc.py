"""PG slot management: SQL shapes, LSN math, validation + reconcile rules."""

from __future__ import annotations

import pytest

from olake_spark.sources.pg_cdc import (
    advance_slot_query,
    format_lsn,
    parse_lsn,
    reconcile_lsn,
    slot_exists_query,
    slot_info_query,
    validate_slot,
)


def test_lsn_roundtrip_and_ordering():
    assert parse_lsn("0/16B2F88") == 0x16B2F88
    assert parse_lsn("2/0") == 2 << 32
    assert parse_lsn("2/0") > parse_lsn("1/FFFFFFFF")
    assert format_lsn(parse_lsn("A1/BC9F00")) == "A1/BC9F00"


def test_slot_queries():
    assert "pg_replication_slots" in slot_exists_query("olake_slot")
    q = slot_info_query("olake_slot")
    assert "confirmed_flush_lsn" in q and "pg_current_wal_lsn()" in q
    assert "pg_replication_slot_advance('s1', '0/16B2F88')" in advance_slot_query("s1", "0/16B2F88")


def test_identifier_validation():
    with pytest.raises(ValueError):
        slot_exists_query("s'; DROP TABLE x--")


def test_validate_slot_rules():
    validate_slot("logical", "wal2json", None)
    validate_slot("logical", "pgoutput", "pub1")
    with pytest.raises(ValueError, match="logical"):
        validate_slot("physical", "wal2json", None)
    with pytest.raises(ValueError, match="publication"):
        validate_slot("logical", "pgoutput", "")


def test_reconcile_matching_resumes():
    assert reconcile_lsn("0/16B2F88", "0/16B2F88") == "0/16B2F88"


def test_reconcile_divergence_is_fatal():
    with pytest.raises(RuntimeError, match="mismatch"):
        reconcile_lsn("0/16B2F88", "0/16B3000")
    with pytest.raises(RuntimeError, match="empty"):
        reconcile_lsn(None, "0/16B3000")
