"""Telemetry events (telemetry.py vs utils/telemetry/telemetry.go) and SSH
tunnel config/URL planning (sources/ssh_tunnel.py vs utils/ssh.go)."""

from __future__ import annotations

import json

import pytest

from olake_spark.sources.ssh_tunnel import SSHConfig, open_tunnel, tunneled_jdbc_url
from olake_spark.telemetry import Telemetry


def _catalog():
    from olake_spark.plans.stream import (
        Catalog,
        ConfiguredStream,
        StreamMetadata,
        StreamSpec,
    )

    streams = [
        ConfiguredStream(
            StreamSpec(name=n, namespace="public"),
            StreamMetadata(
                stream_name=n,
                normalization=(n != "raw"),
                partition_regex="/{col}" if n == "part" else "",
            ),
        )
        for n in ("a", "raw", "part")
    ]
    return Catalog(
        selected_streams={"public": [cs.metadata for cs in streams[:2]]},
        streams=streams,
    )


def test_event_shapes_and_jsonl_sink(tmp_path):
    path = str(tmp_path / "events.jsonl")
    t = Telemetry(config_dir=str(tmp_path), jsonl_path=path)
    t.track_discover(12, "postgres")
    t.track_sync_started("sync-1", _catalog(), "postgres", "ICEBERG",
                         full_load_streams=2, cdc_streams=1, catalog_type="glue")
    t.track_sync_completed("sync-1", True, 1234)

    lines = [json.loads(ln) for ln in open(path)]
    assert [e["event"] for e in lines] == [
        "Discover - CLI", "Sync Started - CLI", "Sync Completed - CLI",
    ]
    disc, started, done = lines
    assert disc["stream_count"] == 12 and disc["source_type"] == "postgres"
    # telemetry.go:117-129 property keys
    for key in ("sync_start", "sync_id", "stream_count", "selected_count",
                "full_load_streams", "cdc_streams", "source_type",
                "destination_type", "catalog_type", "normalized_streams",
                "partitioned_streams"):
        assert key in started, key
    assert started["stream_count"] == 3 and started["selected_count"] == 2
    assert started["normalized_streams"] == 2  # 'raw' is non-normalized
    assert started["partitioned_streams"] == 1
    assert done["sync_status"] == "SUCCESS" and done["records_synced"] == 1234
    # anonymous id is stable across instances (persisted file)
    assert Telemetry(config_dir=str(tmp_path)).user_id == t.user_id


def test_telemetry_kill_switch(tmp_path, monkeypatch):
    monkeypatch.setenv("TELEMETRY_DISABLED", "true")
    path = str(tmp_path / "events.jsonl")
    t = Telemetry(config_dir=str(tmp_path), jsonl_path=path)
    t.track_discover(1, "x")
    import os

    assert t.events == [] and not os.path.exists(path)


def test_telemetry_sender_errors_never_propagate(tmp_path):
    def boom(event, doc):
        raise RuntimeError("analytics down")

    t = Telemetry(config_dir=str(tmp_path), sender=boom)
    t.track_discover(1, "x")  # must not raise
    assert len(t.events) == 1


def test_ssh_config_validation_rules():
    # utils/ssh.go:23-40 rule-for-rule
    with pytest.raises(ValueError, match="host"):
        SSHConfig().validate()
    with pytest.raises(ValueError, match="port"):
        SSHConfig(host="b", port=0, username="u", password="p").validate()
    with pytest.raises(ValueError, match="username"):
        SSHConfig(host="b", port=22, password="p").validate()
    with pytest.raises(ValueError, match="private key or password"):
        SSHConfig(host="b", port=22, username="u").validate()
    SSHConfig(host="b", port=22, username="u", password="p").validate()
    # reference JSON keys load as-is, unknown keys ignored
    cfg = SSHConfig.from_json(
        {"host": "b", "port": 2222, "username": "u", "private_key": "PEM",
         "passphrase": "x", "extra": 1}
    )
    assert cfg.port == 2222 and cfg.private_key == "PEM"


def test_tunneled_jdbc_url_rewrites():
    assert (
        tunneled_jdbc_url("jdbc:postgresql://db.internal:5432/prod?ssl=true", 15432)
        == "jdbc:postgresql://127.0.0.1:15432/prod?ssl=true"
    )
    assert (
        tunneled_jdbc_url("jdbc:sqlserver://db.internal:1433;database=prod", 2433)
        == "jdbc:sqlserver://127.0.0.1:2433;database=prod"
    )
    assert (
        tunneled_jdbc_url("jdbc:oracle:thin:@db.internal:1521/XEPDB1", 11521)
        == "jdbc:oracle:thin:@127.0.0.1:11521/XEPDB1"
    )
    # default-port URL (no :port) still rewrites
    assert (
        tunneled_jdbc_url("jdbc:mysql://db.internal/prod", 13306)
        == "jdbc:mysql://127.0.0.1:13306/prod"
    )


def test_open_tunnel_gated_but_validates_first():
    with pytest.raises(ValueError, match="host"):
        open_tunnel(SSHConfig(), "db", 5432)
    with pytest.raises(NotImplementedError, match="paramiko"):
        open_tunnel(
            SSHConfig(host="b", port=22, username="u", password="p"), "db", 5432
        )
