"""Telemetry events — reference-shaped, local-sink by default.

Event-shape parity with utils/telemetry/telemetry.go:93-153: the same three
lifecycle events with the same property keys, an anonymous persisted user id
(:229-246), and the ``TELEMETRY_DISABLED`` env kill-switch (:58-62).

Deliberate divergence: the reference POSTs to an analytics endpoint; this
engine NEVER phones home. The default sink appends JSONL to a local file
(or swallows events when no path is configured); deployments that want
shipping inject their own ``sender`` callable.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field

__all__ = ["Telemetry", "telemetry_disabled"]

_USER_ID_FILE = "user_id.txt"


def telemetry_disabled() -> bool:
    return os.environ.get("TELEMETRY_DISABLED", "").lower() in ("1", "true", "yes")


def _user_id(config_dir: str | None) -> str:
    """Stable anonymous id, persisted next to the engine config
    (telemetry.go:229-246)."""
    path = os.path.join(config_dir, _USER_ID_FILE) if config_dir else None
    if path and os.path.exists(path):
        return open(path).read().strip().strip('"')
    generated = hashlib.sha256(uuid.uuid4().bytes).hexdigest()[:32]
    if path:
        os.makedirs(config_dir, exist_ok=True)
        with open(path, "w") as fh:
            fh.write(generated)
    return generated


@dataclass
class Telemetry:
    """Collects lifecycle events; ``sender`` decides where they go."""

    config_dir: str | None = None
    jsonl_path: str | None = None
    sender: Callable[[str, dict], None] | None = None
    events: list = field(default_factory=list)  # in-memory tail (tests/debug)

    def __post_init__(self) -> None:
        self.enabled = not telemetry_disabled()
        self.user_id = _user_id(self.config_dir) if self.enabled else ""

    def _send(self, event: str, props: dict) -> None:
        if not self.enabled:
            return
        doc = {"event": event, "user_id": self.user_id, "ts": time.time(), **props}
        self.events.append(doc)
        if self.sender is not None:
            try:
                self.sender(event, doc)
            except Exception:
                pass  # telemetry must never break a sync (telemetry.go style)
        elif self.jsonl_path:
            with open(self.jsonl_path, "a") as fh:
                fh.write(json.dumps(doc, default=str) + "\n")

    # -- the three lifecycle events (telemetry.go:93-153) --------------------

    def track_discover(self, stream_count: int, source_type: str) -> None:
        self._send(
            "Discover - CLI",
            {"stream_count": stream_count, "source_type": source_type},
        )

    def track_sync_started(
        self,
        sync_id: str,
        catalog,
        source_type: str,
        destination_type: str,
        full_load_streams: int = 0,
        cdc_streams: int = 0,
        catalog_type: str = "",
    ) -> None:
        selected = sum(len(m) for m in catalog.selected_streams.values())
        self._send(
            "Sync Started - CLI",
            {
                "sync_start": time.time(),
                "sync_id": sync_id,
                "stream_count": len(catalog.streams),
                "selected_count": selected,
                "full_load_streams": full_load_streams,
                "cdc_streams": cdc_streams,
                "source_type": source_type,
                "destination_type": destination_type,
                "catalog_type": catalog_type,
                "normalized_streams": sum(
                    1 for cs in catalog.streams if cs.metadata.normalization
                ),
                "partitioned_streams": sum(
                    1 for cs in catalog.streams if cs.metadata.partition_regex
                ),
            },
        )

    def track_sync_completed(self, sync_id: str, status: bool, records: int) -> None:
        self._send(
            "Sync Completed - CLI",
            {
                "sync_id": sync_id,
                "sync_end": time.time(),
                "sync_status": "SUCCESS" if status else "FAILED",
                "records_synced": records,
            },
        )
