"""Object-store clear semantics — the sink's ``drop``/``clear`` path on
S3/GCS, re-expressed as filesystem-agnostic logic.

The reference's parquet destination (destination/parquet/parquet.go:541-690)
clears a stream by deleting its prefix, with three behaviors this module
reproduces exactly:

1. **Linear-backoff retry with a retryability gate**
   (utils/utils.go:462-487): up to ``max_retries`` re-attempts, sleeping
   ``(attempt+1) · sleep`` between tries, bailing immediately on a
   non-retryable error.
2. **Rate-limit classification** (parquet.go:598-616): HTTP 429 (GCS "Too
   Many Requests") and 503 (S3 SlowDown/ServiceUnavailable) are the ONLY
   retryable classes; batch wrappers are peeled one layer to find the
   nested status.
3. **Bulk-delete with per-object fallback** (parquet.go:618-680): try the
   batch delete first; when it fails (GCS has no S3-compatible bulk-delete
   API), list the prefix and delete per object with bounded concurrency,
   each object delete itself retry-wrapped.

No cloud SDK lives here: callers hand in a ``ObjectStore`` duck (``list``,
``delete_one``, ``delete_batch``) — the local-FS implementation below backs
the tests, a boto3/gcsfs adapter plugs in unchanged in a real deployment.
Spark itself never needs this (table data lives behind ``ManagedTable``
atomic manifests); it exists for clearing raw parquet sink prefixes.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Callable, Protocol

__all__ = [
    "RateLimitError",
    "retry_with_skip",
    "is_rate_limit_error",
    "LocalObjectStore",
    "clear_prefix",
]


class RateLimitError(Exception):
    """A throttle response carrying the HTTP status (429 or 503)."""

    def __init__(self, status_code: int, message: str = ""):
        super().__init__(message or f"throttled: HTTP {status_code}")
        self.status_code = status_code


def is_rate_limit_error(err: BaseException) -> bool:
    """Retryability gate (parquet.go isRateLimitError): 429/503 only.

    Wrapped batch errors are peeled one layer via ``__cause__`` — the
    reference must do the same because AWS batch errors hide the
    RequestFailure inside ``OrigErr``.
    """
    def throttled(e: BaseException | None) -> bool:
        return isinstance(e, RateLimitError) and e.status_code in (429, 503)

    return throttled(err) or throttled(err.__cause__)


def retry_with_skip(
    fn: Callable[[], None],
    max_retries: int = 3,
    sleep: float = 60.0,
    should_retry: Callable[[BaseException], bool] | None = is_rate_limit_error,
    _sleeper: Callable[[float], None] = time.sleep,
) -> None:
    """``utils.RetryWithSkip`` parity: up to ``max_retries + 1`` attempts,
    linear backoff ``(attempt+1) · sleep`` between them, immediate re-raise
    when ``should_retry`` rejects the error. ``_sleeper`` is injectable so
    tests assert the backoff schedule without waiting on it."""
    err: BaseException | None = None
    for cur in range(max_retries + 1):
        try:
            fn()
            return
        except BaseException as e:  # noqa: BLE001 — classification decides
            err = e
        if should_retry is not None and not should_retry(err):
            raise err
        if cur != max_retries:
            _sleeper((cur + 1) * sleep)
    raise err


class ObjectStore(Protocol):
    def list(self, prefix: str) -> list[str]: ...
    def delete_one(self, key: str) -> None: ...
    def delete_batch(self, keys: list[str]) -> None: ...


@dataclass
class LocalObjectStore:
    """Filesystem-backed ObjectStore; ``fail_batch``/``throttle_next``
    simulate the GCS no-bulk-delete and 429-throttle behaviors in tests."""

    root: str
    fail_batch: bool = False
    throttle_next: int = 0  # next N delete_one calls raise 429
    calls: list[tuple[str, str]] = field(default_factory=list)

    def list(self, prefix: str) -> list[str]:
        base = os.path.join(self.root, prefix)
        out = []
        for dirpath, _, files in os.walk(base):
            for f in files:
                full = os.path.join(dirpath, f)
                out.append(os.path.relpath(full, self.root))
        return sorted(out)

    def delete_one(self, key: str) -> None:
        self.calls.append(("delete_one", key))
        if self.throttle_next > 0:
            self.throttle_next -= 1
            raise RateLimitError(429)
        os.remove(os.path.join(self.root, key))

    def delete_batch(self, keys: list[str]) -> None:
        self.calls.append(("delete_batch", f"{len(keys)} keys"))
        if self.fail_batch:
            raise RuntimeError("bulk delete not supported")  # the GCS shape
        for k in keys:
            os.remove(os.path.join(self.root, k))


def clear_prefix(
    store: ObjectStore,
    prefix: str,
    max_retries: int = 3,
    sleep: float = 60.0,
    concurrency: int | None = None,
    _sleeper: Callable[[float], None] = time.sleep,
) -> int:
    """Delete everything under ``prefix``: retry-wrapped bulk delete first,
    per-object concurrent fallback when bulk fails (parquet.go
    deleteS3PrefixStandard → deleteS3PrefixIndividually). Returns the number
    of objects removed."""
    keys = store.list(prefix)
    if not keys:
        return 0
    try:
        retry_with_skip(
            lambda: store.delete_batch(keys),
            max_retries, sleep, is_rate_limit_error, _sleeper,
        )
        return len(keys)
    except BaseException:
        # fall back to individual deletes — bounded concurrency (GCS allows
        # 5000 mutations/s per bucket; the reference uses 4·GOMAXPROCS)
        pass
    remaining = store.list(prefix)
    workers = min(concurrency or (os.cpu_count() or 4) * 4, max(len(remaining), 1))

    def delete_with_retry(key: str) -> None:
        retry_with_skip(
            lambda: store.delete_one(key),
            max_retries, sleep, is_rate_limit_error, _sleeper,
        )

    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(delete_with_retry, remaining))
    return len(keys)
