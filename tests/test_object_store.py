"""Object-store clear semantics: retry schedule, rate-limit gate, bulk →
per-object fallback (destination/parquet/parquet.go:541-690 parity)."""

from __future__ import annotations

import os

import pytest

from olake_spark.sinks.object_store import (
    LocalObjectStore,
    RateLimitError,
    clear_prefix,
    is_rate_limit_error,
    retry_with_skip,
)


def _mk_objects(root, prefix, n=5):
    d = os.path.join(root, prefix)
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        open(os.path.join(d, f"part-{i}.parquet"), "w").write("x")


def test_rate_limit_classification():
    assert is_rate_limit_error(RateLimitError(429))
    assert is_rate_limit_error(RateLimitError(503))
    assert not is_rate_limit_error(RateLimitError(500))
    assert not is_rate_limit_error(RuntimeError("boom"))
    # one layer of wrapping is peeled (the AWS BatchError shape)
    wrapped = RuntimeError("batch failed")
    wrapped.__cause__ = RateLimitError(503)
    assert is_rate_limit_error(wrapped)


def test_retry_linear_backoff_schedule():
    sleeps: list[float] = []
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] <= 3:
            raise RateLimitError(429)

    retry_with_skip(flaky, max_retries=3, sleep=60.0, _sleeper=sleeps.append)
    # linear backoff: (attempt+1)*sleep — utils.RetryWithSkip parity
    assert sleeps == [60.0, 120.0, 180.0]
    assert attempts["n"] == 4


def test_retry_gives_up_after_max():
    sleeps: list[float] = []
    with pytest.raises(RateLimitError):
        retry_with_skip(
            lambda: (_ for _ in ()).throw(RateLimitError(503)),
            max_retries=2, sleep=1.0, _sleeper=sleeps.append,
        )
    assert sleeps == [1.0, 2.0]  # no sleep after the final attempt


def test_non_retryable_raises_immediately():
    sleeps: list[float] = []
    calls = {"n": 0}

    def denied():
        calls["n"] += 1
        raise PermissionError("403")

    with pytest.raises(PermissionError):
        retry_with_skip(denied, max_retries=3, sleep=1.0, _sleeper=sleeps.append)
    assert calls["n"] == 1 and sleeps == []


def test_clear_prefix_bulk_path(tmp_path):
    store = LocalObjectStore(str(tmp_path))
    _mk_objects(tmp_path, "ns/table", 5)
    assert clear_prefix(store, "ns/table", _sleeper=lambda s: None) == 5
    assert store.list("ns/table") == []
    assert store.calls == [("delete_batch", "5 keys")]


def test_clear_prefix_fallback_to_individual(tmp_path):
    # GCS shape: bulk delete unsupported → list + per-object deletes
    store = LocalObjectStore(str(tmp_path), fail_batch=True)
    _mk_objects(tmp_path, "ns/table", 4)
    assert clear_prefix(store, "ns/table", _sleeper=lambda s: None) == 4
    assert store.list("ns/table") == []
    ops = [op for op, _ in store.calls]
    assert ops.count("delete_batch") == 1  # non-retryable failure: no re-try
    assert ops.count("delete_one") == 4


def test_clear_prefix_individual_deletes_retry_throttle(tmp_path):
    sleeps: list[float] = []
    store = LocalObjectStore(str(tmp_path), fail_batch=True, throttle_next=2)
    _mk_objects(tmp_path, "ns/t", 3)
    assert clear_prefix(
        store, "ns/t", sleep=60.0, concurrency=1, _sleeper=sleeps.append
    ) == 3
    assert store.list("ns/t") == []
    # both throttles hit the first key's retry loop: linear schedule 60, 120
    assert sleeps == [60.0, 120.0]


def test_clear_prefix_empty_is_noop(tmp_path):
    store = LocalObjectStore(str(tmp_path))
    assert clear_prefix(store, "nothing/here", _sleeper=lambda s: None) == 0
    assert store.calls == []
