"""Concurrent-check helper for heavyweight Spark test modules.

A SparkSession schedules jobs from many driver threads safely, and most of
this suite's expensive tests are independent small jobs whose wall time is
scheduling latency, not CPU. Running a module's independent checks through
one ThreadPool cuts its wall 2-4x while keeping per-check failure identity
(each failure is reported with its check name + full traceback).

The pattern (first used by tests/test_plans.py, consolidated per the r5
verdict's suite-wall ask): convert `test_x` functions to `_check_x` and add
one `test_<module>_concurrent` that calls `run_concurrently`. Checks that
mutate session state (conf flips, temp views with fixed names) must stay
sequential — do not route them through here.
"""

from __future__ import annotations

import traceback
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor

__all__ = ["run_concurrently"]


def run_concurrently(
    checks: dict[str, Callable[[], None]], max_workers: int | None = None
) -> None:
    def run(item):
        name, fn = item
        try:
            fn()
            return None
        except Exception:
            return f"--- {name} ---\n{traceback.format_exc()}"

    workers = max_workers or min(8, len(checks)) or 1
    with ThreadPoolExecutor(max_workers=workers) as pool:
        failures = [f for f in pool.map(run, checks.items()) if f]
    assert not failures, "\n".join(failures)
