"""Certify the registry TAIL — the queries past the external driver's
50-entry verification window — with the same driver-mirror gate the first
50 get externally (bare session, exact value hash vs DuckDB).

With this in the suite, ``pytest tests/`` alone certifies every registry
entry: the driver covers the window, this test covers the rest. It runs the
gate in a subprocess because the mirror intentionally builds its own
vanilla SparkSession (no engine confs), which must not contaminate (or be
contaminated by) the shared test session.
"""

import subprocess
import sys

REPO = "/root/repo"
SF_DIR = "/root/testdata/sf0.01"


def test_registry_tail_passes_driver_mirror_gate():
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry
    from olake_spark.queries import DRIVER_WINDOW_SIZE

    names = list(entry.queries())
    tail = names[DRIVER_WINDOW_SIZE:]
    assert tail, "registry fits the driver window; nothing to certify"
    proc = subprocess.run(
        [
            sys.executable,
            f"{REPO}/tools/check_correctness.py",
            "--vanilla",
            "--exact",
            SF_DIR,
            *tail,
        ],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, f"registry tail gate failed:\n{out[-4000:]}"
    # every tail query must actually have been exercised (a typo'd name
    # would silently verify nothing)
    checked = out.count("PASS ") + out.count("FAIL ")
    assert checked == len(tail), f"expected {len(tail)} checks, saw {checked}:\n{out[-2000:]}"
