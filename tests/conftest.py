from __future__ import annotations

import os

import pytest

SF_SMOKE = os.environ.get("OLAKE_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from olake_spark.session import get_spark

    s = get_spark(app_name="olake_spark_tests", extra_conf={"spark.ui.enabled": "false"})
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
