"""Shared fixtures: one session-scoped local SparkSession (test profile:
AQE off, shuffle=4 — mirrors the reference's pytest convention,
reference tests/pytest_ini.txt:36-39) and the sf0.001 data dir."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from breweries_case_spark.session import get_test_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_test_session()
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
