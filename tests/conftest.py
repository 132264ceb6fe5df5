"""Shared fixtures: one SparkSession + one DuckDB oracle per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitter_event_stream_spark.parity import oracle_connection  # noqa: E402
from twitter_event_stream_spark.session import get_spark  # noqa: E402

#: Unit CI runs the differential suite at sf0.001 (SURVEY §5.2.1); override
#: with TES_TEST_SF_DIR to re-verify at sf0.01 before handoff.
SF_DIR = os.environ.get("TES_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tes-tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle(sf_dir):
    con = oracle_connection(sf_dir)
    yield con
    con.close()
