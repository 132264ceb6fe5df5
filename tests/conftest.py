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


def pytest_collection_modifyitems(config, items):
    """Fast-gate/deep-lane split, conftest-based (r15, r14 ADVICE #2: the
    previous ``addopts = -m "not deep"`` applied to EVERY invocation, so
    naming a deep test by node id silently deselected it and exited 'no
    tests ran' — an easy way to believe a deep test passed when it never
    executed). Semantics:

    - plain runs (``pytest tests/ -q``) deselect the ``deep``-marked
      suites — the fast gate, unchanged;
    - any ``-m`` flag takes full manual control (``-m deep`` runs the
      deep lane, ``-m ""`` runs EVERYTHING — the flag's presence is
      detected from the invocation args, because an empty markexpr is
      indistinguishable from no ``-m`` through ``config.option``);
    - any EXPLICIT node id among the POSITIONAL args (``::`` in
      ``config.args`` — option values like ``-W error::Warning`` or
      ``--deselect path::test`` never land there) disables the default
      deselection entirely — a test you name always runs, deep or not."""
    argv = [str(a) for a in config.invocation_params.args]
    m_given = config.option.markexpr or any(
        a == "-m" or a.startswith("-m=") or a == "--markexpr"
        or a.startswith("--markexpr=")
        or (a.startswith("-m") and not a.startswith("--") and len(a) > 2)
        for a in argv
    )
    if m_given:
        return  # -m given (even empty): pytest's marker selection governs
    if any("::" in a for a in config.args):
        return  # explicitly named node ids always run
    deselected = [
        item for item in items if item.get_closest_marker("deep")
    ]
    if deselected:
        kept = [i for i in items if not i.get_closest_marker("deep")]
        items[:] = kept
        config.hook.pytest_deselected(items=deselected)


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
