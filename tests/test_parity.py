"""Differential oracle tests — every HASH-contract query vs DuckDB.

This mirrors the driver's t2 gate (row count + schema + order-insensitive
value hash), so a green run here predicts a green CORRECTNESS record.
"""

from __future__ import annotations

import pytest

from twitter_event_stream_spark import registry
from twitter_event_stream_spark.parity import check_query

HASH_QUERIES = sorted(registry.all_oracles())
ROWS_QUERIES = sorted(set(registry.all_queries()) - set(registry.all_oracles()))


@pytest.mark.parametrize("name", HASH_QUERIES)
def test_hash_parity(spark, oracle, sf_dir, name):
    result = check_query(spark, registry.get(name), sf_dir, oracle)
    assert result.ok, result.report()
    assert result.spark_rows > 0, f"{name}: empty result defeats the check"


@pytest.mark.parametrize("name", ROWS_QUERIES)
def test_rows_queries_run(spark, sf_dir, name):
    df = registry.get(name).fn(spark, sf_dir)
    assert df.count() >= 0
