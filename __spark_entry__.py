"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

This file is a thin façade over ``twitter_event_stream_spark.registry``;
every operator module self-registers its queries + oracle SQL there
(SURVEY.md §2.2 is the inventory).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from twitter_event_stream_spark import registry
from twitter_event_stream_spark.tables import load_tables

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: end-to-end corpus curation (SURVEY §2.3
    X20) — deterministic MinHash near-dup detection → connected-component
    clustering → canonical-doc selection → quality gate → per-language
    rollup. Exercises scans, HOF shingling, banded self-join, iterative
    graph clustering, window dedup, and aggregation in one hash-verified
    pipeline."""
    load_tables(spark, SMOKE_SF_DIR)
    return registry.get("q_corpus_curation").fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every HASH-contract query."""
    return registry.all_oracles()
