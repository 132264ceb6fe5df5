"""Query/oracle registry — the spine of the driver contract.

Every operator module registers its queries here with the :func:`query`
decorator. ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views
over this registry, and the differential test harness parametrizes over it.

Contract classes (SURVEY §2.0 C5):
- HASH — registered with ``oracle=...``: the driver hash-compares the Spark
  result against the DuckDB result of the oracle SQL.
- ROWS — registered with ``oracle=None``: driver records a rows-only check
  (approx sketches, RNG sampling, LSH — engine-specific by nature).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for ROWS-contract queries
    doc: str = ""


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as contract query ``name`` with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_operator_modules()
    return {name: entry.fn for name, entry in sorted(_REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    _load_operator_modules()
    return {
        name: entry.oracle
        for name, entry in sorted(_REGISTRY.items())
        if entry.oracle is not None
    }


def get(name: str) -> RegisteredQuery:
    _load_operator_modules()
    return _REGISTRY[name]


_loaded = False


def _load_operator_modules() -> None:
    """Import every operator module exactly once (they self-register)."""
    global _loaded
    if _loaded:
        return
    # Import inside the function to avoid circular imports at package init.
    from twitter_event_stream_spark.operators import (  # noqa: F401
        aggregates,
        corpus_full,
        corpus_stats,
        curation_extra,
        eventflow,
        filters,
        graph,
        functions_extra,
        functions_scalar,
        joins,
        llm,
        llm_extra,
        multimodal,
        pipeline_extra,
        sampling,
        scale_ops,
        scans,
        sets,
        sorts,
        timeseries,
        udfs,
        windowed,
        windows,
    )

    _loaded = True
