"""Fixture table loader + temp-view registrar (SURVEY §2.0 C1, FIXTURES.md).

Every query callable goes through :func:`load_tables`, which

1. re-applies the runtime session conventions (UTC, nanosAsLong, AQE);
2. reads each parquet table of the scale-factor directory — the current
   fixtures store every timestamp as µs NTZ (isAdjustedToUTC=false), which
   Spark reads natively as ``TIMESTAMP_NTZ`` (SURVEY §1.3(1));
3. keeps a guarded ns fallback: if a regenerated ``events.ts`` arrives as
   INT64 nanoseconds (read as ``bigint`` under nanosAsLong), it is
   normalized to µs with integer division (``ts DIV 1000``) so no
   double-rounding can perturb the value — a no-op against current data;
4. registers each table as a temp view under its canonical name.

DataFrames are lazy, so loading is cheap; a small per-(session, dir) cache
avoids re-reading parquet footers and re-registering views on every call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_event_stream_spark.session import configure_session

TABLE_NAMES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to always broadcast in joins (SURVEY §4.2:
#: dims ≤20k rows). ``part`` qualifies at every shipped sf; at true 100 TB
#: scale ``part``/``customer`` would grow out of this set and the engine's
#: joins fall back to shuffled strategies via AQE size estimates.
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})

_cache: dict[tuple[int, str], dict[str, DataFrame]] = {}

#: Which sf_dir's tables are currently bound to the session's temp views.
#: Views are session-global state, so a cache hit for a *different* dir than
#: the last registration must re-register — otherwise ``spark.sql`` queries
#: silently read the previous scale factor.
_active_views: dict[int, str] = {}


def _normalize_events(df: DataFrame) -> DataFrame:
    """INT64 ns → TimestampType µs, losslessly (data is µs-precision).

    Dormant against current fixtures (µs NTZ → the ``bigint`` guard never
    fires); kept for a ns-typed testdata regeneration. ``ts DIV 1000``
    stays in integer arithmetic; a double division here could round (ulp
    at 1.7e18 is 256 ns).
    """
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all fixture tables of ``sf_dir``; register canonical temp views."""
    configure_session(spark)
    sf = sf_dir.rstrip("/")
    key = (id(spark), sf)
    dfs = _cache.get(key)
    if dfs is None:
        dfs = {}
        for name in TABLE_NAMES:
            df = spark.read.parquet(f"{sf}/{name}.parquet")
            if name == "events":
                df = _normalize_events(df)
            dfs[name] = df
        _cache[key] = dfs
    if _active_views.get(id(spark)) != sf:
        for name, df in dfs.items():
            df.createOrReplaceTempView(name)
        _active_views[id(spark)] = sf
    return dfs


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Single-table accessor used by the operator modules."""
    return load_tables(spark, sf_dir)[name]
