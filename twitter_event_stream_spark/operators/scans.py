"""A — scans, sources, sinks (SURVEY §2.2.A).

Batch parquet scan fingerprint (A1, HASH), NDJSON roundtrip scan (A9, ROWS).
Streaming sources/sinks (A3-A8) live in ``streaming/`` and are exercised by
tests (INFRA contract).

Scale notes: the scan queries are pure scan+agg — Catalyst pushes the
aggregates partial/final and prunes columns, so at 100 TB the parquet reader
only materializes the referenced columns (verified by plan-shape tests:
ReadSchema shows the pruned column set).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_event_stream_spark.exprs import rnd
from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import table


@query(
    "q_scan_parquet",
    oracle="""
    SELECT count(*) AS n_rows,
           min(l_orderkey) AS min_orderkey,
           max(l_orderkey) AS max_orderkey,
           floor((sum(l_extendedprice)) * 100 + 0.505) / 100 AS sum_price,
           floor((min(l_discount)) * 100 + 0.505) / 100 AS min_discount,
           floor((max(l_tax)) * 100 + 0.505) / 100 AS max_tax
    FROM lineitem
    """,
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — parquet batch scan with a count/min/max fingerprint.

    Column pruning: only 5 of 11 lineitem columns appear in ReadSchema.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_orderkey").alias("min_orderkey"),
        F.max("l_orderkey").alias("max_orderkey"),
        rnd(F.sum("l_extendedprice"), 2).alias("sum_price"),
        rnd(F.min("l_discount"), 2).alias("min_discount"),
        rnd(F.max("l_tax"), 2).alias("max_tax"),
    )


@query("q_scan_json", oracle=None)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 (ROWS) — NDJSON roundtrip: events → JSON lines on disk → schema'd read.

    Exercises the JSON source with an explicit schema (never inferSchema in
    the engine proper, SURVEY §1.2). ROWS contract: the driver checks row
    count only; values are checked by the engine's own roundtrip test.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"tes_spark_json_{abs(hash(sf_dir)) % (1 << 32)}",
    )
    ev.write.mode("overwrite").json(out)
    schema = "event_id long, user_id long, event_type string, value double, props string"
    back = spark.read.schema(schema).json(out)
    return back.select(
        "event_id",
        "user_id",
        "event_type",
        rnd("value", 2).alias("value_r"),
    )


@query("q_scan_csv", oracle=None)
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extra (ROWS) — CSV roundtrip: events → CSV with header → schema'd
    read (explicit schema + header, never inferSchema). Same posture as A9:
    the driver checks rows; the engine's own roundtrip test checks values."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"tes_spark_csv_{abs(hash(sf_dir)) % (1 << 32)}",
    )
    ev.write.mode("overwrite").option("header", True).csv(out)
    schema = "event_id long, user_id long, event_type string, value double"
    back = spark.read.schema(schema).option("header", True).csv(out)
    return back.select(
        "event_id", "user_id", "event_type", rnd("value", 2).alias("value_r")
    )
