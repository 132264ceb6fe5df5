"""F — sorts, limits, top-k, sampling (SURVEY §2.2.F).

Global top-k compiles to TakeOrderedAndProject: each partition keeps k rows,
the driver merges N×k — no global sort ever materializes, which is the only
acceptable plan at 100 TB. Full global sorts are exercised via
sortWithinPartitions in tests (F2, INFRA) since an order-insensitive hash
cannot observe row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_event_stream_spark.exprs import rnd
from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import table


@query(
    "q_sort_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, floor((l_extendedprice) * 100 + 0.505) / 100 AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — global top-100 with a unique (orderkey, linenumber) tiebreak so
    the selected row set is deterministic."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(100)
        .select(
            "l_orderkey",
            "l_linenumber",
            rnd("l_extendedprice", 2).alias("price"),
        )
    )


@query("q_sample", oracle=None)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 (ROWS) — seeded Bernoulli sample; RNG streams differ per engine so
    the contract is rows-only (engine test bounds the sampled fraction)."""
    ev = table(spark, sf_dir, "events")
    return ev.sample(fraction=0.1, seed=42).select("event_id", "user_id", "event_type")
