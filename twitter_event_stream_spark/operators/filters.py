"""B — projections, filters, predicates (SURVEY §2.2.B).

All predicates here are expressed declaratively so Catalyst pushes them into
the parquet scan (PushedFilters) — at 100 TB these queries read only the
row groups whose min/max statistics pass the predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_event_stream_spark.exprs import rnd
from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import table


@query(
    "q_project",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           floor((l_extendedprice * (1 - l_discount)) * 100 + 0.505) / 100 AS revenue,
           floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.505) / 100 AS charge,
           l_returnflag AS flag
    FROM lineitem
    """,
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 — projection, rename, computed columns."""
    li = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rnd(revenue, 2).alias("revenue"),
        rnd(revenue * (1 + F.col("l_tax")), 2).alias("charge"),
        F.col("l_returnflag").alias("flag"),
    )


@query(
    "q_filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, floor((l_quantity) * 100 + 0.505) / 100 AS qty,
           floor((l_extendedprice) * 100 + 0.505) / 100 AS price
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND NOT (l_linestatus = 'F')
      AND (l_discount < 0.03 OR l_tax > 0.06)
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 — AND/OR/NOT, BETWEEN, IN, comparisons (all pushed to the scan)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & ~(F.col("l_linestatus") == "F")
        & ((F.col("l_discount") < 0.03) | (F.col("l_tax") > 0.06))
    ).select(
        "l_orderkey",
        "l_linenumber",
        rnd("l_quantity", 2).alias("qty"),
        rnd("l_extendedprice", 2).alias("price"),
    )


@query(
    "q_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           o_orderstatus,
           count(*) AS n_orders,
           floor((sum(o_totalprice)) * 100 + 0.505) / 100 AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 — conditional projection feeding an aggregation."""
    orders = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket")
    )
    return (
        orders.groupBy(bucket, "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            rnd(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "q_filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE '%ge%'
       OR regexp_matches(p_type, '^(PRO|ECO)')
    """,
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 — LIKE and regexp predicates."""
    part = table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_name").like("%ge%") | F.col("p_type").rlike("^(PRO|ECO)")
    ).select("p_partkey", "p_name", "p_brand")
