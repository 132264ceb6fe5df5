"""E — window functions (SURVEY §2.2.E).

Window determinism discipline (C3): every ORDER BY carries a unique
tiebreaker key unless ties are semantically intended (q_win_rank exercises
genuine ties on p_size, where rank/dense_rank are deterministic functions of
the value). At scale, window partitions are per-key (user, segment, …) so the
shuffle is one hash exchange; no window here orders a whole table globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from twitter_event_stream_spark.exprs import rnd
from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import table


@query(
    "q_win_row_number",
    oracle="""
    SELECT o_orderstatus, o_orderkey, floor((o_totalprice) * 100 + 0.505) / 100 AS price, rn
    FROM (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t
    WHERE rn <= 10
    """,
)
def q_win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 — row_number with unique tiebreak; rank-filter ≤10 lets Spark plan
    a WindowGroupLimit (per-partition top-k before the full sort)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select(
            "o_orderstatus",
            "o_orderkey",
            rnd("o_totalprice", 2).alias("price"),
            "rn",
        )
    )


@query(
    "q_win_rank",
    oracle="""
    SELECT p_brand, p_partkey, p_size, rnk, drnk
    FROM (
      SELECT p_brand, p_partkey, p_size,
             rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS rnk,
             dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS drnk
      FROM part
    ) t
    WHERE rnk <= 3
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 — rank/dense_rank over genuine ties (p_size ∈ 1..50): the rank≤3
    row *set* is deterministic because all peers share a rank."""
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    return (
        p.withColumn("rnk", F.rank().over(w))
        .withColumn("drnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "p_size", "rnk", "drnk")
    )


@query(
    "q_win_dist",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ntile(4) OVER w AS quartile,
           floor((percent_rank() OVER w) * 1000000 + 0.505) / 1000000 AS pct_rank,
           floor((cume_dist() OVER w) * 1000000 + 0.505) / 1000000 AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def q_win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 — ntile / percent_rank / cume_dist (total order via custkey
    tiebreak — ntile depends on row order)."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        rnd(F.percent_rank().over(w), 6).alias("pct_rank"),
        rnd(F.cume_dist().over(w), 6).alias("cdist"),
    )


@query(
    "q_win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           floor((lag(value) OVER w) * 100 + 0.505) / 100 AS prev_value,
           floor((lead(value) OVER w) * 100 + 0.505) / 100 AS next_value,
           floor((value - lag(value) OVER w) * 100 + 0.505) / 100 AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 — lag/lead over per-user event sequences (nulls at edges)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        rnd(F.lag("value").over(w), 2).alias("prev_value"),
        rnd(F.lead("value").over(w), 2).alias("next_value"),
        rnd(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    )


@query(
    "q_win_rows_frame",
    oracle="""
    SELECT event_id, user_id,
           floor((sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) * 100 + 0.505) / 100 AS rolling_sum,
           floor((avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100 + 0.505) / 100 AS running_avg
    FROM events
    """,
)
def q_win_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 — ROWS frames: bounded rolling sum + running average."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        rnd(F.sum("value").over(w.rowsBetween(-3, 0)), 2).alias("rolling_sum"),
        rnd(
            F.avg("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_avg"),
    )


@query(
    "q_win_range_frame",
    oracle="""
    SELECT event_id, user_id,
           floor((sum(value) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                                  RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)) * 100 + 0.505) / 100
             AS sum_10min,
           count(*) OVER (PARTITION BY event_type ORDER BY value
                          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_near_value
    FROM events
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 — RANGE frames: INTERVAL-based (time) and numeric (value). RANGE
    frames include peers, so they are deterministic without tiebreakers."""
    table(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_id, user_id,
               floor((sum(value) OVER (PARTITION BY user_id ORDER BY ts
                                      RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)) * 100 + 0.505) / 100
                 AS sum_10min,
               count(*) OVER (PARTITION BY event_type ORDER BY value
                              RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_near_value
        FROM events
        """
    )


@query(
    "q_win_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER w AS last_type,
           floor((first_value(value) OVER w) * 100 + 0.505) / 100 AS first_value_r
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 — first_value/last_value with an explicit full frame (the default
    frame would make last_value = current row)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        rnd(F.first("value").over(w), 2).alias("first_value_r"),
    ).distinct()


@query(
    "q_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, floor((o_totalprice) * 100 + 0.505) / 100 AS price, rn
    FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM customer JOIN orders ON o_custkey = c_custkey
    ) t
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 — top-3 orders per customer (rank-filter). Spark ≥3.5 rewrites the
    filter into WindowGroupLimit: each partition keeps only 3 rows before
    the final window sort — the shape that survives 1000× more customers."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders")
    joined = c.join(o, c.c_custkey == o.o_custkey)
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_custkey",
            "o_orderkey",
            rnd("o_totalprice", 2).alias("price"),
            "rn",
        )
    )
