"""C — joins (SURVEY §2.2.C).

Strategy discipline for 100 TB (SURVEY §4.2):
- dimension tables (region/nation/supplier/part at fixture scale) are joined
  with an explicit ``broadcast()`` hint — no shuffle of the fact side;
- fact-fact joins (orders ⋈ lineitem) rely on sort-merge with AQE skew
  splitting; both sides shuffle-partition on the join key, which is the plan
  that scales horizontally;
- the interval/as-of self-joins pre-filter both sides *before* the join so
  the shuffled data is the minimal subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_event_stream_spark.exprs import rnd
from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import load_tables, table


@query(
    "q_join_broadcast",
    oracle="""
    SELECT r_name, n_name,
           count(*) AS n_customers,
           floor((sum(c_acctbal)) * 100 + 0.505) / 100 AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 — star join over two broadcast dims: the customer side never
    shuffles for the join (only for the final agg)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            rnd(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@query(
    "q_join_sortmerge",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.505) / 100 AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def q_join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 — fact-fact equi-join, forced sort-merge: both sides hash-partition
    on the order key; this is the strategy that survives arbitrarily large
    inputs (no build side has to fit in memory)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    return (
        o.hint("MERGE")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            rnd(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@query(
    "q_join_shuffledhash",
    oracle="""
    SELECT p_brand,
           count(*) AS n_items,
           floor((sum(l_quantity)) * 100 + 0.505) / 100 AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_join_shuffledhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 — shuffled hash join (no sort; build side = part, per-partition
    hash tables). Picked explicitly via hint to exercise the strategy."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        li.join(p.hint("SHUFFLE_HASH"), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@query(
    "q_join_left",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           floor((s.max_qty) * 100 + 0.505) / 100 AS max_big_qty
    FROM orders o
    LEFT JOIN (
      SELECT l_orderkey, max(l_quantity) AS max_qty
      FROM lineitem WHERE l_quantity > 45 GROUP BY l_orderkey
    ) s ON o.o_orderkey = s.l_orderkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 — left outer join; nulls manufactured (C8) by the selective
    subquery (orders with no >45-quantity item get NULL)."""
    o = table(spark, sf_dir, "orders")
    s = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .groupBy("l_orderkey")
        .agg(F.max("l_quantity").alias("max_qty"))
    )
    return o.join(s, o.o_orderkey == s.l_orderkey, "left").select(
        "o_orderkey",
        "o_orderstatus",
        rnd("max_qty", 2).alias("max_big_qty"),
    )


@query(
    "q_join_full",
    oracle="""
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           c.n_clicks, p.n_purchases
    FROM (
      SELECT user_id, count(*) AS n_clicks FROM events
      WHERE event_type = 'click' AND value > 200 GROUP BY user_id
    ) c
    FULL JOIN (
      SELECT user_id, count(*) AS n_purchases FROM events
      WHERE event_type = 'purchase' AND value > 250 GROUP BY user_id
    ) p ON c.user_id = p.user_id
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 — full outer join of two asymmetric per-user aggregates; nulls on
    both sides by construction."""
    ev = table(spark, sf_dir, "events")
    clicks = (
        ev.filter((F.col("event_type") == "click") & (F.col("value") > 200))
        .groupBy(F.col("user_id").alias("c_user"))
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    purchases = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 250))
        .groupBy(F.col("user_id").alias("p_user"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    joined = clicks.join(purchases, clicks.c_user == purchases.p_user, "full")
    return joined.select(
        F.coalesce("c_user", "p_user").alias("user_id"),
        "n_clicks",
        "n_purchases",
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderstatus = 'P' AND o_totalprice > 150000
    )
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 — left semi join (EXISTS): emits each qualifying customer once."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "P") & (F.col("o_totalprice") > 150000)
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_nationkey
    FROM customer
    WHERE c_custkey NOT IN (
      SELECT o_custkey FROM orders
      WHERE o_totalprice > 250000
    )
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 — left anti join (NOT IN; fixture keys are null-free so anti ≡
    null-aware anti here — null behavior is covered by tests)."""
    c = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_nationkey"
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r_name, seg.c_mktsegment AS segment
    FROM region
    CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 — cross join (tiny × tiny by design; unbounded cross joins are a
    scale bug, so the engine only exposes it for enumerations)."""
    r = table(spark, sf_dir, "region").select("r_name")
    segs = table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment")
    ).distinct()
    return r.crossJoin(segs)


@query(
    "q_join_theta",
    oracle="""
    SELECT p_brand,
           count(*) AS n_items,
           floor((sum(l_extendedprice)) * 100 + 0.505) / 100 AS sum_price
    FROM lineitem JOIN part
      ON l_partkey = p_partkey AND l_quantity > p_size
    GROUP BY p_brand
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 — equi-join with a theta residual: Spark keeps the hash join on the
    equi key and applies the inequality as a post-join filter (the residual
    never degrades to a nested-loop because of the equi component)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(p),
            (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            rnd(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_join_interval",
    oracle="""
    SELECT a.event_id AS click_id,
           b.event_id AS purchase_id,
           a.user_id AS user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    """,
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 — interval (time-bounded) self-join: click → purchase within
    5 minutes, same user. Equi on user_id carries the join; the time bounds
    are a residual, so this scales as a hash/merge join, not a range scan."""
    ev = table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").alias("a")
    b = ev.filter(F.col("event_type") == "purchase").alias("b")
    return a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES")),
    ).select(
        F.col("a.event_id").alias("click_id"),
        F.col("b.event_id").alias("purchase_id"),
        F.col("a.user_id").alias("user_id"),
    )


@query(
    "q_join_asof",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id AS user_id,
           CAST(max(c.ts) AS TIMESTAMP) AS last_click_ts,
           count(*) AS n_prior_clicks
    FROM events p JOIN events c
      ON c.user_id = p.user_id AND c.ts <= p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    GROUP BY p.event_id, p.user_id
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11 — as-of join: for each purchase, the latest prior click (per
    user). Implemented portably as equi-join on user + time residual +
    max()/count() — deterministic without tie assumptions. A streaming
    variant would be a watermark-bounded stream-stream join (I7)."""
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    return (
        p.join(
            c,
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("c.ts") <= F.col("p.ts")),
        )
        .groupBy(
            F.col("p.event_id").alias("purchase_id"),
            F.col("p.user_id").alias("user_id"),
        )
        .agg(
            F.max("c.ts").alias("last_click_ts"),
            F.count(F.lit(1)).alias("n_prior_clicks"),
        )
    )


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey,
           floor((o_totalprice) * 100 + 0.505) / 100 AS price
    FROM orders o
    WHERE o_totalprice > (
      SELECT 1.25 * avg(i.o_totalprice) FROM orders i
      WHERE i.o_custkey = o.o_custkey
    )
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-extra — correlated scalar subquery: orders priced >1.25× their own
    customer's average. Catalyst decorrelates this
    (RewriteCorrelatedScalarSubquery) into an aggregate-then-join on
    o_custkey — a two-phase agg plus one equi-join, not a per-row probe, so
    it scales like C1/D1 rather than O(n²)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey,
               floor((o_totalprice) * 100 + 0.505) / 100 AS price
        FROM orders o
        WHERE o_totalprice > (
          SELECT 1.25 * avg(i.o_totalprice) FROM orders i
          WHERE i.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "q_lateral_join",
    oracle="""
    SELECT c.c_custkey, t.top_price, t.top_key
    FROM customer c,
    LATERAL (
      SELECT o.o_totalprice AS top_price, o.o_orderkey AS top_key
      FROM orders o WHERE o.o_custkey = c.c_custkey
      ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2
    ) t
    """,
)
def q_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-extra — LATERAL correlated subquery join (top-2 orders per
    customer), identical SQL in both engines. Catalyst decorrelates the
    per-row LIMIT into a rank-filtered window join (DecorrelateInnerQuery +
    WindowGroupLimit) — one partitioned window pass, not a per-customer
    probe, so it scales like E8 top-k-per-group. Unique tiebreaker on
    o_orderkey keeps the row set deterministic (C3)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.top_price, t.top_key
        FROM customer c,
        LATERAL (
          SELECT o.o_totalprice AS top_price, o.o_orderkey AS top_key
          FROM orders o WHERE o.o_custkey = c.c_custkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2
        ) t
        """
    )
