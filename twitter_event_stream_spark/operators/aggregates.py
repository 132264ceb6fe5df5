"""D — aggregations (SURVEY §2.2.D).

Every groupBy here compiles to Spark's two-phase HashAggregateExec
(partial map-side combine → shuffle on the group keys → final), so at 100 TB
the shuffle carries only one partial row per (partition × key), not the raw
data. Group-key cardinalities in this family are tiny (flags, types, users),
so skew is not a concern; high-cardinality rollups (e.g. per-document) live
in the K family where the text notes discuss salting.

Float outputs are rounded identically on both sides (C2) so parallel
summation ulp drift cannot break the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_event_stream_spark.exprs import rnd
from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import table


@query(
    "q_agg_basic",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           floor((sum(l_quantity)) * 100 + 0.505) / 100 AS sum_qty,
           floor((sum(l_extendedprice)) * 100 + 0.505) / 100 AS sum_base_price,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.505) / 100 AS sum_disc_price,
           floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100 + 0.505) / 100 AS sum_charge,
           floor((avg(l_quantity)) * 100 + 0.505) / 100 AS avg_qty,
           floor((avg(l_extendedprice)) * 100 + 0.505) / 100 AS avg_price,
           floor((avg(l_discount)) * 10000 + 0.505) / 10000 AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 (flagship) — TPC-H-Q1-shape hash aggregation: sum/avg/count over
    computed expressions, grouped by two low-cardinality flags."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            rnd(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            rnd(F.sum(disc_price), 2).alias("sum_disc_price"),
            rnd(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            rnd(F.avg("l_quantity"), 2).alias("avg_qty"),
            rnd(F.avg("l_extendedprice"), 2).alias("avg_price"),
            rnd(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_agg_count_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events,
           floor((sum(value)) * 100 + 0.505) / 100 AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 — exact distinct aggregation (expand + two-phase agg in Spark)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        rnd(F.sum("value"), 2).alias("sum_value"),
    )


@query("q_agg_approx_distinct", oracle=None)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 (ROWS) — HyperLogLog++ distinct; sketch differs from DuckDB's, so
    rows-only. The engine's own test asserts the estimate is within 5% of
    the exact count."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           floor((sum(o_totalprice)) * 100 + 0.505) / 100 AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 — ROLLUP: hierarchical subtotals incl. grand total (null keys)."""
    orders = table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        rnd(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           floor((sum(l_quantity)) * 100 + 0.505) / 100 AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 — CUBE: all grouping-key subsets."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT event_type,
           date_trunc('week', CAST(ts AS TIMESTAMP))::TIMESTAMP AS week_ts,
           count(*) AS n_events,
           floor((sum(value)) * 100 + 0.505) / 100 AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (date_trunc('week', CAST(ts AS TIMESTAMP))::TIMESTAMP), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 — GROUPING SETS over (type), (week), (); the week bucket is cast to
    TIMESTAMP in the oracle because DuckDB's week-trunc returns DATE
    (SURVEY §1.3(3))."""
    table(spark, sf_dir, "events")  # registers the `events` view
    return spark.sql(
        """
        SELECT event_type,
               date_trunc('week', ts) AS week_ts,
               count(*) AS n_events,
               floor((sum(value)) * 100 + 0.505) / 100 AS sum_value
        FROM events
        GROUP BY GROUPING SETS ((event_type), (date_trunc('week', ts)), ())
        """
    )


@query(
    "q_agg_filtered",
    oracle="""
    SELECT event_type,
           count(*) FILTER (WHERE value > 100) AS n_big,
           count(*) FILTER (WHERE user_id % 2 = 0) AS n_even_user,
           floor((sum(value) FILTER (WHERE value > 100)) * 100 + 0.505) / 100 AS sum_big,
           count(*) AS n_all
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 — filtered aggregation (count_if / FILTER clause)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 100).alias("n_big"),
        F.count_if(F.col("user_id") % 2 == 0).alias("n_even_user"),
        rnd(F.sum(F.when(F.col("value") > 100, F.col("value"))), 2).alias("sum_big"),
        F.count(F.lit(1)).alias("n_all"),
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT event_type,
           floor((stddev_samp(value)) * 1000000 + 0.505) / 1000000 AS sd_value,
           floor((var_samp(value)) * 1000000 + 0.505) / 1000000 AS var_value,
           floor((corr(value, user_id)) * 1000000 + 0.505) / 1000000 AS corr_vu,
           floor((covar_samp(value, user_id)) * 1000000 + 0.505) / 1000000 AS covar_vu
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 — statistical aggregates, rounded to 6dp (C2)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        rnd(F.stddev_samp("value"), 6).alias("sd_value"),
        rnd(F.var_samp("value"), 6).alias("var_value"),
        rnd(F.corr("value", "user_id"), 6).alias("corr_vu"),
        rnd(F.covar_samp("value", "user_id"), 6).alias("covar_vu"),
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT event_type,
           floor((quantile_cont(value, 0.5)) * 1000000 + 0.505) / 1000000 AS p50,
           floor((quantile_cont(value, 0.9)) * 1000000 + 0.505) / 1000000 AS p90,
           floor((quantile_cont(value, 0.99)) * 1000000 + 0.505) / 1000000 AS p99
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9 — exact interpolating percentile (Spark `percentile` ↔ DuckDB
    `quantile_cont`, parity-verified SURVEY App. A)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        rnd(F.percentile("value", 0.5), 6).alias("p50"),
        rnd(F.percentile("value", 0.9), 6).alias("p90"),
        rnd(F.percentile("value", 0.99), 6).alias("p99"),
    )


@query("q_agg_approx_percentile", oracle=None)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D10 (ROWS) — approximate percentile (GK sketch; differs from DuckDB's
    t-digest, so rows-only; engine test bounds the error vs exact)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_percentile("value", 0.5).alias("ap50"),
        F.approx_percentile("value", 0.9).alias("ap90"),
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT user_id,
           coalesce(array_to_string(list_sort(list(DISTINCT event_type)), '|'), '') AS types,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D11 — collect_set sorted on output (C4) so the list is deterministic
    regardless of partition arrival order. The list is serialized with
    concat_ws on output because the driver's pandas canonicalizer cannot
    hash ndarray cells; collect_set/sort_array are still the operators
    under test."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws("|", F.sort_array(F.collect_set("event_type"))).alias("types"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q_agg_argmax",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t
    WHERE rn = 1
    """,
)
def q_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D12 — max_by with a composite (ts, event_id) ordering key so ties are
    deterministic; the oracle states the same semantics via row_number."""
    ev = table(spark, sf_dir, "events")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.max_by("event_id", order_key).alias("last_event_id"),
        F.max_by("event_type", order_key).alias("last_event_type"),
    )


@query(
    "q_pivot",
    oracle="""
    SELECT o_orderpriority,
           floor((coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0)) * 100 + 0.505) / 100 AS total_f,
           floor((coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 0)) * 100 + 0.505) / 100 AS total_o,
           floor((coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 0)) * 100 + 0.505) / 100 AS total_p,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-extra — pivot (cross-tab): order value by priority × status. The
    pivot value list is pinned ('F','O','P' — the full o_orderstatus domain)
    so Spark skips the extra distinct-values job and the plan is a single
    two-phase hash agg, exactly the conditional-aggregation shape the oracle
    states. Scales as D1: shuffle carries one partial row per (partition ×
    priority)."""
    o = table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.sum("o_totalprice").alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return piv.select(
        "o_orderpriority",
        rnd(F.coalesce(F.col("F_total"), F.lit(0.0)), 2).alias("total_f"),
        rnd(F.coalesce(F.col("O_total"), F.lit(0.0)), 2).alias("total_o"),
        rnd(F.coalesce(F.col("P_total"), F.lit(0.0)), 2).alias("total_p"),
        (
            F.coalesce(F.col("F_n"), F.lit(0))
            + F.coalesce(F.col("O_n"), F.lit(0))
            + F.coalesce(F.col("P_n"), F.lit(0))
        ).alias("n_orders"),
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT metric,
           floor((sum(val)) * 100 + 0.505) / 100 AS total,
           floor((avg(val)) * 1000000 + 0.505) / 1000000 AS mean,
           count(*) AS n
    FROM (
      SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
      UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    ) t
    GROUP BY metric
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-extra — unpivot/melt (long-form reshape): four measure columns of
    lineitem become (metric, val) rows, then a tiny 4-group agg. Spark's
    native ``DataFrame.unpivot`` is a zero-shuffle Expand (each input row
    emits 4 rows map-side); only the 4-row partial aggregate shuffles, so
    the reshape itself never materializes at 100 TB."""
    li = table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )
    return long.groupBy("metric").agg(
        rnd(F.sum("val"), 2).alias("total"),
        rnd(F.avg("val"), 6).alias("mean"),
        F.count(F.lit(1)).alias("n"),
    )


@query("q_freq_items", oracle=None)
def q_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-extra (ROWS) — approximate frequent items (Karp-Papadimitriou-
    Shanker one-pass heavy hitters, built into DataFrame.freqItems): event
    types with frequency above 10%. Single pass, bounded memory per
    partition + merge — the 100 TB shape for 'what dominates this column'.
    Approximate membership (may include false positives) ⇒ ROWS contract,
    like the other sketches (D3/D10)."""
    ev = table(spark, sf_dir, "events")
    freq = ev.freqItems(["event_type"], support=0.1)
    return freq.select(
        F.explode(F.sort_array(F.col("event_type_freqItems"))).alias("frequent_event_type")
    )


@query(
    "q_histogram",
    oracle="""
    WITH b AS (
      SELECT least(CAST(floor((o_totalprice - mn) / (mx - mn + 1e-9) * 20) AS BIGINT), 19) AS bucket
      FROM orders, (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders)
    )
    SELECT bucket, count(*) AS n
    FROM b
    GROUP BY bucket
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-extra — equi-width histogram (20 bins over o_totalprice). The
    min/max pass is a 1-row broadcast scalar; bucketing is identical float
    arithmetic on both engines (no width_bucket — DuckDB lacks it); the
    count is a 20-group two-phase agg. At 100 TB this is two scans + a
    tiny shuffle — the profiling primitive for data exploration."""
    o = table(spark, sf_dir, "orders")
    mm = o.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    bucket = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("mn"))
            / (F.col("mx") - F.col("mn") + F.lit(1e-9))
            * 20
        ),
        F.lit(19).cast("long"),
    )
    return (
        o.crossJoin(F.broadcast(mm))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
