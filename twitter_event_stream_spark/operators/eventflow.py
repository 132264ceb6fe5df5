"""Event-flow analytics operators (SURVEY §2.3 extensions, X72–X74):
interval merging, Markov transition matrices, and SCD2 validity intervals.

These are the event-stream analytics a userstream-style service grows into
once events persist: collapsing bursts of activity into coverage intervals,
summarizing behavioral flow as a first-order Markov chain, and turning a
change log into warehouse-style effective-dated state. The common scale
thread: everything is gaps-and-islands machinery — window functions over one
(user_id)-partitioned exchange+sort that later stages reuse, never a
self-join or driver-side pass. Reference checkout is empty (SURVEY §0.1);
these extend the §2.3 surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from twitter_event_stream_spark.exprs import R, rnd
from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import table


@query(
    "q_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id, ts AS s, ts + INTERVAL 6 HOUR AS e
      FROM events
    ), w AS (
      SELECT user_id, event_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_e
      FROM iv
    ), f AS (
      SELECT *, CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                     THEN 1 ELSE 0 END AS new_island
      FROM w
    ), g AS (
      SELECT *, CAST(sum(new_island) OVER (
                  PARTITION BY user_id ORDER BY s, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS island_id
      FROM f
    )
    SELECT user_id, island_id, min(s) AS start_ts, max(e) AS end_ts,
           count(*) AS n_events
    FROM g GROUP BY user_id, island_id
    """,
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X72 — merge overlapping intervals (union of time coverage): each
    event opens a 6-hour activity interval; intervals per user that
    overlap (or touch via containment) collapse into one merged span. The
    classic sweep: running ``max(end)`` over preceding rows flags the start
    of each new island, a running sum numbers the islands, one aggregate
    merges them. Both windows and the final groupBy share a single
    (user_id)-hash exchange + (s, event_id) sort — Spark plans one shuffle
    total, and per-user data never has to fit anywhere but its own
    partition, so the shape is flat at any scale. Strictly harder than
    sessionization (X48): containment, not just gap-threshold, decides
    merging — an interval can swallow several later ones."""
    ev = table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("e"),
    )
    order = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_e = F.max("e").over(order.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1)
        .otherwise(0)
        .cast("long"),
    )
    island = F.sum("new_island").over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.withColumn("island_id", island)
        .groupBy("user_id", "island_id")
        .agg(
            F.min("s").alias("start_ts"),
            F.max("e").alias("end_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "q_markov_transitions",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ), t AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM s WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           {R('n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE)', 6)}
             AS p_transition
    FROM t
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X73 — first-order Markov transition matrix over event types: for
    every (prev → next) pair within a user's event-time-ordered stream, the
    transition count and the row-normalized probability — the behavioral
    flow summary behind funnel mining and next-event prediction features.
    One lag window over the (user_id) exchange, a partial-agg groupBy to the
    (5×5)-bounded transition table, then row normalization via a window over
    that tiny table — the normalizing sums never touch the fact rows. At
    100 TB the only full-data work is the lag's user-partitioned sort, which
    sessionization/SCD2 pipelines already pay for."""
    ev = table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lag("event_type").over(order).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    t = s.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = F.sum("n").over(Window.partitionBy("prev_type"))
    return t.select(
        "prev_type",
        "next_type",
        "n",
        rnd(F.col("n") / tot.cast("double"), 6).alias("p_transition"),
    )


@query(
    "q_scd2_intervals",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events WHERE user_id < 40
    ), c AS (
      SELECT *, CASE WHEN prev_type IS NULL OR prev_type <> event_type
                     THEN 1 ELSE 0 END AS chg
      FROM s
    ), g AS (
      SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS version
      FROM c
    ), iv AS (
      SELECT user_id, version, min(event_type) AS state,
             min(ts) AS effective_from, count(*) AS n_events
      FROM g GROUP BY user_id, version
    )
    SELECT user_id, version, state, effective_from,
           lead(effective_from) OVER (PARTITION BY user_id ORDER BY version)
             AS effective_to,
           n_events
    FROM iv
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X74 — SCD type-2 interval build: compress each user's event stream
    into effective-dated state rows (state = current event_type run), the
    warehouse pattern for turning a change log into point-in-time joinable
    history. Change-flag → running version number → per-run aggregate →
    ``lead`` closes each interval with the next run's start (NULL = current
    row, the open interval). The run-length encode is the same single
    (user_id) exchange+sort the other eventflow queries pin; the closing
    ``lead`` runs over the already-compressed runs, orders of magnitude
    smaller than the input. ``min(event_type)`` inside the run aggregate is
    constant-by-construction (a run is one type) — it exists so both engines
    reduce identically."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(order).alias("prev_type"),
    )
    c = s.withColumn(
        "chg",
        F.when(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .cast("long"),
    )
    version = F.sum("chg").over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    iv = (
        c.withColumn("version", version)
        .groupBy("user_id", "version")
        .agg(
            F.min("event_type").alias("state"),
            F.min("ts").alias("effective_from"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    nxt = Window.partitionBy("user_id").orderBy("version")
    return iv.select(
        "user_id",
        "version",
        "state",
        "effective_from",
        F.lead("effective_from").over(nxt).alias("effective_to"),
        "n_events",
    )
