"""I — event-time windowing + dedup, batch-checkable rows (SURVEY §2.2.I).

``window``/``session_window``/``dropDuplicates`` run identically on bounded
data, so I1/I2/I3/I5 carry HASH contracts here; the *behaviorally* streaming
concerns (watermarks, late data, output modes, state recovery) live in
``streaming/`` with INFRA tests over the file-replay fixture.

Scale: event-time windows group by (window, key) — the shuffle key includes
the bucket, so state is bounded per trigger and the same plan incrementalizes
under Structured Streaming (SURVEY §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from twitter_event_stream_spark.exprs import R, rnd
from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import table


@query(
    "q_window_tumbling",
    oracle=f"""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP))::TIMESTAMP AS bucket_ts,
           count(*) AS n_events,
           {R('sum(value)')} AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1 — 1-hour tumbling event-time window (≡ date_trunc on bounded data;
    the same expression incrementalizes in streaming)."""
    ev = table(spark, sf_dir, "events")

    return (
        ev.groupBy(F.window("ts", "1 hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("bucket_ts"), "n_events", "sum_value"
        )
    )


@query(
    "q_window_sliding",
    oracle=f"""
    SELECT win_start, count(*) AS n_events, {R('sum(value)')} AS sum_value
    FROM (
      SELECT (time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
              - k.k * INTERVAL '15 minutes')::TIMESTAMP AS win_start,
             value
      FROM events
      CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
    ) t
    GROUP BY win_start
    """,
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2 — sliding window (1 h, slide 15 min): each event lands in 4
    windows; the oracle reconstructs the 4 epoch-aligned bucket starts."""
    ev = table(spark, sf_dir, "events")

    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("window.start").alias("win_start"), "n_events", "sum_value")
    )


@query(
    "q_window_session",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                    OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
                       > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           count(*) AS n_events,
           {R('sum(value)')} AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3 — session window (30-min gap) per user; oracle is the classic
    gaps-and-islands rewrite. Boundary semantics (measured, Spark 4.1.2,
    pinned by the session-boundary property test): session_window MERGES
    an event arriving at exactly last+gap — the boundary is inclusive for
    merging — so the oracle breaks on strictly-greater-than-gap (`>`),
    not `>=`. Fixture timestamps never land exactly on the boundary, so
    only grid-aligned (e.g. minute-bucketed) data distinguishes the two;
    the r9 property test on a 10-minute grid caught the earlier `>=`
    drift."""
    ev = table(spark, sf_dir, "events")

    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_dedup_exact",
    oracle="""
    SELECT DISTINCT user_id, event_type
    FROM events
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I5 — duplicate elimination on a key subset. Only the dedup keys are
    emitted (dropDuplicates keeps an arbitrary surviving row for other
    columns). Streaming twin: dropDuplicatesWithinWatermark (streaming/)."""
    ev = table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").dropDuplicates()


@query(
    "q_event_funnel",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts,
             lead(event_type) OVER w AS next_type,
             lead(ts) OVER w AS next_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, count(*) AS n_conversions
    FROM seq
    WHERE event_type = 'click' AND next_type = 'purchase'
      AND next_ts <= ts + INTERVAL 1 HOUR
    GROUP BY user_id
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I-extra — funnel/sequence detection (the event-analytics core of a
    stream bridge's domain): per user, consecutive click→purchase steps
    within 1 hour, counted per user. One window (partition user, order ts
    with event_id tiebreak) + filter + agg: a single shuffle on user_id at
    any scale, no self-join blowup."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "click")
            & (F.col("next_type") == "purchase")
            & (F.col("next_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_conversions"))
    )


@query(
    "q_retention_cohort",
    oracle="""
    WITH first AS (
      SELECT user_id, min(date_trunc('week', ts)::TIMESTAMP) AS cohort
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts)::TIMESTAMP AS wk
      FROM events
    )
    SELECT cohort,
           date_diff('day', cohort, wk) // 7 AS week_n,
           count(*) AS n_users
    FROM act JOIN first USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I-extra — retention cohorts: users grouped by first-active week,
    counted in each subsequent active week (the standard product-analytics
    rollup). Two aggs + one join, all keyed on user_id ⇒ one logical
    repartition by user reused across stages; the final (cohort, week_n)
    agg is tiny partials."""
    ev = table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    first = ev.groupBy("user_id").agg(F.min(wk).alias("cohort"))
    act = ev.select("user_id", wk.alias("wk")).distinct()
    return (
        act.join(first, "user_id")
        .select(
            "cohort",
            (F.datediff(F.col("wk"), F.col("cohort")) / 7)
            .cast("long")
            .alias("week_n"),
        )
        .groupBy("cohort", "week_n")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
