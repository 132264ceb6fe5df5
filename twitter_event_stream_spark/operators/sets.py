"""G — set operations (SURVEY §2.2.G).

UNION ALL is a zero-shuffle concatenation; the distinct variants hash-
partition on the full row — at scale, project to the minimal column set
before the distinct (done below) so the shuffle carries only the keys.

The set-op operands are (user_id, day) activity pairs: high enough
cardinality that intersections/differences are non-empty at every shipped
scale factor (raw user_id sets fully overlap — FIXTURES.md notes every user
does everything).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import table


def _day_pairs(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    """Distinct-free (user_id, day) projection for one event type."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == event_type).select(
        "user_id", F.date_trunc("day", "ts").alias("day_ts")
    )


_PAIR_SQL = (
    "SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP))::TIMESTAMP AS day_ts "
    "FROM events WHERE event_type = '{t}'"
)


@query(
    "q_set_union_all",
    oracle="""
    SELECT event_id, event_type FROM events WHERE event_type = 'click' AND value > 100
    UNION ALL
    SELECT event_id, event_type FROM events WHERE event_type = 'purchase' AND value > 100
    """,
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 — UNION ALL (bag concatenation, no shuffle)."""
    ev = table(spark, sf_dir, "events")
    a = ev.filter((F.col("event_type") == "click") & (F.col("value") > 100))
    b = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 100))
    return a.select("event_id", "event_type").unionByName(
        b.select("event_id", "event_type")
    )


@query(
    "q_set_union",
    oracle=f"""
    {_PAIR_SQL.format(t="click")}
    UNION
    {_PAIR_SQL.format(t="view")}
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 — UNION (distinct) over (user, day) activity pairs."""
    return (
        _day_pairs(spark, sf_dir, "click")
        .union(_day_pairs(spark, sf_dir, "view"))
        .distinct()
    )


@query(
    "q_set_intersect",
    oracle=f"""
    {_PAIR_SQL.format(t="click")}
    INTERSECT
    {_PAIR_SQL.format(t="purchase")}
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 — INTERSECT: days on which a user both clicked and purchased."""
    return _day_pairs(spark, sf_dir, "click").intersect(
        _day_pairs(spark, sf_dir, "purchase")
    )


@query(
    "q_set_except",
    oracle=f"""
    {_PAIR_SQL.format(t="view")}
    EXCEPT
    {_PAIR_SQL.format(t="error")}
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 — EXCEPT: (user, day) with views but no errors."""
    return _day_pairs(spark, sf_dir, "view").subtract(
        _day_pairs(spark, sf_dir, "error")
    )


@query(
    "q_set_intersect_all",
    oracle="""
    SELECT 'ia' AS op, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT ALL
      SELECT user_id FROM events WHERE event_type = 'view'
    ) i
    UNION ALL
    SELECT 'ea' AS op, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      EXCEPT ALL
      SELECT user_id FROM events WHERE event_type = 'view'
    ) e
    """,
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 — INTERSECT ALL / EXCEPT ALL bag semantics (multiplicity-aware),
    tagged and unioned into one result."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    ia = clicks.intersectAll(views).select(F.lit("ia").alias("op"), "user_id")
    ea = clicks.exceptAll(views).select(F.lit("ea").alias("op"), "user_id")
    return ia.unionByName(ea)
