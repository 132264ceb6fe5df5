"""Skew-handling utilities (SURVEY §4.2 "salting for skew").

AQE's skew-join splitting handles most hot keys automatically
(``spark.sql.adaptive.skewJoin.enabled`` is pinned on by the session
factory); these helpers cover the two cases AQE cannot:

- ``salted_agg`` — a single monster group in a high-cardinality
  aggregation (AQE splits *join* partitions, not agg groups): two-phase
  aggregate with an explicit salt so one key's rows spread over N reducers.
- ``salted_broadcast_left`` — a hot build-side key in a join where the
  small side fits in memory *except* for replication: replicate the small
  side N× with salt, salt the big side, join on (key, salt).

Both are semantics-preserving (tests assert result equality with the
unsalted plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__tes_salt"


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for sum/count/min/max (the re-aggregable
    aggregates): phase 1 groups on (keys + salt) — a hot key's rows land on
    ``n_salts`` reducers; phase 2 merges the partials on the true keys.

    ``aggs`` maps column → one of sum|count|min|max.
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    firsts = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    salted = df.withColumn(
        SALT_COL, (F.rand(seed=7) * n_salts).cast("int")
    )
    phase1 = salted.groupBy(*keys, SALT_COL).agg(
        *[firsts[kind](c).alias(f"{c}__p") for c, kind in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[mergers[kind](f"{c}__p").alias(f"{c}_{kind}") for c, kind in aggs.items()]
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, replicate the small side
    across all salt values (explode), join on (key, salt). Output columns =
    big ∪ small minus the duplicate key."""
    big_salted = big.withColumn(SALT_COL, (F.rand(seed=11) * n_salts).cast("int"))
    small_rep = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_salted.join(F.broadcast(small_rep), [key, SALT_COL]).drop(SALT_COL)
