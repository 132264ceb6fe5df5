"""J — Python UDF / pandas UDF / UDAF / grouped-map / UDTF surface
(SURVEY §2.2.J).

UDFs are the engine's *slow path* (SURVEY §4.3): every query here exists to
prove the boundary works, with the Arrow-vectorized forms (pandas UDF,
applyInPandas) as the only ones sanctioned for hot paths. Row-at-a-time
Python (J1) is deliberately confined to a trivially cheap expression.

All UDFs are pure functions of their inputs (J-determinism requirement) and
mirror an exact SQL formula so the DuckDB oracle can hash-match them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from twitter_event_stream_spark.exprs import R, rnd
from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import table


@query(
    "q_udf_python",
    oracle=f"""
    SELECT event_id,
           {R('least(greatest(value, 5.0), 250.0)')} AS clipped
    FROM events
    """,
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — scalar row-at-a-time Python UDF (value clipping).

    ``useArrow=True`` (r16, guide §4.3): the function is still invoked per
    row — the J1 contract shape — but batches cross the JVM↔Python boundary
    as Arrow instead of pickled rows (measured 0.69 → 0.44 s at sf0.1,
    identical output incl. NULLs — the float-in/float-out signature has
    none of the Arrow-vs-pickle coercion edge cases, and the declared type
    is exact)."""

    @udf("double", useArrow=True)
    def clip(v: float) -> float:
        if v is None:  # NULL in, NULL out — built-in function discipline
            return None
        return min(max(v, 5.0), 250.0)

    ev = table(spark, sf_dir, "events")
    return ev.select("event_id", rnd(clip("value"), 2).alias("clipped"))


@query(
    "q_udf_pandas",
    oracle=f"""
    SELECT event_id,
           {R('ln(1 + value)', 6)} AS log_value
    FROM events
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — Arrow-vectorized scalar pandas UDF; formula mirrors the oracle
    (np.log(1+v), not log1p, so both engines evaluate the same IEEE ops)."""

    @pandas_udf("double")
    def log_shift(v: pd.Series) -> pd.Series:
        return np.log(1.0 + v)

    ev = table(spark, sf_dir, "events")
    return ev.select("event_id", rnd(log_shift("value"), 6).alias("log_value"))


@query(
    "q_udaf_pandas",
    oracle=f"""
    SELECT l_returnflag,
           {R('sum(l_extendedprice * l_quantity) / sum(l_quantity)')} AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — grouped-aggregate pandas UDF: quantity-weighted mean price.
    Rounded at 2dp: pandas' pairwise summation and DuckDB's sequential sum
    drift at ~1e-10 relative, far inside the 2dp floor guard."""

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        rnd(wavg("l_extendedprice", "l_quantity"), 2).alias("wavg_price")
    )


@query(
    "q_grouped_map",
    oracle=f"""
    SELECT event_id,
           {R('(value - avg(value) OVER (PARTITION BY event_type))'
              ' / stddev_samp(value) OVER (PARTITION BY event_type)', 4)} AS z
    FROM events
    """,
)
def q_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — grouped-map applyInPandas: per-event-type z-score (pandas
    std(ddof=1) ≡ stddev_samp). 4dp guard for mean/std ulp drift."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["value"].mean()
        std = pdf["value"].std(ddof=1)
        scaled = (pdf["value"] - mean) / std * 10000 + 0.505
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "z": np.floor(scaled) / 10000}
        )

    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(zscore, "event_id long, z double")


@query(
    "q_udtf",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 20
    """,
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — Python UDTF (Spark 4 table function): whitespace tokenizer used
    through a SQL LATERAL join (same semantics as H8's explode)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string")
    class SplitWords:
        def eval(self, text: str):
            if text is None:  # NULL document -> zero tokens, like explode
                return
            for tok in text.split(" "):
                yield (tok,)

    spark.udtf.register("tes_split_words", SplitWords)
    table(spark, sf_dir, "documents")
    return spark.sql(
        """
        SELECT d.doc_id, s.token
        FROM documents d, LATERAL tes_split_words(d.text) s
        WHERE d.doc_id < 20
        """
    )
