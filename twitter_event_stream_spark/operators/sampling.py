"""Deterministic sampling / split assignment + mergeable distinct sketches.

Two patterns a 100 TB training-data pipeline leans on constantly:

- **Hash-based split assignment** (train/val/test): membership must be a
  *pure function of the record key* — stable across reruns, cluster sizes,
  and engines — never an RNG draw (Spark's ``sample`` is seed×partition
  dependent, so it reshuffles membership whenever the layout changes). The
  md5-prefix arithmetic here is portable, so the oracle hash-matches exactly.

- **Mergeable HLL sketches**: count-distinct at scale is computed as
  per-partition (or per-day/per-shard) sketches that are unioned then
  estimated — an O(k)-size commutative monoid instead of an O(n) exact
  shuffle. Spark ships Apache DataSketches HLL (`hll_sketch_agg` /
  `hll_union_agg`); sketch bytes are engine-specific, so the query is a
  ROWS contract with the estimate-vs-exact bound asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import table


def split_pct(key: F.Column) -> F.Column:
    """Deterministic 0-99 bucket from a record key: first 4 hex digits of
    md5, mod 100. Identical arithmetic exists in every engine with md5."""
    return (F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10) % 100).cast("int")


@query(
    "q_split_assign",
    oracle="""
    SELECT lang,
           CASE WHEN pct < 80 THEN 'train'
                WHEN pct < 90 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           sum(n_chars) AS sum_chars
    FROM (
        SELECT lang, n_chars,
               CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 AS pct
        FROM documents
    )
    GROUP BY 1, 2
    """,
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment as a pure function of doc_id —
    rerun-stable, engine-portable, no shuffle beyond the rollup agg. The
    contract checks the per-(lang, split) doc and char counts."""
    docs = table(spark, sf_dir, "documents")
    pct = split_pct(F.col("doc_id"))
    split = (
        F.when(pct < 80, "train").when(pct < 90, "val").otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
    )


@query("q_hll_partitioned")  # ROWS — sketch bytes/estimates are engine-specific
def q_hll_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned count-distinct via mergeable DataSketches HLL: one sketch
    per (lang) shard, unioned, estimated — the shape that replaces an exact
    distinct shuffle at 100 TB. Returns per-lang and overall estimates; the
    test bounds them against exact counts (HLL lgK=12 ⇒ ~1.6% rel. err)."""
    docs = table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.hll_sketch_agg("doc_id").alias("sk"),
        F.countDistinct("doc_id").alias("exact"),
    )
    per = per_lang.select(
        "lang", F.hll_sketch_estimate("sk").alias("est"), "exact"
    )
    overall = per_lang.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.sum("exact").alias("exact"),
    ).select(F.lit("__all__").alias("lang"), "est", "exact")
    return per.unionByName(overall)
