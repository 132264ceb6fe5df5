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
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
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


@query("q_theta_overlap")  # ROWS — sketch estimates are engine-specific
def q_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra on distinct sets WITHOUT materializing them: theta
    sketches of the click-users and purchase-users, then union /
    intersection / difference estimates. This is the decontamination /
    audience-overlap primitive at 100 TB — each side collapses to a
    KB-sized sketch instead of a distinct-shuffle, and sketches built per
    shard/day merge associatively. Tests bound every estimate against the
    exact counts."""
    ev = table(spark, sf_dir, "events")
    sketches = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.theta_sketch_agg("user_id").alias("sk"))
        .groupBy()
        .pivot("event_type", ["click", "purchase"])
        .agg(F.first("sk"))
    )
    return sketches.select(
        F.theta_sketch_estimate(F.theta_union("click", "purchase")).alias("n_either"),
        F.theta_sketch_estimate(F.theta_intersection("click", "purchase")).alias("n_both"),
        F.theta_sketch_estimate(F.theta_difference("click", "purchase")).alias("n_click_only"),
    )


@query("q_kll_quantiles")  # ROWS — sketch estimates are engine-specific
def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles: one KLL double-sketch per shard, folded into a
    single sketch with the binary merge (a higher-order ``aggregate`` over
    the collected sketch array — 7 shards here; at scale the fold runs over
    per-day/per-shard sketch tables), then p50/p90/p99 queried from the
    merged sketch. Replaces a full sort/percentile shuffle with O(k)-size
    state. Tests bound the estimates against exact percentiles."""
    ev = table(spark, sf_dir, "events")
    merged = (
        ev.withColumn("shard", F.col("user_id") % 7)
        .groupBy("shard")
        .agg(F.kll_sketch_agg_double("value").alias("sk"))
        .agg(F.sort_array(F.collect_list(F.struct("shard", "sk"))).alias("arr"))
        .select(
            # greatest(...,0) and get(arr, 0): an empty corpus yields an
            # empty sketch array (slice rejects negative lengths, [0]
            # throws under ANSI) -> NULL quantiles, not a crash
            F.expr(
                "aggregate(slice(arr, 2, greatest(size(arr)-1, 0)),"
                " get(arr, 0).sk,"
                " (acc, x) -> kll_sketch_merge_double(acc, x.sk))"
            ).alias("m")
        )
    )
    return merged.select(
        F.kll_sketch_get_quantile_double("m", F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double("m", F.lit(0.9)).alias("p90"),
        F.kll_sketch_get_quantile_double("m", F.lit(0.99)).alias("p99"),
    )
