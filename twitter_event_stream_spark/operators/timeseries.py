"""X6x (continued) — time-series & robust-statistics operators: gap filling,
MAD-based anomaly detection, rolling medians, and sparse TF-IDF cosine
similarity via an inverted index.

The common scale thread: generated dimension ladders instead of shuffled
ones (gap fill), broadcast per-group statistics instead of self-joins
(MAD), bounded window frames with HOF folds for order statistics Spark has
no native window form for (rolling median), and token-blocked sparse dot
products instead of dense all-pairs (TF-IDF cosine). Reference checkout is
empty (SURVEY §0.1) — §2.3 extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from twitter_event_stream_spark.exprs import R, rnd
from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import table


@query(
    "q_gap_fill",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1
      FROM events
    ), h AS (
      SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket_ts FROM b
    ), ty AS (
      SELECT DISTINCT event_type FROM events
    ), c AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT ty.event_type, h.bucket_ts, coalesce(c.n, 0) AS n_events
    FROM ty CROSS JOIN h
    LEFT JOIN c ON c.event_type = ty.event_type AND c.bucket_ts = h.bucket_ts
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X66 — time-series gap filling / resampling: a dense (event_type ×
    hour) grid over the observed time range, zero-filled where no events
    landed — the step every downstream rate/alerting computation needs
    (a missing bucket is not the same as an empty one). The hour ladder is
    *generated* from a 1-row min/max aggregate (`sequence` + explode), never
    shuffled from the fact table; actual counts partial-aggregate and join
    the tiny grid. At 100 TB the grid size depends on the time span and
    group count only, not on row count."""
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket_ts")
    )
    types = ev.select("event_type").distinct()
    counts = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        types.crossJoin(hours)
        .join(counts, ["event_type", "bucket_ts"], "left")
        .select(
            "event_type",
            "bucket_ts",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        )
    )


@query(
    "q_anomaly_mad",
    oracle=f"""
    WITH m AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ), d AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS dev
      FROM events e JOIN m ON m.event_type = e.event_type
    ), s AS (
      SELECT event_type, quantile_cont(dev, 0.5) AS mad
      FROM d GROUP BY event_type
    )
    SELECT d.event_type, count(*) AS n,
           {R('max(d.med)', 6)} AS median_value,
           {R('max(s.mad)', 6)} AS mad,
           count(*) FILTER (WHERE d.dev > 3 * s.mad) AS n_outliers,
           {R('(count(*) FILTER (WHERE d.dev > 3 * s.mad)) / CAST(count(*) AS DOUBLE)', 6)}
             AS outlier_rate
    FROM d JOIN s ON s.event_type = d.event_type
    GROUP BY d.event_type
    """,
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X67 — robust anomaly detection via median absolute deviation: per
    event type, the median, the MAD, and how many events sit beyond the
    3×MAD fence (the robust analog of 3σ — unlike stddev, one huge outlier
    can't inflate its own fence). Two exact-percentile aggregates with the
    per-group statistics *broadcast* back to the fact rows — the fact table
    is scanned twice but never self-joined or globally sorted. Exact
    `percentile` ↔ `quantile_cont` parity is ✔A (SURVEY Appendix A)."""
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    d = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = d.groupBy("event_type").agg(
        F.percentile("dev", F.lit(0.5)).alias("mad")
    )
    j = d.join(F.broadcast(mad), "event_type")
    outlier = (F.col("dev") > 3 * F.col("mad")).cast("long")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        rnd(F.max("med"), 6).alias("median_value"),
        rnd(F.max("mad"), 6).alias("mad"),
        F.sum(outlier).alias("n_outliers"),
        rnd(F.sum(outlier) / F.count(F.lit(1)).cast("double"), 6).alias(
            "outlier_rate"
        ),
    )


@query(
    "q_rolling_median",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, value,
             -- FILTER mirrors Spark collect_list's NULL-skipping: the
             -- median is defined over the frame's NON-NULL values on both
             -- engines (DuckDB's bare list() would keep NULLs and sort
             -- them first, silently shifting the median under NULL data)
             list(value) FILTER (WHERE value IS NOT NULL)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS vs
      FROM events WHERE user_id < 50
    ), s AS (
      SELECT user_id, event_id, list_sort(vs) AS sv, len(vs) AS n FROM w
    )
    SELECT user_id, event_id, CAST(n AS INT) AS n_window,
           (sv[CAST((n + 1) // 2 AS INT)] + sv[CAST(n // 2 + 1 AS INT)]) / 2.0
             AS rolling_med
    FROM s
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X68 — rolling median of each user's last 5 event values: an order
    statistic over a sliding frame, which no built-in Spark window function
    computes exactly. The engine collects the ≤5-element frame with
    `collect_list` OVER the ROWS frame, sorts it with `array_sort`, and
    reads the middle with the standard (n+1)/2, n/2+1 interpolation — all
    JVM-side; per-row state is bounded by the frame length, so the shape
    holds at any scale. Values are 2-decimal fixture money, so the midpoint
    average is exact in binary — no rounding wrap is needed and the hash
    pins the raw doubles."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    vs = F.array_sort(F.collect_list("value").over(w))
    n = F.size(vs)
    lo = F.floor((n + 1) / 2).cast("int")
    hi = (F.floor(n / 2) + 1).cast("int")
    return ev.select(
        "user_id",
        "event_id",
        n.alias("n_window"),
        # collect_list skips NULL values, so a frame of all-NULL values is
        # empty (n=0) -> median NULL, not an element_at(0) ANSI error.
        F.when(
            n > 0, (F.element_at(vs, lo) + F.element_at(vs, hi)) / 2.0
        ).alias("rolling_med"),
    )


@query(
    "q_tfidf_cosine_pairs",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id < 60
    ), tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM d GROUP BY 1, 2
    ), df AS (
      SELECT tok, count(*) AS df FROM tf GROUP BY tok
    ), n AS (
      SELECT count(DISTINCT doc_id) AS n_docs FROM tf
    ), w AS (
      SELECT tf.doc_id, tf.tok, tf.tf * ln(n.n_docs / df.df) AS w
      FROM tf JOIN df ON df.tok = tf.tok CROSS JOIN n
    ), nrm AS (
      SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id
    ), p AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             sum((a.w / na.nrm) * (b.w / nb.nrm)) AS sim
      FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
      JOIN nrm na ON na.doc_id = a.doc_id
      JOIN nrm nb ON nb.doc_id = b.doc_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id, {R('sim', 6)} AS cosine
    FROM p WHERE {R('sim', 6)} >= 0.15
    """,
)
def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X69 — sparse TF-IDF cosine similarity via an inverted index: document
    pairs scored by the dot product of their L2-normalized tf-idf vectors,
    computed token-blocked (pairs meet only on shared tokens) — THE scalable
    text-similarity pattern, in contrast to the dense-embedding kNN family
    (K4/X9): no embeddings, no all-pairs, and the shuffle carries one
    partial product per (pair, shared token). The idf table and per-doc
    norms are broadcast-size by construction (vocabulary and doc count, not
    corpus size). Threshold on the rounded score so the qualifying set is
    drift-stable cross-engine (SURVEY §2.0 C2/C3)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # Doc count as a broadcast scalar (1-row agg), not a driver-side action.
    n_docs = tf.agg(F.count_distinct("doc_id").alias("n_docs"))
    w = (
        tf.join(F.broadcast(df_t), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("w"),
        )
    )
    nrm = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    # nullif: a doc whose every token appears in all docs has idf=0 for
    # every term -> nrm exactly 0; DuckDB's /0 yields NULL (pair filtered
    # by the threshold) while Spark's default ANSI mode would ABORT
    wn = w.join(F.broadcast(nrm), "doc_id").select(
        "doc_id", "tok",
        (F.col("w") / F.nullif(F.col("nrm"), F.lit(0.0))).alias("wn"),
    )
    a = wn.select(F.col("doc_id").alias("a_id"), "tok", F.col("wn").alias("wa"))
    b = wn.select(F.col("doc_id").alias("b_id"), "tok", F.col("wn").alias("wb"))
    sim = (
        a.join(b, "tok")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(rnd(F.sum(F.col("wa") * F.col("wb")), 6).alias("cosine"))
    )
    return sim.filter(F.col("cosine") >= 0.15)
