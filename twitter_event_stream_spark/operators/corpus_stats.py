"""Corpus statistics operators (SURVEY §2.3 extensions, X75–X76): token
co-occurrence PMI and a MinHash estimator-accuracy audit.

Both are measurement steps a training-data pipeline runs over its corpus:
PMI surfaces collocations / topical token pairs, and the sketch audit
quantifies how far the banded MinHash estimate (the thing that actually
scales) drifts from exact Jaccard — the number you need before trusting an
LSH threshold at 100 TB. Scale thread: co-occurrence counts are blocked per
document and bounded by vocabulary² not corpus size; the audit computes the
exact overlap only on a doc_id-bounded sample (the production pattern —
audit a sample, deploy the sketch). Reference checkout is empty (SURVEY
§0.1); these extend the §2.3 surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_event_stream_spark.exprs import char_shingles_sql, R, rnd
from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import table


@query(
    "q_cooccur_pmi",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents WHERE doc_id < 300
    ), n AS (
      SELECT count(DISTINCT doc_id) AS n_docs FROM t
    ), df AS (
      SELECT tok, count(*) AS df FROM t GROUP BY tok
    ), p AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_ab
      FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2
      HAVING count(*) >= 25
    )
    SELECT p.tok_a, p.tok_b, p.n_ab,
           {R('ln((p.n_ab * n.n_docs) / CAST(da.df * db.df AS DOUBLE))', 6)}
             AS pmi
    FROM p
    JOIN df da ON da.tok = p.tok_a
    JOIN df db ON db.tok = p.tok_b
    CROSS JOIN n
    """,
)
def q_cooccur_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X75 — token co-occurrence pointwise mutual information: for every
    token pair appearing together in ≥25 documents, ``pmi = ln(P(a,b) /
    (P(a)·P(b)))`` over document-level presence — the collocation signal
    behind phrase mining and topic drift checks. Pair generation is blocked
    per document (self-join on doc_id over *deduplicated* tokens), so the
    shuffle carries one row per (document, co-occurring pair) and the
    aggregated table is bounded by vocabulary², independent of corpus size.
    Document frequencies and the corpus count join the tiny pair table as
    broadcasts, never the fact rows."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    t = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    n_docs = t.agg(F.count_distinct("doc_id").alias("n_docs"))
    df_t = t.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    a = t.select("doc_id", F.col("tok").alias("tok_a"))
    b = t.select("doc_id", F.col("tok").alias("tok_b"))
    p = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 25)
    )
    da = F.broadcast(df_t.select(F.col("tok").alias("tok_a"), F.col("df").alias("df_a")))
    db = F.broadcast(df_t.select(F.col("tok").alias("tok_b"), F.col("df").alias("df_b")))
    return (
        p.join(da, "tok_a")
        .join(db, "tok_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            rnd(
                F.log(
                    (F.col("n_ab") * F.col("n_docs"))
                    / (F.col("df_a") * F.col("df_b")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )


@query(
    "q_minhash_jaccard_est",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, length(text) - 1),
                                                 i -> substr(text, i, 3)))) AS shingle
      FROM documents WHERE doc_id < 120 AND length(text) >= 3
    ), sz AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), sig AS (
      SELECT doc_id, slot,
             min(substr(md5(shingle || '#' || CAST(slot AS VARCHAR)), 1, 16))
               AS sig
      FROM sh CROSS JOIN (SELECT unnest(range(16)) AS slot) s
      GROUP BY doc_id, slot
    ), est AS (
      SELECT i.a_id, i.b_id,
             count(*) FILTER (WHERE sa.sig = sb.sig) AS n_eq
      FROM inter i
      JOIN sig sa ON sa.doc_id = i.a_id
      JOIN sig sb ON sb.doc_id = i.b_id AND sb.slot = sa.slot
      GROUP BY 1, 2
    )
    SELECT i.a_id, i.b_id,
           {R('i.n_inter / CAST(za.n_sh + zb.n_sh - i.n_inter AS DOUBLE)', 6)}
             AS exact_j,
           {R('e.n_eq / 16.0', 6)} AS est_j,
           {R('abs(i.n_inter / CAST(za.n_sh + zb.n_sh - i.n_inter AS DOUBLE)'
              ' - e.n_eq / 16.0)', 6)} AS abs_err
    FROM inter i
    JOIN est e ON e.a_id = i.a_id AND e.b_id = i.b_id
    JOIN sz za ON za.doc_id = i.a_id
    JOIN sz zb ON zb.doc_id = i.b_id
    WHERE i.n_inter >= 20
    """,
)
def q_minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X76 — MinHash estimator accuracy audit: on a doc_id-bounded sample,
    compute BOTH the exact trigram-shingle Jaccard (shingle-blocked
    intersection join + inclusion-exclusion union) and the 16-slot
    deterministic MinHash estimate (equal-slot fraction, same
    md5-prefix-min construction as `q_llm_minhash_det`), and report the
    absolute error per pair. This is how a pipeline picks its LSH band/row
    threshold before committing a 100 TB dedup pass: exact Jaccard is
    quadratic and runs only on this bounded audit sample; the signature
    path is the one that scales (16 rows/doc, slot-blocked equality — the
    per-pair compare is a broadcast-size join of two signature tables).
    Pairs below 20 shared shingles are skipped — the estimator isn't used
    at low overlap, and the floor keeps the audited set drift-stable."""
    d = table(spark, sf_dir, "documents").filter(
        # Guard: Spark `sequence(1, len-2)` DESCENDS for len < 3 ([1, 0]),
        # where DuckDB `range` yields empty — exclude sub-shingle texts on
        # both sides (they produce no shingles either way).
        (F.col("doc_id") < 120) & (F.length("text") >= 3)
    )
    shingles = F.expr(char_shingles_sql(3))
    sh = d.select("doc_id", F.explode(shingles).alias("shingle"))
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("a_id"), "shingle")
    b = sh.select(F.col("doc_id").alias("b_id"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .filter(F.col("n_inter") >= 20)
    )
    sig = (
        sh.withColumn("slot", F.explode(F.sequence(F.lit(0), F.lit(15))))
        .groupBy("doc_id", "slot")
        .agg(
            F.min(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("shingle"), F.lit("#"), F.col("slot").cast("string")
                        )
                    ),
                    1,
                    16,
                )
            ).alias("sig")
        )
    )
    sa = sig.select(F.col("doc_id").alias("a_id"), "slot", F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("b_id"), "slot", F.col("sig").alias("sig_b"))
    est = (
        inter.select("a_id", "b_id")
        .join(sa, "a_id")
        .join(sb, ["b_id", "slot"])
        .groupBy("a_id", "b_id")
        .agg(F.sum((F.col("sig_a") == F.col("sig_b")).cast("long")).alias("n_eq"))
    )
    exact = F.col("n_inter") / (
        F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_inter")
    ).cast("double")
    est_j = F.col("n_eq") / 16.0
    return (
        inter.join(est, ["a_id", "b_id"])
        .join(
            F.broadcast(sz.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("n_sh_a"))),
            "a_id",
        )
        .join(
            F.broadcast(sz.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("n_sh_b"))),
            "b_id",
        )
        .select(
            "a_id",
            "b_id",
            rnd(exact, 6).alias("exact_j"),
            rnd(est_j, 6).alias("est_j"),
            rnd(F.abs(exact - est_j), 6).alias("abs_err"),
        )
    )
