"""K-extra — the remaining LLM-pipeline operators the north star mandates:
SimHash dedup, character-n-gram Jaccard, language-ID scoring, quality
scoring, document fingerprinting, embedding-cosine near-dup.

All are HASH-contract queries: every hash/bit/fold primitive used is
available identically in DuckDB (md5, strpos/instr, integer div, bit_count,
sequential list folds), so the oracle replicates the exact arithmetic.

Scale notes:
- SimHash is explode(token)×32-bit rows → two hash aggregations; at corpus
  scale the bit dimension is a constant 32× map-side expansion that combines
  before the shuffle (partial agg), so the shuffle carries 32 rows/doc.
- The n-gram/Jaccard and pair queries use blocking (id windows, labels,
  simhash bands) — never an unblocked O(n²).
- Language-ID and quality are single-pass scans + broadcast profile joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from twitter_event_stream_spark.exprs import R, char_shingles_sql, rnd
from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import table

# --- SimHash ---------------------------------------------------------------
# 32-bit SimHash from md5 nibbles: bit b of token t = bit (b%4) of hex
# nibble (b//4) of md5(t); doc bit = sign of tf-weighted sum. The arithmetic
# below is dialect-portable (no engine-specific hash).

_SIMHASH_SPARK = """
WITH tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM (SELECT doc_id, explode(split(text, ' ')) AS token
        FROM documents WHERE doc_id < 100) t
  GROUP BY doc_id, token
), bits AS (
  SELECT doc_id, b,
         sum(tf * (2 * (CAST(floor((instr('0123456789abcdef',
                  substr(md5(token), CAST(b DIV 4 AS INT) + 1, 1)) - 1)
                / power(2, b % 4)) AS BIGINT) % 2) - 1)) AS s
  FROM tf LATERAL VIEW explode(sequence(0, 31)) bt AS b
  GROUP BY doc_id, b
)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN CAST(power(2, b) AS BIGINT) ELSE 0 END) AS simhash32
FROM bits GROUP BY doc_id
"""

_SIMHASH_DUCK = """
WITH tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents WHERE doc_id < 100) t
  GROUP BY doc_id, token
), bits AS (
  SELECT doc_id, b,
         sum(tf * (2 * (CAST(floor((strpos('0123456789abcdef',
                  substr(md5(token), (b // 4) + 1, 1)) - 1)
                / power(2, b % 4)) AS BIGINT) % 2) - 1)) AS s
  FROM tf CROSS JOIN (SELECT unnest(range(0, 32)) AS b) bt
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN CAST(power(2, b) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS simhash32
FROM bits GROUP BY doc_id
"""


@query("q_llm_simhash", oracle=_SIMHASH_DUCK)
def q_llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-extra — 32-bit SimHash per document (near-dup sketch whose bits are
    portable md5 arithmetic, so the oracle hash-matches exactly)."""
    table(spark, sf_dir, "documents")
    return spark.sql(_SIMHASH_SPARK)


@query(
    "q_llm_simhash_pairs",
    oracle=f"""
    WITH sh AS ({_SIMHASH_DUCK})
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           bit_count(xor(a.simhash32, b.simhash32)) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash32, b.simhash32)) <= 6
    """,
)
def q_llm_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-extra — SimHash near-dup candidate pairs (Hamming ≤ 6) over the
    bounded doc window. This HASH form stays all-pairs for oracle
    bit-parity; the deployable scale form is :func:`simhash_banded_pairs`
    (pigeonhole-banded equi-join, exact same result — asserted in
    tests/test_infra.py)."""
    table(spark, sf_dir, "documents")
    return spark.sql(
        f"""
        WITH sh AS ({_SIMHASH_SPARK})
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               bit_count(a.simhash32 ^ b.simhash32) AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(a.simhash32 ^ b.simhash32) <= 6
        """
    )


@query(
    "q_llm_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, lang,
             unnest(list_distinct(list_transform(range(1, length(text) - 1),
                                                 i -> substr(text, i, 3)))) AS shingle
      FROM documents WHERE doc_id < 30
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id,
           {R('n_common / (sa.n + sb.n - n_common)', 6)} AS jaccard3
    FROM inter
    JOIN sizes sa ON sa.doc_id = a_id
    JOIN sizes sb ON sb.doc_id = b_id
    WHERE n_common / (sa.n + sb.n - n_common) >= 0.5
    """,
)
def q_llm_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-extra — character-3-gram shingle Jaccard (near-dup on raw text,
    robust to token boundaries), lang-blocked and id-bounded."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    shingles = F.expr(char_shingles_sql(3))
    sh = d.select("doc_id", "lang", F.explode(shingles).alias("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(
        F.col("doc_id").alias("a_id"), F.col("lang").alias("a_lang"), "shingle"
    )
    b = sh.select(
        F.col("doc_id").alias("b_id"), F.col("lang").alias("b_lang"), "shingle"
    )
    inter = (
        a.join(b, "shingle")
        .filter((F.col("a_lang") == F.col("b_lang")) & (F.col("a_id") < F.col("b_id")))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb"))
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(F.broadcast(sa), "a_id")
        .join(F.broadcast(sb), "b_id")
        .filter(jac >= 0.5)
        .select("a_id", "b_id", rnd(jac, 6).alias("jaccard3"))
    )


@query(
    "q_llm_langid",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks
      WHERE doc_id < 100 GROUP BY doc_id, token
    ), prof AS (
      SELECT d.lang, t.token, count(*) AS cnt
      FROM toks t JOIN documents d USING (doc_id)
      GROUP BY d.lang, t.token
    ), totals AS (
      SELECT lang, sum(cnt) AS total FROM prof GROUP BY lang
    ), scores AS (
      SELECT tf.doc_id, prof.lang,
             {R('sum(tf.tf * ln(prof.cnt / CAST(totals.total AS DOUBLE)))', 6)} AS score
      FROM tf JOIN prof ON tf.token = prof.token
      JOIN totals ON prof.lang = totals.lang
      GROUP BY tf.doc_id, prof.lang
    )
    SELECT s.doc_id, d.lang AS actual_lang, s.lang AS predicted_lang, s.score
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, lang) AS rn
      FROM scores
    ) s JOIN documents d ON d.doc_id = s.doc_id
    WHERE s.rn = 1
    """,
)
def q_llm_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-extra — n-gram/token language-ID: per-language token profiles
    (learned from the corpus, broadcast) score each document; argmax with a
    lang tiebreak on the rounded score."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = (
        toks.filter(F.col("doc_id") < 100)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # lang rides the explode projection (r17, guide §2.3): the old form
    # re-joined the corpus-sized token stream back to documents just to
    # fetch lang — a per-token broadcast-hash probe that the scan already
    # had in hand. Same rows, same counts, one fewer join over the stream.
    prof = (
        d.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = prof.groupBy("lang").agg(F.sum("cnt").alias("total"))
    scored = (
        tf.join(F.broadcast(prof), "token")
        .join(F.broadcast(totals), "lang")
        .groupBy("doc_id", "lang")
        .agg(
            rnd(
                F.sum(
                    F.col("tf") * F.log(F.col("cnt") / F.col("total").cast("double"))
                ),
                6,
            ).alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("lang"))
    best = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return best.join(d.select("doc_id", F.col("lang").alias("actual_lang")), "doc_id").select(
        "doc_id", "actual_lang", F.col("lang").alias("predicted_lang"), "score"
    )


@query(
    "q_llm_quality",
    oracle=f"""
    WITH q AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_uniq,
             len(list_filter(string_split(text, ' '),
                             t -> t = 'the' OR t = 'a')) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_tokens, n_uniq,
           {R('n_uniq / CAST(n_tokens AS DOUBLE)', 6)} AS uniq_ratio,
           {R('n_stop / CAST(n_tokens AS DOUBLE)', 6)} AS stop_ratio,
           {R('0.4 * (n_uniq / CAST(n_tokens AS DOUBLE))'
              ' + 0.4 * (1 - n_stop / CAST(n_tokens AS DOUBLE))'
              ' + 0.2 * least(n_tokens / 100.0, 1.0)', 6)} AS quality
    FROM q
    """,
)
def q_llm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-extra — document quality scoring: lexical diversity, stopword
    ratio, length saturation → one filterable score (the pretraining-corpus
    filter primitive)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: (t == "the") | (t == "a")))
    uniq_ratio = n_uniq / n_tokens.cast("double")
    stop_ratio = n_stop / n_tokens.cast("double")
    quality = (
        0.4 * uniq_ratio
        + 0.4 * (1 - stop_ratio)
        + 0.2 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_uniq.alias("n_uniq"),
        rnd(uniq_ratio, 6).alias("uniq_ratio"),
        rnd(stop_ratio, 6).alias("stop_ratio"),
        rnd(quality, 6).alias("quality"),
    )


@query(
    "q_llm_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                              t -> CAST(ascii(t) + length(t) AS BIGINT))),
             (acc, v) -> (acc * 131 + v) % 1000000007) AS rolling_fp,
           list_aggregate(
             list_transform(list_transform(range(1, length(text) - 1),
                                           i -> substr(text, i, 3)),
                            s -> md5(s)), 'min') AS min_shingle_hash
    FROM documents
    """,
)
def q_llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-extra — document fingerprinting: polynomial rolling hash over the
    token stream (order-sensitive, sequential fold — identical in both
    engines) + winnowing-style min shingle hash (order-insensitive)."""
    d = table(spark, sf_dir, "documents")
    rolling = F.expr(
        "aggregate(transform(split(text, ' '),"
        " t -> CAST(ascii(t) + length(t) AS BIGINT)),"
        " 0L, (acc, v) -> (acc * 131 + v) % 1000000007)"
    )
    # min over distinct shingles == min over the multiset, and the shared
    # builder's guard makes the degenerate-text min NULL (array_min of an
    # empty array) exactly like the oracle's empty-list aggregate
    min_shingle = F.expr(
        f"array_min(transform({char_shingles_sql(3)}, s -> md5(s)))"
    )
    return d.select(
        "doc_id",
        rolling.alias("rolling_fp"),
        min_shingle.alias("min_shingle_hash"),
    )


@query(
    "q_llm_embed_neardup",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label AS label,
           {R('list_dot_product(a.v, b.v) / (a.nrm * b.nrm)', 4)} AS sim
    FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.25
    """,
)
def q_llm_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-extra — embedding-cosine near-duplicate pairs with label blocking
    (the coarse-quantizer bucket stand-in); at 100 TB the block is an
    IVF/LSH bucket, never the whole corpus."""
    from twitter_event_stream_spark.operators.llm import _DOT, _VD

    e = table(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id",
        "label",
        F.expr(_VD).alias("v"),
        F.sqrt(F.expr(_DOT.format(a=_VD, b=_VD))).alias("nrm"),
    )
    a = vecs.select(
        F.col("vec_id").alias("a_id"),
        "label",
        F.col("v").alias("av"),
        F.col("nrm").alias("an"),
    )
    b = vecs.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("b_label"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    # nullif: DuckDB's double /0 yields NULL (pair filtered) while Spark's
    # default ANSI mode would ABORT on a zero-norm embedding
    sim = F.expr(_DOT.format(a="av", b="bv")) / F.nullif(
        F.col("an") * F.col("bn"), F.lit(0.0)
    )
    return (
        a.join(b, (F.col("label") == F.col("b_label")) & (F.col("a_id") < F.col("b_id")))
        .filter(sim >= 0.25)
        .select("a_id", "b_id", "label", rnd(sim, 4).alias("sim"))
    )


@query("q_llm_ann_ivf", oracle=None)
def q_llm_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-extra (ROWS) — IVF approximate nearest neighbors: seeded-KMeans
    coarse quantizer → per-cell brute force over n_probe_cells shortlisted
    cells. The candidate set per probe is a fixed corpus fraction however
    large the corpus — the production-scale path for K4 (recall bounded by
    the engine's own test against the exact query)."""
    from twitter_event_stream_spark.operators.vector_search import ivf_topk

    e = table(spark, sf_dir, "embeddings")
    return ivf_topk(spark, e, e.filter(F.col("vec_id") < 20), k=5)


@query(
    "q_llm_minhash_det",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, length(text) - 1),
                                                 i -> substr(text, i, 3)))) AS shingle
      FROM documents WHERE doc_id < 200
    ), sig AS (
      SELECT doc_id, band,
             min(substr(md5(shingle || '#' || CAST(band AS VARCHAR)), 1, 16)) AS sig
      FROM sh CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS band) b
      GROUP BY doc_id, band
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           count(*) AS n_shared,
           {R('count(*) / 8.0', 6)} AS est_jaccard
    FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
                         AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 7
    """,
)
def q_llm_minhash_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2-det — DETERMINISTIC MinHash near-dup (HASH contract, unlike the
    seed-dependent Spark-ML `q_llm_neardup_lsh`): 8 independent min-hashes
    per doc over char-3-gram shingles, hash = md5(shingle||'#'||seed) prefix
    (lexicographic min of fixed-length hex — portable across engines, no
    integer conversion). A pair sharing ≥7 of 8 minhashes (est. Jaccard ≥.875)
    is a near-dup candidate. Scale path: the signature table is 8 rows per
    doc however long the text, the join is blocked on (band, sig) — never
    all-pairs; band buckets bound candidates exactly like production
    MinHash-LSH, and the whole pipeline is JVM-side codegen (no UDF)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return minhash_det_pairs(d)


def minhash_band_sigs(d: DataFrame) -> DataFrame:
    """Per-doc deterministic MinHash band minima — (doc_id, _s0.._s7),
    the shared signature pass of :func:`minhash_det_pairs` (pair
    enumeration) and :func:`minhash_cluster_edges` (linear clustering
    edges). All 8 band minima in ONE aggregation (8 md5 expressions per
    shingle row — the same hash CPU as a ×8 band explode, but the agg
    input stays at shingle cardinality instead of 8× it, and the partial
    map-side combine reduces on doc_id alone)."""
    shingles = F.expr(char_shingles_sql(3))
    sh = d.select("doc_id", F.explode(shingles).alias("shingle"))
    return sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(
                    F.md5(F.concat(F.col("shingle"), F.lit(f"#{b}"))), 1, 16
                )
            ).alias(f"_s{b}")
            for b in range(8)
        ]
    )


def minhash_cluster_edges(d: DataFrame) -> DataFrame:
    """Connectivity-preserving near-dup edges in O(n·bands) — the
    100 TB replacement for clustering over :func:`minhash_det_pairs`.

    The pair contract ("share ≥7 of 8 band minima") makes every dup
    CLIQUE enumerate k²/2 pairs — a 1M-pair edge list from 5k docs on the
    degenerate-vocab fixture, and quadratic in cluster size at any scale.
    Connected components never need the clique: two docs share ≥7 of 8
    bands iff they agree EXACTLY on at least one of the 8 leave-one-out
    7-band signatures (all 8 shared ⇒ every key matches; exactly 7 ⇒ the
    key omitting the differing band matches). Each (subset, 7-band-key)
    bucket is therefore a CLIQUE of the ≥7-band graph, so a STAR to the
    bucket-min doc preserves each clique's connectivity, and the union of
    stars has exactly the pair graph's connected components — pinned
    equal in tests/test_corpus_full.py. Edge count: ≤ 8 per doc, however
    large the dup clusters.

    Plan: one signature aggregation, an 8-way key explode, a groupBy-MIN
    per bucket joined back on the bucket key, one distinct. The hub pick
    is a partial-aggregating groupBy + streaming sort-merge join rather
    than a window MIN: WindowExec BUFFERS each partition group, so a
    boilerplate mega-clique (one 7-band key shared by millions of docs —
    routine at 100 TB) would buffer whole in one task, while the
    groupBy combines map-side and the join streams the hot key (and AQE
    skew-join can split it).

    **Eager execution** (r16 localCheckpoint): calling this function runs
    Spark jobs immediately and caller filters cannot push below the
    materialized per-doc signature table — see
    :func:`simhash_banded_pairs` for the full contract note (bounded
    narrow table, but non-replicated truncated-lineage storage).
    """
    # Materialize the signature table once (guide §2.4/§3.3): `keys` feeds
    # BOTH the hub aggregation and the join's probe side, and whenever the
    # planner broadcasts `hubs` the two subtrees share no Exchange — the
    # whole shingle→8×md5 aggregation would run twice from the parquet
    # scan (measured in the r16 plan audit). The checkpointed table is one
    # narrow row per doc (8×16-char minima), bounded at any corpus size.
    per_doc = minhash_band_sigs(d).localCheckpoint()
    keys = per_doc.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("subset"),
                    F.concat_ws(
                        "|", *[f"_s{b}" for b in range(8) if b != i]
                    ).alias("key7"),
                )
                for i in range(8)
            ])
        ).alias("k"),
    ).select("doc_id", F.col("k.subset").alias("subset"), F.col("k.key7").alias("key7"))
    hubs = keys.groupBy("subset", "key7").agg(F.min("doc_id").alias("hub"))
    return (
        keys.join(hubs, ["subset", "key7"])
        .filter(F.col("doc_id") != F.col("hub"))
        .select(F.col("doc_id").alias("a_id"), F.col("hub").alias("b_id"))
        .distinct()
    )


def minhash_det_pairs(d: DataFrame) -> DataFrame:
    """The clamp-free core of :func:`q_llm_minhash_det` over any
    (doc_id, text) DataFrame — also the unclamped workload the 10× scale
    probe (tools/scale_probe.py) drives, so the banded-join shape is
    exercised beyond the contract query's bounded id window.

    The length >= 3 guard matters beyond oracle parity here: Spark's
    sequence(1, n) DESCENDS for n < 1, so every degenerate (<3-char) doc
    would otherwise share a fabricated ''-shingle signature — phantom
    near-dup pairs linking ALL short docs into one cluster, which the
    graph queries built on these pairs then amplify (caught by the r6
    degenerate-text differential audit).

    **Eager execution** (r16 localCheckpoint): calling this function runs
    Spark jobs immediately and caller filters cannot push below the
    materialized per-doc signature table — see
    :func:`simhash_banded_pairs` for the full contract note (bounded
    narrow table, but non-replicated truncated-lineage storage)."""
    # Materialize the signature table once (guide §2.4/§3.3): the banded
    # self-join reads `sig` on both sides, and when one side broadcasts
    # (the local/bench-scale plan) there is no shared Exchange to reuse —
    # without this the shingle→8×md5 aggregation ran twice end-to-end
    # (r16 plan audit: two parquet scans). One narrow row per doc.
    per_doc = minhash_band_sigs(d).localCheckpoint()
    sig = per_doc.selectExpr(
        "doc_id",
        "stack(8, " + ", ".join(f"{b}, _s{b}" for b in range(8)) + ") AS (band, sig)",
    )
    a = sig.select(
        F.col("doc_id").alias("a_id"), "band", "sig"
    )
    b = sig.select(
        F.col("doc_id").alias("b_id"), "band", "sig"
    )
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 7)
        .select(
            "a_id",
            "b_id",
            "n_shared",
            rnd(F.col("n_shared") / 8.0, 6).alias("est_jaccard"),
        )
    )


#: BPE-ish pretokenizer (GPT-2-style, ASCII-only so Java regex and RE2 agree):
#: contractions, space-prefixed letter runs, digit runs, punctuation runs.
BPE_PAT = "'[a-z]{1,2}| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9']+"


@query(
    "q_llm_token_bpe",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(regexp_extract_all(text,
               '''[a-z]{{1,2}}| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9'']+')) AS tok
      FROM documents
    )
    SELECT lang,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_tokens,
           count(DISTINCT tok) AS n_vocab,
           {R('avg(length(tok))', 6)} AS avg_tok_len
    FROM toks
    GROUP BY lang
    """,
)
def q_llm_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-extra — token counting with a BPE-ish pretokenizer regex (the
    GPT-2 pattern family restricted to ASCII classes, where Java regex and
    RE2 have identical semantics): contractions / space-prefixed word runs /
    digit runs / punctuation runs. Whitespace-count lives in
    q_llm_textstats; this is the subword-tokenizer-faithful count a training
    pipeline budgets with. Pure JVM codegen (regexp_extract_all + explode),
    two-phase agg on lang."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(F.regexp_extract_all("text", F.lit(BPE_PAT), F.lit(0))).alias("tok"),
    )
    return toks.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_vocab"),
        rnd(F.avg(F.length("tok")), 6).alias("avg_tok_len"),
    )


@query(
    "q_llm_unigram_logprob",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    uni AS (
        SELECT token, ln(count(*) * 1.0 / (SELECT count(*) FROM toks)) AS logp
        FROM toks GROUP BY token
    ),
    per_doc AS (
        SELECT t.doc_id, t.lang, avg(u.logp) AS doc_logp
        FROM toks t JOIN uni u ON t.token = u.token
        GROUP BY t.doc_id, t.lang
    )
    SELECT lang,
           count(*) AS n_docs,
           {R('avg(doc_logp)', 6)} AS avg_logprob,
           {R('min(doc_logp)', 6)} AS min_logprob
    FROM per_doc
    GROUP BY lang
    """,
)
def q_llm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-extra — unigram language-model scoring: each doc's mean token
    log-probability under the corpus MLE unigram distribution (the classic
    cheap perplexity proxy for quality filtering — gibberish and boilerplate
    sit in the tails). Plan: one explode, one token agg for the model, a
    broadcast join back (the vocabulary is tiny next to the token stream at
    any scale), then two bounded-key aggs. Doc means are exact averages —
    deterministic, so the whole pipeline is HASH-contracted."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    # Total token count as a broadcast scalar (vocab-sized agg, no driver
    # action, no second corpus scan — the collect-free histogram pattern).
    total = counts.agg(F.sum("cnt").cast("double").alias("total"))
    uni = counts.crossJoin(F.broadcast(total)).select(
        "token", F.log(F.col("cnt") / F.col("total")).alias("logp")
    )
    per_doc = (
        toks.join(F.broadcast(uni), "token")
        .groupBy("doc_id", "lang")
        .agg(F.avg("logp").alias("doc_logp"))
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        rnd(F.avg("doc_logp"), 6).alias("avg_logprob"),
        rnd(F.min("doc_logp"), 6).alias("min_logprob"),
    )


@query(
    "q_contamination_exact",
    oracle="""
    WITH tagged AS (
        SELECT lang, md5(text) AS h,
               CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 AS pct
        FROM documents
    ),
    train AS (SELECT DISTINCT h FROM tagged WHERE pct < 90),
    test AS (SELECT lang, h FROM tagged WHERE pct >= 90)
    SELECT t.lang,
           count(*) AS n_test_docs,
           count(*) FILTER (WHERE t.h IN (SELECT h FROM train)) AS n_contaminated
    FROM test t
    GROUP BY t.lang
    """,
)
def q_contamination_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-extra — exact train→test leakage: test-split docs whose exact text
    (by md5) also appears in the train split. The exact counterpart of the
    theta-sketch overlap estimate (q_theta_overlap): at 100 TB the sketch
    screens cheaply and this semi-join runs on the flagged slices — only
    16-byte digests ever shuffle, never document payloads."""
    from twitter_event_stream_spark.operators.sampling import split_pct

    d = table(spark, sf_dir, "documents").select(
        "lang", F.md5("text").alias("h"), split_pct(F.col("doc_id")).alias("pct")
    )
    train = d.filter(F.col("pct") < 90).select("h").distinct()
    test = d.filter(F.col("pct") >= 90).select("lang", "h")
    hit = test.join(train.withColumn("hit", F.lit(1)), "h", "left")
    return hit.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_test_docs"),
        F.count("hit").alias("n_contaminated"),
    )


def simhash_banded_pairs(
    spark: SparkSession,
    sh: DataFrame,
    max_hamming: int = 6,
    n_bands: int = 8,
    bits: int = 32,
    sig_col: str = "simhash32",
) -> DataFrame:
    """Banded SimHash candidate join — the 100 TB form of
    ``q_llm_simhash_pairs``'s all-pairs comparison.

    Pigeonhole: two ``bits``-bit signatures within Hamming distance ``k``
    differ in at most ``k`` bands, so with ``n_bands > k`` at least one
    band matches EXACTLY. Explode each signature into its (band_id,
    band_value) keys, equi-join on them, dedupe, then verify the full
    Hamming distance — candidates per document are bounded by band-bucket
    occupancy, never the corpus, and the join is a plain hash join Spark
    shuffles by (band, value). Recall is exact (the pigeonhole bound is a
    guarantee, not an approximation) as the equality test asserts.

    ``sh`` must carry (doc_id, ``sig_col``). With n_bands=8 over 32 bits,
    each band is 4 bits; Hamming ≤ 6 < 8 bands ⇒ no candidate is missed.

    Band WIDTH is the scale knob: candidate volume per band is
    Σ_bucket c² ≈ n²/2^band_bits + true-dup pairs, so 4-bit bands (the
    oracle-parity 32-bit contract shape) are only linear at bounded n,
    while the 64-bit/16-bit-band form (`q_simhash_dedup_full`, the
    Manku WWW'07 configuration: 4 tables × 16 bits for k ≤ 3) keeps the
    random-collision term negligible to ~10M docs — past that, widen the
    signature (128-bit) or shard band values, same plan shape.

    **Eager execution** (r16 localCheckpoint, contract note per the r16
    advisor): CALLING this function runs Spark jobs immediately — the
    (doc_id, signature) table is materialized before the self-join is
    even composed, so caller-side filters cannot push below the
    checkpoint and composing lazily is not possible. The checkpointed
    table is one narrow row per doc (bounded at any corpus size), but it
    lives on NON-replicated executor-local storage with truncated
    lineage: an executor lost between materialization and the last
    downstream read fails the query rather than recomputing. Callers
    needing lazy composition or lineage-backed recovery should pass the
    signature table through their own materialization policy instead.
    """
    if n_bands <= max_hamming:
        raise ValueError("need n_bands > max_hamming for exact recall")
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    # Materialize the caller's signature lineage once (guide §2.4/§3.3):
    # the banded self-join consumes `sh` on both sides, and when one side
    # broadcasts there is no Exchange to reuse — the full upstream
    # signature computation (e.g. simhash64's tokenize + 64-sum
    # aggregation) would otherwise run twice from the source scan (r16
    # plan audit of q_simhash_dedup_full: two parquet scans). One narrow
    # (doc_id, signature) row per doc, bounded at any corpus size.
    sh = sh.select("doc_id", sig_col).localCheckpoint()
    bands = sh.select(
        "doc_id",
        F.col(sig_col).alias("_sig"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(sig_col, b * band_bits)
                    .bitwiseAND(F.lit(mask))
                    .alias("val"),
                )
                for b in range(n_bands)
            ])
        ).alias("bk"),
    ).select("doc_id", "_sig", F.col("bk.band").alias("band"),
             F.col("bk.val").alias("val"))
    a = bands.select(
        F.col("doc_id").alias("a_id"), F.col("_sig").alias("a_sh"),
        "band", "val",
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"), F.col("_sig").alias("b_sh"),
        "band", "val",
    )
    cand = (
        a.join(b, ["band", "val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sh", "b_sh")
        .distinct()
    )
    hamming = F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


# --- duplicated-span mining & chunking (r8) --------------------------------

_DUP_SPANS_SPARK = """
WITH t AS (
  SELECT doc_id, split(text, ' ') AS toks FROM documents WHERE doc_id < 200
), g AS (
  SELECT doc_id, explode(CASE WHEN size(toks) >= 5 THEN
           array_distinct(transform(sequence(1, size(toks) - 4),
                                    i -> array_join(slice(toks, i, 5), ' ')))
         ELSE array() END) AS gram
  FROM t
), shared AS (
  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
)
SELECT g.doc_id,
       count(s.gram) AS n_dup_grams,
       count(*) AS n_grams,
       floor((count(s.gram) / CAST(count(*) AS DOUBLE)) * 1000000 + 0.505)
         / 1000000 AS dup_ratio
FROM g LEFT JOIN shared s ON g.gram = s.gram
GROUP BY g.doc_id
"""


@query(
    "q_dup_spans",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 200
    ), g AS (
      SELECT doc_id, unnest(CASE WHEN len(toks) >= 5 THEN
               list_distinct(list_transform(range(1, len(toks) - 3),
                 i -> array_to_string(list_slice(toks, i, i + 4), ' ')))
             ELSE [] END) AS gram
      FROM t
    ), shared AS (
      SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT g.doc_id,
           count(s.gram) AS n_dup_grams,
           count(*) AS n_grams,
           {R('count(s.gram) / CAST(count(*) AS DOUBLE)', 6)} AS dup_ratio
    FROM g LEFT JOIN shared s ON g.gram = s.gram
    GROUP BY g.doc_id
    """,
)
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-extra — cross-document duplicated-SPAN mining (the token-n-gram
    granular dedup signal of Lee et al., *Deduplicating Training Data
    Makes Language Models Better*, ACL'22): per doc, how many of its
    distinct token 5-grams also appear in ANY other document, and the
    duplicated-span ratio a span-level filter would act on. Doc-level
    near-dup (MinHash/SimHash) misses partially-copied boilerplate; this
    is the complementary signal. Docs with <5 tokens have no 5-gram and
    are absent (stated by both dialects identically).

    Scale: the gram table is O(total tokens) rows; the only shuffles are
    the gram-key aggregation (map-side combined) and the gram equi-join —
    never any doc×doc pairing. At 100 TB the gram strings would be
    xxhash64-compressed before the shuffle (same plan shape, 8-byte
    keys); the contract form keeps raw grams so the oracle is exact."""
    table(spark, sf_dir, "documents")
    return spark.sql(_DUP_SPANS_SPARK)


_TEXT_CHUNK_SPARK = """
WITH t AS (
  SELECT doc_id, split(text, ' ') AS toks FROM documents WHERE doc_id < 100
), s AS (
  SELECT doc_id, toks, explode(sequence(1, size(toks), 8)) AS start FROM t
)
SELECT doc_id,
       CAST((start - 1) DIV 8 + 1 AS BIGINT) AS chunk_id,
       array_join(slice(toks, start, 16), ' ') AS chunk_text,
       CAST(size(slice(toks, start, 16)) AS BIGINT) AS n_tokens
FROM s
"""


@query(
    "q_text_chunk",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 100
    ), s AS (
      SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 8)) AS start FROM t
    )
    SELECT doc_id,
           CAST((start - 1) // 8 + 1 AS BIGINT) AS chunk_id,
           array_to_string(list_slice(toks, start, start + 15), ' ')
             AS chunk_text,
           CAST(len(list_slice(toks, start, start + 15)) AS BIGINT)
             AS n_tokens
    FROM s
    """,
)
def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-extra — overlapping token-window chunking (window 16, stride 8):
    the retrieval/embedding-index preprocessing step (each chunk overlaps
    half the previous so no phrase straddles a hard boundary). Pure
    per-row array arithmetic — zero shuffles, whole-stage codegen; at
    100 TB this is a map-only pass whose output feeds the embedding UDF
    and the IVF index build. The trailing chunk keeps its natural short
    length (both dialects state the same slice semantics)."""
    table(spark, sf_dir, "documents")
    return spark.sql(_TEXT_CHUNK_SPARK)


_CONTAM_NGRAM_SPARK = """
WITH t AS (
  SELECT doc_id, lang, split(text, ' ') AS toks,
         CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)
              % 100 AS INT) AS pct
  FROM documents
), g AS (
  SELECT doc_id, pct, explode(CASE WHEN size(toks) >= 8 THEN
           array_distinct(transform(sequence(1, size(toks) - 7),
                                    i -> array_join(slice(toks, i, 8), ' ')))
         ELSE array() END) AS gram
  FROM t
), test_g AS (
  SELECT DISTINCT gram FROM g WHERE pct >= 90
), hits AS (
  SELECT DISTINCT g.doc_id FROM g JOIN test_g ON g.gram = test_g.gram
  WHERE g.pct < 90
)
SELECT t.lang,
       count(*) AS n_train_docs,
       count(h.doc_id) AS n_flagged
FROM t LEFT JOIN hits h ON t.doc_id = h.doc_id
WHERE t.pct < 90
GROUP BY t.lang
"""


@query(
    "q_contamination_ngram",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks,
             CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
                                              1, 4)) AS BIGINT)
                  % 100 AS INT) AS pct
      FROM documents
    ), g AS (
      SELECT doc_id, pct, unnest(CASE WHEN len(toks) >= 8 THEN
               list_distinct(list_transform(range(1, len(toks) - 6),
                 i -> array_to_string(list_slice(toks, i, i + 7), ' ')))
             ELSE [] END) AS gram
      FROM t
    ), test_g AS (
      SELECT DISTINCT gram FROM g WHERE pct >= 90
    ), hits AS (
      SELECT DISTINCT g.doc_id FROM g JOIN test_g ON g.gram = test_g.gram
      WHERE g.pct < 90
    )
    SELECT t.lang,
           count(*) AS n_train_docs,
           count(h.doc_id) AS n_flagged
    FROM t LEFT JOIN hits h ON t.doc_id = h.doc_id
    WHERE t.pct < 90
    GROUP BY t.lang
    """,
)
def q_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-extra — SPAN-level train→test decontamination (the GPT-3/PaLM
    appendix method, at token-8-gram granularity for the short-doc
    fixture): flag every train-split document sharing at least one token
    8-gram with any test-split document — the complement of
    `q_contamination_exact`'s whole-doc digest match, which misses a test
    answer pasted inside a longer train doc. Split buckets follow the
    engine's deterministic md5 convention (sampling.split_pct; train <90,
    test ≥90).

    Scale: the gram table is O(total tokens); the test-gram side is a
    distinct over the ~10% test slice; the only shuffles are the two
    distincts and the gram equi-join (semi-join shape — at 100 TB the
    grams would shuffle as xxhash64 digests, same plan). Never doc×doc."""
    table(spark, sf_dir, "documents")
    return spark.sql(_CONTAM_NGRAM_SPARK)


_TOP_DUP_SPANS_SPARK = """
WITH t AS (
  SELECT doc_id, split(text, ' ') AS toks FROM documents WHERE doc_id < 200
), g AS (
  SELECT doc_id, explode(CASE WHEN size(toks) >= 5 THEN
           array_distinct(transform(sequence(1, size(toks) - 4),
                                    i -> array_join(slice(toks, i, 5), ' ')))
         ELSE array() END) AS gram
  FROM t
)
SELECT gram, count(*) AS n_docs
FROM g GROUP BY gram HAVING count(*) >= 2
ORDER BY n_docs DESC, gram LIMIT 20
"""


@query(
    "q_top_dup_spans",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 200
    ), g AS (
      SELECT doc_id, unnest(CASE WHEN len(toks) >= 5 THEN
               list_distinct(list_transform(range(1, len(toks) - 3),
                 i -> array_to_string(list_slice(toks, i, i + 4), ' ')))
             ELSE [] END) AS gram
      FROM t
    )
    SELECT gram, count(*) AS n_docs
    FROM g GROUP BY gram HAVING count(*) >= 2
    ORDER BY n_docs DESC, gram LIMIT 20
    """,
)
def q_top_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-extra — the 20 most widely-shared token 5-grams with their doc
    counts: `q_dup_spans` tells a curator HOW MUCH is duplicated, this
    shows WHAT (the concrete boilerplate strings to blocklist). The total
    ORDER BY (count desc, gram) makes the LIMIT deterministic under the
    multiset hash compare; Spark executes it as TakeOrderedAndProject (a
    per-partition top-k merged on the driver — no global sort), so the
    same query is the scale form too."""
    table(spark, sf_dir, "documents")
    return spark.sql(_TOP_DUP_SPANS_SPARK)
