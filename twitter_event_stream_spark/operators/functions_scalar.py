"""H — scalar function families: string / regex / date / math / array /
map / JSON / null / hash / cast (SURVEY §2.2.H).

All expressions are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; no Python crosses the row path, so these run at
columnar-scan speed at any scale. Known cross-engine traps handled here:
- Spark ``ceil``/``floor`` return LONG, DuckDB DOUBLE → oracle casts;
- Spark ``dayofweek`` is 1=Sunday vs DuckDB 0=Sunday → avoided (SURVEY H4);
- double→string casts differ in repr → never emitted;
- DuckDB ``epoch()`` returns fractional seconds → ``floor(...)`` to match
  Spark's truncating ``unix_timestamp``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_event_stream_spark.exprs import R, rnd
from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import table


@query(
    "q_str_basic",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           trim(concat('  ', p_name, '  ')) AS name_trim,
           substring(p_name, 1, 5) AS name_pfx,
           concat(p_name, '|', p_brand) AS name_brand,
           length(p_name) AS name_len,
           lpad(p_brand, 12, '*') AS brand_pad,
           replace(p_name, ' ', '_') AS name_us,
           len(string_split(p_name, ' ')) AS n_words
    FROM part
    """,
)
def q_str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 — lower/upper/trim/substring/concat/length/lpad/replace/split."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat(F.col("p_name"), F.lit("|"), F.col("p_brand")).alias("name_brand"),
        F.length("p_name").alias("name_len"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.regexp_replace("p_name", " ", "_").alias("name_us"),
        F.size(F.split("p_name", " ")).alias("n_words"),
    )


@query(
    "q_str_regexp",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS brand_no_str,
           CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INTEGER) AS brand_no,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_novowel
    FROM part
    WHERE regexp_matches(p_name, '^(red|blue) ')
    """,
)
def q_str_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 — regexp_extract / regexp_replace / regexp predicate. Note DuckDB
    regexp_replace needs the 'g' flag to match Spark's replace-all."""
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").rlike("^(red|blue) ")).select(
        "p_partkey",
        F.regexp_extract("p_brand", "Brand#([0-9]+)", 1).alias("brand_no_str"),
        F.regexp_extract("p_brand", "Brand#([0-9]+)", 1)
        .cast("int")
        .alias("brand_no"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_novowel"),
    )


@query(
    "q_str_levenshtein",
    oracle="""
    SELECT n_nationkey, n_name,
           levenshtein(n_name, 'NATION_12') AS dist,
           levenshtein(lower(n_name), 'nation') AS dist2
    FROM nation
    """,
)
def q_str_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 — edit distance (dedup/fuzzy-match building block)."""
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        "n_name",
        F.levenshtein(F.col("n_name"), F.lit("NATION_12")).alias("dist"),
        F.levenshtein(F.lower("n_name"), F.lit("nation")).alias("dist2"),
    )


@query(
    "q_date_parts",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           hour(o_orderdate) AS h,
           date_trunc('month', o_orderdate)::TIMESTAMP AS month_ts,
           datediff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
           o_orderdate + INTERVAL 7 DAY AS plus_week
    FROM orders
    WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    """,
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 — date parts, truncation, datediff, interval arithmetic.
    (`dayofweek` deliberately avoided: Spark 1=Sunday vs DuckDB 0=Sunday.)"""
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    )
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.hour("o_orderdate").alias("h"),
        F.date_trunc("month", "o_orderdate").alias("month_ts"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_y2k"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("plus_week"),
    )


@query(
    "q_math",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {R('ln(l_extendedprice)', 6)} AS ln_price,
           {R('sqrt(l_quantity)', 6)} AS sqrt_qty,
           {R('exp(l_discount)', 6)} AS exp_disc,
           {R('abs(l_quantity - 25)', 2)} AS abs_dev,
           CAST(ceil(l_discount * 100) AS BIGINT) AS ceil_disc,
           CAST(floor(l_tax * 100) AS BIGINT) AS floor_tax,
           {R('power(2, l_linenumber % 4)', 2)} AS pow2,
           l_orderkey % 7 AS mod7
    FROM lineitem
    WHERE l_orderkey % 10 = 3
    """,
)
def q_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5 — ln/sqrt/exp/abs/ceil/floor/pow/pmod (keys positive, so pmod ≡ %).
    Spark ceil/floor return LONG; the oracle casts DuckDB's DOUBLE to match."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 3)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rnd(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        rnd(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        rnd(F.exp("l_discount"), 6).alias("exp_disc"),
        rnd(F.abs(F.col("l_quantity") - 25), 2).alias("abs_dev"),
        F.ceil(F.col("l_discount") * 100).alias("ceil_disc"),
        F.floor(F.col("l_tax") * 100).alias("floor_tax"),
        rnd(F.pow(F.lit(2), F.col("l_linenumber") % 4), 2).alias("pow2"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("mod7"),
    )


@query(
    "q_array_basic",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           list_contains(string_split(text, ' '), 'join') AS has_join,
           len(list_distinct(string_split(text, ' '))) AS n_uniq,
           coalesce(array_to_string(
             list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 3),
             '|'), '') AS first3
    FROM documents
    """,
)
def q_array_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6 — size / array_contains / array_distinct / sort_array / slice.
    The slice result is serialized with concat_ws (driver's pandas hasher
    cannot canonicalize ndarray cells); the array ops run unchanged."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "join").alias("has_join"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.concat_ws(
            "|", F.slice(F.sort_array(F.array_distinct(toks)), 1, 3)
        ).alias("first3"),
    )


@query(
    "q_array_hof",
    oracle=f"""
    SELECT vec_id, label,
           {R('list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])', 6)} AS dot_self,
           len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_pos,
           {R('list_sum(embedding::DOUBLE[])', 6)} AS sum_comp,
           {R('list_sum(list_transform(embedding::DOUBLE[], x -> abs(x)))', 6)} AS l1_norm
    FROM embeddings
    """,
)
def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H7 — higher-order functions: transform / filter / aggregate / zip_with.
    The zip_with+aggregate dot product is the engine's vector primitive
    (shared with K4/K6); both engines fold sequentially so doubles match."""
    e = table(spark, sf_dir, "embeddings")
    ed = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    dot = F.expr(
        "aggregate(zip_with(transform(embedding, x -> CAST(x AS DOUBLE)),"
        " transform(embedding, x -> CAST(x AS DOUBLE)), (x, y) -> x * y),"
        " 0D, (acc, v) -> acc + v)"
    )
    return e.select(
        "vec_id",
        "label",
        rnd(dot, 6).alias("dot_self"),
        F.size(F.filter(ed, lambda x: x > 0)).alias("n_pos"),
        rnd(F.aggregate(ed, F.lit(0.0), lambda acc, v: acc + v), 6).alias("sum_comp"),
        rnd(
            F.aggregate(
                F.transform(ed, lambda x: F.abs(x)), F.lit(0.0), lambda a, v: a + v
            ),
            6,
        ).alias("l1_norm"),
    )


@query(
    "q_explode",
    oracle="""
    SELECT doc_id,
           unnest(generate_series(1, len(l))) - 1 AS pos,
           unnest(l) AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS l
          FROM documents WHERE doc_id < 50) t
    """,
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H8 — posexplode (lateral flatten with position); DuckDB reconstructs
    positions with zipped unnests."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


@query(
    "q_map_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           len(json_keys(props)) AS n_keys
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 90
    """,
)
def q_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H9 — MapType: parse JSON props into map<string,int>, element_at,
    map cardinality as a filterable value."""
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return (
        ev.select(
            "event_id",
            F.element_at(m, "k").alias("k_val"),
            F.size(m).alias("n_keys"),
        )
        .filter(F.col("k_val") >= 90)
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_last
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H10 — get_json_object / from_json struct field extraction."""
    ev = table(spark, sf_dir, "events")
    k_int = F.from_json("props", "k int").getField("k")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        k_int.alias("k_int"),
        (k_int % 10).alias("k_last"),
    )


@query(
    "q_null_funcs",
    oracle=f"""
    SELECT o_orderkey,
           {R('coalesce(s.max_qty, -1.0)', 2)} AS qty_or_default,
           nullif(o_orderstatus, 'O') AS status_nullif,
           (s.max_qty IS NULL) AS is_missing,
           CASE WHEN s.max_qty IS NULL THEN 'none' ELSE 'some' END AS bucket
    FROM orders o
    LEFT JOIN (
      SELECT l_orderkey, max(l_quantity) AS max_qty
      FROM lineitem WHERE l_quantity > 45 GROUP BY l_orderkey
    ) s ON o.o_orderkey = s.l_orderkey
    """,
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H11 — coalesce/nullif/isnull over deliberately manufactured nulls
    (fixture data is null-free — SURVEY C8)."""
    o = table(spark, sf_dir, "orders")
    s = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .groupBy("l_orderkey")
        .agg(F.max("l_quantity").alias("max_qty"))
    )
    j = o.join(s, o.o_orderkey == s.l_orderkey, "left")
    return j.select(
        "o_orderkey",
        rnd(F.coalesce("max_qty", F.lit(-1.0)), 2).alias("qty_or_default"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_nullif"),
        F.isnull("max_qty").alias("is_missing"),
        F.when(F.isnull("max_qty"), "none").otherwise("some").alias("bucket"),
    )


@query(
    "q_hash_md5",
    oracle="""
    SELECT doc_id, md5(text) AS h,
           substring(md5(concat(lang, ':', text)), 1, 8) AS salted_pfx
    FROM documents
    """,
)
def q_hash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H12 — content hashing (exact-dedup building block; md5 is portable,
    xxhash64 is Spark-only and never appears in oracle queries)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h"),
        F.substring(
            F.md5(F.concat(F.col("lang"), F.lit(":"), F.col("text"))), 1, 8
        ).alias("salted_pfx"),
    )


@query(
    "q_cast",
    oracle="""
    SELECT event_id,
           CAST(floor(value) AS BIGINT) AS value_int,
           CAST(user_id AS VARCHAR) AS user_str,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS day_str,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS unix_sec
    FROM events
    """,
)
def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H13 — casts. Traps documented in the module docstring: double→int via
    explicit floor (DuckDB CAST rounds, Spark truncates); double→string
    never emitted; unix seconds floored on both sides."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.floor("value").alias("value_int"),
        F.col("user_id").cast("string").alias("user_str"),
        F.col("ts").cast("date").cast("string").alias("day_str"),
        F.unix_timestamp("ts").alias("unix_sec"),
    )


@query(
    "q_json_variant",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           floor((avg(CAST(json_extract(props, '$.k') AS BIGINT))) * 1000000 + 0.505) / 1000000 AS avg_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-extra — Spark 4 VariantType path for semi-structured data:
    parse_json once into the binary Variant encoding, then typed
    variant_get extraction (the open-format successor to
    get_json_object string re-parsing — parse once, extract many, columnar
    shredding at rest). Same result contract as H10 but through the modern
    codepath."""
    ev = table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            rnd(F.avg("k"), 6).alias("avg_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )
