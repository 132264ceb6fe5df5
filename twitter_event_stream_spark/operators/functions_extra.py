"""X2x — extended function surface beyond the original §2.2 contract:
regression aggregates, bool/bit aggregates, ordered string aggregation,
trig/log math, extra string/date scalars, array set algebra, nth_value
windows, median + deterministic mode, try-arithmetic, and sample-corrected
skewness/kurtosis.

Everything here is built-in ``pyspark.sql.functions`` / Spark SQL — JVM-side,
whole-stage-codegen'd, shuffle-free except the group-by aggregates (which
plan partial→final automatically). At 100 TB each query is a single scan +
one hash-agg or window exchange on bounded-cardinality keys.

Cross-dialect notes (all probed MATCH at sf0.001 before registration):
- ``sign`` returns DOUBLE in Spark, INT in DuckDB → cast INT on the Spark
  side;
- DuckDB lacks ``initcap`` → omitted from the string family;
- DuckDB's parquet reader types ``o_orderdate`` TIMESTAMP and rejects
  ``date + int`` → oracle uses ``+ INTERVAL 45 DAY`` then casts DATE;
- Spark ``skewness``/``kurtosis`` are population (g1/g2) while DuckDB's are
  sample-adjusted (G1/G2) → the oracle inverts the bias correction with the
  group count: g1 = G1·(n−2)/√(n(n−1)), g2 = (G2·(n−2)(n−3)/(n−1) − 6)/(n+1);
- mode has no deterministic tie rule in either engine → composed as
  count→max_by over an order key ``lpad(count)||value`` (identical in both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_event_stream_spark.exprs import R, rnd
from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import table


@query(
    "q_agg_regr",
    oracle=f"""
    SELECT event_type,
           {R('regr_slope(value, user_id)', 6)} AS slope,
           {R('regr_intercept(value, user_id)', 6)} AS intercept,
           {R('regr_r2(value, user_id)', 6)} AS r2,
           regr_count(value, user_id) AS n_pairs,
           {R('regr_avgx(value, user_id)', 6)} AS avg_x,
           {R('regr_avgy(value, user_id)', 6)} AS avg_y,
           {R('regr_sxx(value, user_id)', 2)} AS sxx,
           {R('regr_sxy(value, user_id)', 2)} AS sxy
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (slope/intercept/r²/moments) per group —
    one-pass partial-aggregable moments, so Spark plans partial→final with
    map-side combine; no extra shuffle beyond the group-by."""
    ev = table(spark, sf_dir, "events")
    y, x = F.col("value"), F.col("user_id")
    return ev.groupBy("event_type").agg(
        rnd(F.regr_slope(y, x), 6).alias("slope"),
        rnd(F.regr_intercept(y, x), 6).alias("intercept"),
        rnd(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).alias("n_pairs"),
        rnd(F.regr_avgx(y, x), 6).alias("avg_x"),
        rnd(F.regr_avgy(y, x), 6).alias("avg_y"),
        rnd(F.regr_sxx(y, x), 2).alias("sxx"),
        rnd(F.regr_sxy(y, x), 2).alias("sxy"),
    )


@query(
    "q_agg_bool_bit",
    oracle="""
    SELECT event_type,
           bool_and(value > 0) AS all_pos,
           bool_or(value > 500) AS any_big,
           bit_and(user_id) AS band,
           bit_or(user_id) AS bor,
           bit_xor(user_id) AS bxor
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_bool_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean and bitwise aggregates — commutative/associative, fully
    partial-aggregable (a 3-word accumulator per group at any scale)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bool_and(F.col("value") > 0).alias("all_pos"),
        F.bool_or(F.col("value") > 500).alias("any_big"),
        F.bit_and("user_id").alias("band"),
        F.bit_or("user_id").alias("bor"),
        F.bit_xor("user_id").alias("bxor"),
    )


@query(
    "q_listagg",
    oracle="""
    SELECT o_orderstatus,
           string_agg(o_orderpriority, '|' ORDER BY o_orderpriority, o_orderkey) AS pri_list
    FROM orders
    WHERE o_orderkey < 300
    GROUP BY o_orderstatus
    """,
)
def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg WITHIN GROUP ↔ string_agg ORDER
    BY). Ordered with a unique tiebreaker (C3) so the concatenation is a
    deterministic value, not just a deterministic set."""
    table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               listagg(o_orderpriority, '|')
                 WITHIN GROUP (ORDER BY o_orderpriority, o_orderkey) AS pri_list
        FROM orders
        WHERE o_orderkey < 300
        GROUP BY o_orderstatus
        """
    )


@query(
    "q_math_trig",
    oracle=f"""
    SELECT p_partkey,
           {R('sin(p_retailprice)', 6)} AS s,
           {R('cos(p_retailprice)', 6)} AS c,
           {R('atan2(p_retailprice, p_size)', 6)} AS a2,
           {R('log10(p_retailprice)', 6)} AS l10,
           {R('log2(p_retailprice)', 6)} AS l2,
           {R('cbrt(p_retailprice)', 6)} AS cb,
           sign(p_size - 25) AS sg,
           {R('degrees(1.0)', 6)} AS deg1,
           {R('radians(p_size)', 6)} AS rad
    FROM part
    """,
)
def q_math_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trig/log scalar math, rounded 6dp (C2). ``sign`` is DOUBLE in Spark
    vs INT in DuckDB — cast INT here."""
    p = table(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        rnd(F.sin(price), 6).alias("s"),
        rnd(F.cos(price), 6).alias("c"),
        rnd(F.atan2(price, F.col("p_size").cast("double")), 6).alias("a2"),
        rnd(F.log10(price), 6).alias("l10"),
        rnd(F.log2(price), 6).alias("l2"),
        rnd(F.cbrt(price), 6).alias("cb"),
        F.signum(F.col("p_size") - 25).cast("int").alias("sg"),
        rnd(F.degrees(F.lit(1.0)), 6).alias("deg1"),
        rnd(F.radians("p_size"), 6).alias("rad"),
    )


@query(
    "q_str_extra",
    oracle="""
    SELECT p_partkey,
           reverse(p_brand) AS rev,
           repeat(p_brand, 2) AS rep,
           ascii(p_name) AS asc0,
           strpos(p_name, 'a') AS pos_a,
           translate(p_name, 'aeiou', '01234') AS xlat,
           right(p_name, 4) AS sfx,
           left(p_name, 3) AS pfx,
           rpad(p_brand, 12, '.') AS padded
    FROM part
    """,
)
def q_str_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family: reverse/repeat/ascii/instr/translate/right/left/
    rpad (DuckDB has no ``initcap`` — omitted)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.reverse("p_brand").alias("rev"),
        F.repeat("p_brand", 2).alias("rep"),
        F.ascii("p_name").alias("asc0"),
        F.instr("p_name", "a").alias("pos_a"),
        F.translate("p_name", "aeiou", "01234").alias("xlat"),
        F.substring(F.col("p_name"), -4, 4).alias("sfx"),
        F.substring(F.col("p_name"), 1, 3).alias("pfx"),
        F.rpad("p_brand", 12, ".").alias("padded"),
    )


@query(
    "q_date_extra",
    oracle="""
    SELECT o_orderkey,
           quarter(o_orderdate) AS q,
           dayofyear(o_orderdate) AS doy,
           weekofyear(o_orderdate) AS woy,
           last_day(o_orderdate) AS eom,
           (o_orderdate + INTERVAL 45 DAY)::DATE AS plus45
    FROM orders
    """,
)
def q_date_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date family: quarter / dayofyear / ISO weekofyear / last_day /
    date arithmetic. DuckDB types the parquet column TIMESTAMP and rejects
    ``date + int``, so the oracle adds an INTERVAL and casts DATE."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("q"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.weekofyear("o_orderdate").alias("woy"),
        F.last_day("o_orderdate").alias("eom"),
        F.date_add("o_orderdate", 45).alias("plus45"),
    )


@query(
    "q_array_setops",
    oracle="""
    SELECT p_partkey,
           coalesce(array_to_string(list_sort(list_distinct(list_cat(string_split(p_name, ' '),
                                            string_split(p_brand, '#')))), '|'), '') AS u,
           coalesce(array_to_string(list_sort(list_distinct(list_intersect(string_split(p_name, ' '),
                                                  ['a', 'of']))), '|'), '') AS i,
           coalesce(array_to_string(list_sort(list_distinct(list_filter(string_split(p_name, ' '),
                                               x -> x NOT IN ('of', 'the')))), '|'), '') AS e,
           coalesce(array_to_string(list_sort(flatten([string_split(p_brand, '#'), ['x']])), '|'), '') AS fl,
           coalesce(array_to_string(generate_series(1, p_size % 4 + 1), '|'), '') AS seq
    FROM part
    """,
)
def q_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: union/intersect/except (distinct semantics, output
    sorted per C4), flatten, and sequence generation. All JVM higher-order /
    collection expressions — zero Python, zero shuffle. Outputs are
    concat_ws-serialized (driver's pandas hasher cannot canonicalize
    ndarray cells); the array ops themselves run unchanged."""
    p = table(spark, sf_dir, "part")
    name_toks = F.split("p_name", " ")
    brand_toks = F.split("p_brand", "#")
    j = lambda c: F.concat_ws("|", c)  # noqa: E731
    return p.select(
        "p_partkey",
        j(F.sort_array(F.array_union(name_toks, brand_toks))).alias("u"),
        j(F.sort_array(F.array_intersect(name_toks, F.array(F.lit("a"), F.lit("of"))))).alias("i"),
        j(
            F.sort_array(
                F.array_except(name_toks, F.array(F.lit("of"), F.lit("the")))
            )
        ).alias("e"),
        j(F.sort_array(F.flatten(F.array(brand_toks, F.array(F.lit("x")))))).alias("fl"),
        j(F.sequence(F.lit(1), F.col("p_size") % 4 + 1)).alias("seq"),
    )


@query(
    "q_win_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           nth_value(o_orderpriority, 3) OVER w AS third_pri
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over a full-partition frame, unique ORDER BY key (C3).
    Per-customer partitions are tiny and uniformly distributed — the single
    window exchange hashes on o_custkey and never skews."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.nth_value("o_orderpriority", 3).over(w).alias("third_pri"),
    )


@query(
    "q_agg_median_mode",
    oracle=f"""
    WITH c AS (
        SELECT user_id % 10 AS bucket, event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT user_id % 10 AS bucket, {R('median(value)', 6)} AS med
        FROM events GROUP BY 1
    )
    SELECT m.bucket, m.med,
           arg_max(c.event_type, lpad(c.n::VARCHAR, 10, '0') || c.event_type) AS modal_type
    FROM m JOIN c ON m.bucket = c.bucket
    GROUP BY m.bucket, m.med
    """,
)
def q_agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (interpolating, both engines) + modal value. Neither
    engine defines mode's tie rule, so the mode is composed deterministically:
    count per (group, value) then max_by over the order key
    ``lpad(count)||value`` — highest count wins, lexicographically-last value
    breaks ties, identically in both engines."""
    ev = table(spark, sf_dir, "events").withColumn("bucket", F.col("user_id") % 10)
    counts = ev.groupBy("bucket", "event_type").agg(F.count(F.lit(1)).alias("n"))
    med = ev.groupBy("bucket").agg(rnd(F.median("value"), 6).alias("med"))
    key = F.concat(F.lpad(F.col("n").cast("string"), 10, "0"), F.col("event_type"))
    modal = counts.groupBy("bucket").agg(F.max_by("event_type", key).alias("modal_type"))
    return med.join(modal, "bucket").select("bucket", "med", "modal_type")


@query(
    "q_try_arith",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE o_totalprice / (o_orderkey % 3) END AS safe_div,
           TRY_CAST(o_orderpriority AS INT) AS bad_cast,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS pri_num
    FROM orders
    """,
)
def q_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic: try_divide → NULL on zero denominator,
    try_cast → NULL on malformed input ('1-URGENT' fails, its leading digit
    parses). The oracle spells the same semantics with CASE/TRY_CAST.

    The failing-string cast is regex-guarded (r16, guide §1.2 "per-task
    work"): a FAILED ANSI string→int cast constructs a formatted
    SparkRuntimeException per row before TRY absorbs it — measured
    ~13 µs/row, 1.86 s over sf0.1 `orders` vs 0.13 s guarded, and pure
    per-row overhead at any scale. The guard is a strict SUPERSET of the
    cast's accept grammar (trim of [\\x00-\\x20] control chars + optional
    sign + ASCII digits — verified cell-by-cell against bare try_cast on
    an adversarial battery incl. control chars, unicode digits/spaces,
    overflow: 0 disagreements), so matching strings still go through the
    REAL try_cast (identical values, incl. overflow→NULL) and only
    guaranteed-NULL rows skip the throwing path. `pri_num`'s cast input
    always parses (leading digit), so it keeps the bare try_cast — its
    exception path never fires."""
    o = table(spark, sf_dir, "orders")
    int_like = "^[\\x00-\\x20]*[+-]?[0-9]+[\\x00-\\x20]*$"
    return o.select(
        "o_orderkey",
        F.try_divide("o_totalprice", F.col("o_orderkey") % 3).alias("safe_div"),
        F.when(
            F.col("o_orderpriority").rlike(int_like),
            F.col("o_orderpriority").try_cast("int"),
        ).alias("bad_cast"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("pri_num"),
    )


@query(
    "q_agg_skew_kurt",
    oracle=f"""
    SELECT event_type,
           {R('skewness(value) * (count(*) - 2) / sqrt(count(*) * (count(*) - 1.0))', 6)} AS skew,
           {R('(kurtosis(value) * (count(*) - 2.0) * (count(*) - 3.0) / (count(*) - 1.0) - 6.0) / (count(*) + 1.0)', 6)} AS kurt
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness/kurtosis. Spark computes population moments (g1, excess g2);
    DuckDB computes sample-adjusted (G1, G2) — the oracle inverts DuckDB's
    bias correction with the group count: g1 = G1·(n−2)/√(n(n−1)),
    g2 = (G2·(n−2)(n−3)/(n−1) − 6)/(n+1). Probed MATCH before registration."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        rnd(F.skewness("value"), 6).alias("skew"),
        rnd(F.kurtosis("value"), 6).alias("kurt"),
    )


@query(
    "q_scalar_misc",
    oracle="""
    SELECT p_partkey,
           greatest(p_size, 25) AS hi,
           least(p_size, 25) AS lo,
           hex(p_size) AS size_hex,
           bit_count(p_size::BIGINT) AS pop,
           CAST(factorial(p_size % 10) AS BIGINT) AS fact,
           decode(unhex(hex(p_brand::BLOB))) AS roundtrip,
           to_base64(p_brand::BLOB) AS b64
    FROM part
    """,
)
def q_scalar_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misc scalar batch: greatest/least, hex/unhex roundtrip, popcount,
    factorial, base64 — all JVM codegen. (DuckDB 1.0 lacks ``width_bucket``;
    equal-width bucketing ships as explicit floor arithmetic in
    q_histogram instead.) The hex→unhex roundtrip is decoded back to a
    string on output: a raw binary column arrives as an unhashable
    bytearray in the driver's pandas canonicalizer and crashes it."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.greatest(F.col("p_size"), F.lit(25)).alias("hi"),
        F.least(F.col("p_size"), F.lit(25)).alias("lo"),
        F.hex(F.col("p_size")).alias("size_hex"),
        F.bit_count(F.col("p_size").cast("bigint")).alias("pop"),
        F.factorial(F.col("p_size") % 10).alias("fact"),
        F.decode(F.unhex(F.hex(F.col("p_brand").cast("binary"))), "UTF-8").alias(
            "roundtrip"
        ),
        F.base64(F.col("p_brand").cast("binary")).alias("b64"),
    )
