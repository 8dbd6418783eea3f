"""Scalar function families (SURVEY.md §2.7, F1-F8).

The reference's scalar repertoire is strings.Contains/HasSuffix/Split,
path concat, Sprintf, default-if-empty (/root/reference/syncer/
controllers/krmsyncer_controller.go:106,157,572; pkg/export/export.go:
137-150); everything beyond is EXT. All expressions here are JVM-side
builtins (whole-stage codegen — no Python in the hot path).

Cross-engine parity notes (Spark vs DuckDB oracle):
  * floor/ceil return LONG in Spark, DOUBLE in DuckDB → cast BIGINT.
  * size() is INT in Spark, len() BIGINT in DuckDB → cast.
  * pmod has no DuckDB builtin → ((x % m) + m) % m.
  * ln() may differ by 1 ulp across libm → ROUND(..., 6).
  * arrays are compared as joined strings (hash-stable across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "q_string_funcs",
    tags=("F1",),
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       substr(p_name, 1, 4) AS name_prefix,
       CAST(length(p_name) AS BIGINT) AS name_len,
       trim('  ' || p_name || ' ') AS name_trimmed,
       concat_ws('|', p_brand, p_type) AS brand_type,
       string_split(p_name, ' ')[1] AS first_word,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
       CAST(p_name LIKE '%wid%' AS INTEGER) AS is_widget
FROM part
WHERE p_partkey <= 400
ORDER BY p_partkey
""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: string functions — substr/case/trim/concat/split/regexp/like."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 400)
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.lower("p_brand").alias("brand_lower"),
            F.substring("p_name", 1, 4).alias("name_prefix"),
            F.length("p_name").cast("bigint").alias("name_len"),
            F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias(
                "name_trimmed"
            ),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
            F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
            F.col("p_name").like("%wid%").cast("int").alias("is_widget"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q_date_funcs",
    tags=("F2",),
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP_NS) AS month_start,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS BIGINT) AS days_to_2002,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec
FROM orders
WHERE o_orderkey <= 500
ORDER BY o_orderkey
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: date/time functions — year/month/trunc/diff/add_months/epoch."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.month("o_orderdate").cast("bigint").alias("order_month"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
            F.datediff(
                F.lit("2002-01-01").cast("timestamp_ntz"), F.col("o_orderdate")
            )
            .cast("long")
            .alias("days_to_2002"),
            F.date_format(F.add_months(F.col("o_orderdate"), 3), "yyyy-MM-dd").alias(
                "plus3mo"
            ),
            F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
            .alias("epoch_sec"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q_math_funcs",
    tags=("F3",),
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice) AS price_rounded,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
       ((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS key_mod7,
       sqrt(l_extendedprice) AS price_sqrt,
       round(ln(l_extendedprice + 1), 6) AS price_ln
FROM lineitem
WHERE l_orderkey <= 300
ORDER BY l_orderkey, l_linenumber
""",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: math functions — round/abs/floor/ceil/pmod/sqrt/ln.

    sqrt is IEEE correctly-rounded (identical everywhere); ln rounded
    to 6dp to absorb possible 1-ulp libm differences.
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 0).alias("price_rounded"),
            F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
            F.floor("l_quantity").alias("qty_floor"),
            F.ceil("l_quantity").alias("qty_ceil"),
            F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
            F.sqrt("l_extendedprice").alias("price_sqrt"),
            F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q_array_funcs",
    tags=("F4",),
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(list_contains(string_split(text, ' '), 'spark') AS INTEGER) AS has_spark,
       array_to_string(list_sort(list_distinct(string_split(substr(text, 1, 60), ' '))), ',') AS head_vocab
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
""",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: array functions — split/size/contains/distinct/sort, compared
    as joined strings so hashing is engine-stable."""
    toks = F.split(F.col("text"), " ")
    head_toks = F.split(F.substring(F.col("text"), 1, 60), " ")
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.array_contains(toks, "spark").cast("int").alias("has_spark"),
            F.array_join(F.array_sort(F.array_distinct(head_toks)), ",").alias(
                "head_vocab"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "q_map_funcs",
    tags=("F5",),
    oracle="""
SELECT event_id,
       array_to_string(
         list_sort(list_transform(
           map_entries(MAP {'type': event_type, 'user': CAST(user_id AS VARCHAR)}),
           e -> e.key || '=' || e.value)),
         ',') AS labels_str,
       CAST(cardinality(MAP {'type': event_type, 'user': CAST(user_id AS VARCHAR)}) AS BIGINT)
         AS n_labels,
       event_type AS type_label
FROM events
WHERE event_id < 300
ORDER BY event_id
""",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: map functions — labels/annotations-style string→string maps
    (krmsyncer_controller.go:568-569). The map is compared as a
    key-sorted joined string (maps are unordered; the sort makes the
    value-hash engine-stable), plus cardinality and element_at."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    labels = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    entries = F.array_sort(
        F.transform(
            F.map_entries(labels), lambda e: F.concat(e.key, F.lit("="), e.value)
        )
    )
    return ev.select(
        "event_id",
        F.array_join(entries, ",").alias("labels_str"),
        F.size(F.map_keys(labels)).cast("bigint").alias("n_labels"),
        F.element_at(labels, "type").alias("type_label"),
    ).orderBy("event_id")


@query(
    "q_json_funcs",
    tags=("F6",),
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
       CAST(json_extract_string(props, '$.missing') IS NULL AS INTEGER) AS missing_is_null
FROM events
WHERE event_id < 400
ORDER BY event_id
""",
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: JSON extraction from an open-content column (the
    preserve-unknown-fields analog: schema lives outside the engine)."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 400)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k_value"),
            F.get_json_object("props", "$.missing").isNull().cast("int").alias(
                "missing_is_null"
            ),
        )
        .orderBy("event_id")
    )


@query(
    "q_hash_funcs",
    tags=("F8",),
    oracle="""
SELECT c_custkey,
       md5(c_name) AS name_md5,
       sha256(c_name) AS name_sha256
FROM customer
WHERE c_custkey <= 300
ORDER BY c_custkey
""",
)
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: deterministic content hashes (the exact-dedup primitive)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 300)
        .select(
            "c_custkey",
            F.md5("c_name").alias("name_md5"),
            F.sha2("c_name", 256).alias("name_sha256"),
        )
        .orderBy("c_custkey")
    )


@query(
    "q_string_funcs2",
    tags=("F1",),
    oracle="""
SELECT doc_id,
       translate(substr(text, 1, 12), 'ae', '43') AS leeted,
       lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded_id,
       rpad(lang, 5, '.') AS padded_lang,
       repeat(lang, 2) AS lang2,
       reverse(substr(text, 1, 8)) AS rev8
FROM documents
WHERE doc_id < 100
ORDER BY doc_id
""",
)
def q_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1b: second string family — translate / lpad / rpad / repeat /
    reverse (all JVM builtins with exact DuckDB twins)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.translate(F.substring("text", 1, 12), "ae", "43").alias("leeted"),
            F.lpad(F.col("doc_id").cast("string"), 6, "0").alias("padded_id"),
            F.rpad("lang", 5, ".").alias("padded_lang"),
            F.repeat("lang", 2).alias("lang2"),
            F.reverse(F.substring("text", 1, 8)).alias("rev8"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_date_funcs2",
    tags=("F2",),
    oracle="""
SELECT o_orderkey,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
       CAST(date_part('week', o_orderdate) AS INTEGER) AS iso_week,
       CAST(date_part('quarter', o_orderdate) AS INTEGER) AS qtr
FROM orders
WHERE o_orderkey < 300
ORDER BY o_orderkey
""",
)
def q_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2b: second date family — last_day, ISO day-of-week (weekday+1),
    ISO week number, quarter."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 300)
        .select(
            "o_orderkey",
            F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
            (F.weekday("o_orderdate") + 1).cast("int").alias("iso_dow"),
            F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
            F.quarter("o_orderdate").cast("int").alias("qtr"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q_conditional_funcs",
    tags=("F7",),
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'mid' ELSE 'rich' END AS tier,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
       greatest(c_acctbal, 0.0) AS bal_floor0,
       least(CAST(c_nationkey AS DOUBLE), 10.0) AS nk_cap10
FROM customer
WHERE c_custkey <= 300
ORDER BY c_custkey
""",
)
def q_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: conditional family — CASE tiers, NULLIF+COALESCE defaulting
    (the ""→default trick from export.go:137-145), greatest/least."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 300)
        .select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "debt")
            .when(F.col("c_acctbal") < 5000, "mid")
            .otherwise("rich")
            .alias("tier"),
            F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
                "seg_or_other"
            ),
            F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor0"),
            F.least(F.col("c_nationkey").cast("double"), F.lit(10.0)).alias("nk_cap10"),
        )
        .orderBy("c_custkey")
    )


@query(
    "q_array_funcs2",
    tags=("F4",),
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE doc_id < 50)
SELECT doc_id,
       array_to_string(toks[1:5], ' ') AS first5,
       len(flatten([toks[1:3], toks[4:5]])) AS n_flat,
       array_to_string(list_reverse(toks[1:3]), '|') AS rev3,
       list_contains(toks, 'the') AS has_the,
       toks[-1] AS last_tok
FROM t
ORDER BY doc_id
""",
)
def q_array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4b: second array family — slice, flatten, reverse, contains,
    negative indexing (element_at(-1)).

    Output columns are all scalar: the sliced array is emitted through
    array_join (not raw array<string>) because the driver's correctness
    canonicalizer sorts rows by every column and cannot sort arrays.
    """
    toks = F.split(F.col("text"), " ")
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.array_join(F.slice(toks, 1, 5), " ").alias("first5"),
            F.size(F.flatten(F.array(F.slice(toks, 1, 3), F.slice(toks, 4, 2))))
            .cast("bigint")
            .alias("n_flat"),
            F.array_join(F.reverse(F.slice(toks, 1, 3)), "|").alias("rev3"),
            F.array_contains(toks, "the").alias("has_the"),
            F.element_at(toks, -1).alias("last_tok"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_regex_funcs",
    tags=("F1",),
    oracle="""
SELECT doc_id,
       regexp_replace(substr(text, 1, 40), '[aeiou]', '_', 'g') AS devoweled,
       len(regexp_extract_all(text, '\\b[a-z]{5}\\b')) AS n_5letter,
       regexp_matches(text, 'data.*table|table.*data') AS mentions_both,
       regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word
FROM documents
WHERE doc_id < 80
ORDER BY doc_id
""",
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1c: regex family — global replace, extract-all count, boolean
    match, group extraction. Patterns restricted to the RE2 ∩ Java
    common subset so both engines agree."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 80)
        .select(
            "doc_id",
            F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "_").alias(
                "devoweled"
            ),
            F.size(F.expr(r"regexp_extract_all(text, '\\b[a-z]{5}\\b', 0)"))
            .cast("bigint")
            .alias("n_5letter"),
            F.col("text").rlike("data.*table|table.*data").alias("mentions_both"),
            F.regexp_extract("text", "([a-z]+) ([a-z]+)", 2).alias("second_word"),
        )
        .orderBy("doc_id")
    )
