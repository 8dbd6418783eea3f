"""UDF / UDAF / UDTF surface (SURVEY.md §2.8, U1-U4).

The reference has no user-extensibility hook (its config enum is closed,
/root/reference/syncer/api/v1alpha1/krmsyncer_types.go:37); this is the
EXT surface the LLM-pipeline ops build on.

Scale notes — the UDF performance ladder, worst to best:
  * U1 row-at-a-time Python UDF: one Python call per row, pickled rows.
    Registered for completeness; NEVER in a hot path (its own docstring
    shows the builtin equivalent Catalyst would codegen).
  * U2 pandas_udf / U3 applyInPandas: Arrow-batched, vectorized numpy —
    the right Python escape hatch. U3 additionally shuffles on the
    group key (each group must fit in one executor's memory — at 100 TB
    that means grouping keys with bounded cardinality per group, or
    pre-splitting).
  * U4 UDF-returned array + explode: the table-function shape; the
    explode itself is JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import load_table
from ..registry import query


@query(
    "q_udf_scalar",
    tags=("U1",),
    oracle="""
SELECT doc_id,
       COALESCE(NULLIF(lang, ''), 'und') || '/' || source || '/'
         || CAST(doc_id AS VARCHAR) || '.json' AS path
FROM documents
WHERE doc_id < 100
ORDER BY doc_id
""",
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: scalar Python UDF — the export path derivation (P3,
    /root/reference/pkg/export/export.go:136-150: empty segment gets a
    default, then join with '/'), deliberately as a row-at-a-time UDF.
    The builtin twin is q_case_coalesce_concat; this one exists to
    declare the UDF surface."""

    @F.udf(returnType=StringType())
    def derive_path(lang: str, source: str, doc_id: int) -> str | None:
        if source is None or doc_id is None:
            return None  # match SQL || propagation, never the string "None"
        lang = lang if lang else "und"  # the ""→default trick (export.go:137-145)
        return f"{lang}/{source}/{doc_id}.json"

    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", derive_path("lang", "source", "doc_id").alias("path"))
        .orderBy("doc_id")
    )


@query(
    "q_udf_pandas",
    tags=("U2",),
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_unique
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
""",
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: vectorized pandas UDF (Arrow batches) — tokenize and count;
    one Python invocation per batch, not per row."""

    @F.pandas_udf(LongType())
    def n_tokens(text: pd.Series) -> pd.Series:
        return text.str.split(" ").str.len().astype("int64")

    @F.pandas_udf(LongType())
    def n_unique(text: pd.Series) -> pd.Series:
        return text.str.split(" ").map(lambda t: len(set(t))).astype("int64")

    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", n_tokens("text").alias("n_tokens"), n_unique("text").alias("n_unique"))
        .orderBy("doc_id")
    )


@query(
    "q_udaf_grouped_map",
    tags=("U3",),
    oracle="""
SELECT c_custkey,
       c_mktsegment,
       ROUND((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_mktsegment))
             / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 4) AS zscore
FROM customer
WHERE c_custkey <= 500
ORDER BY c_custkey
""",
)
def q_udaf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: grouped-map applyInPandas — per-segment z-score computed in
    pandas (ddof=1, matching stddev_samp). The group-by shuffle brings
    each segment to one worker; the SQL-window twin in the oracle is
    what Catalyst would run natively."""
    schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_mktsegment", StringType()),
            StructField("zscore", DoubleType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"]
        z = ((bal - bal.mean()) / bal.std(ddof=1)).round(4)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"].astype("int64"),
                "c_mktsegment": pdf["c_mktsegment"],
                "zscore": z,
            }
        )

    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 500)
        .select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
        )
        .groupBy("c_mktsegment")
        .applyInPandas(zscore, schema)
        .orderBy("c_custkey")
    )


@query(
    "q_udtf_explode",
    tags=("U4",),
    oracle="""
WITH bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(string_split(text, ' '))),
                i -> string_split(text, ' ')[i] || '_' || string_split(text, ' ')[i+1]))
           AS bigram
  FROM documents WHERE doc_id < 50
)
SELECT bigram, COUNT(*) AS n
FROM bi
GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT 15
""",
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: table function (1 row → N rows) — a Python UDF returns the
    bigram array, explode() fans it out JVM-side."""

    @F.udf(returnType=ArrayType(StringType()))
    def bigrams(text: str) -> list[str]:
        toks = text.split(" ")
        return [f"{a}_{b}" for a, b in zip(toks, toks[1:])]

    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select(F.explode(bigrams("text")).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(15)
    )
