"""Sorts, limits, top-k and set operations (SURVEY.md §2.6, O1-O5).

All EXT — the reference never sorts (zip entries are written in
discovery order, /root/reference/pkg/export/export.go:111-163).

Scale notes: global ORDER BY is a range-partitioned sort (sampled
boundaries) — fine at scale; ORDER BY + LIMIT compiles to
TakeOrderedAndProject (per-partition heap + driver merge of k rows,
no global sort) — verify in .explain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "q_orderby_multi",
    tags=("O1",),
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal
FROM customer
WHERE c_acctbal > 9500 OR c_acctbal < -500
ORDER BY c_mktsegment ASC, c_acctbal DESC NULLS LAST, c_custkey ASC
""",
)
def q_orderby_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: multi-key sort with explicit nulls ordering. Thresholds
    chosen to keep rows at EVERY fixture SF (9990/-990 selected zero
    of sf0.001's 150 customers — a vacuous parity match)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_acctbal") > 9500) | (F.col("c_acctbal") < -500))
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .orderBy(
            F.col("c_mktsegment").asc(),
            F.col("c_acctbal").desc_nulls_last(),
            F.col("c_custkey").asc(),
        )
    )


@query(
    "q_topk",
    tags=("O2",),
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
""",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: top-k — compiles to TakeOrderedAndProject (no global sort)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@query(
    "q_union_all",
    tags=("O3",),
    oracle="""
SELECT k, name FROM (
  SELECT c_custkey AS k, c_name AS name FROM customer WHERE c_acctbal > 9900
  UNION ALL
  SELECT s_suppkey AS k, s_name AS name FROM supplier WHERE s_acctbal > 9900
)
ORDER BY k, name
""",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3a: UNION ALL (bag union, no dedup shuffle)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .select(F.col("c_custkey").alias("k"), F.col("c_name").alias("name"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9900)
        .select(F.col("s_suppkey").alias("k"), F.col("s_name").alias("name"))
    )
    return c.unionByName(s).orderBy("k", "name")


@query(
    "q_union_distinct",
    tags=("O3",),
    oracle="""
SELECT nk FROM (
  SELECT c_nationkey AS nk FROM customer
  UNION
  SELECT s_nationkey AS nk FROM supplier
)
ORDER BY nk
""",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3b: UNION DISTINCT (hash-dedup on the union)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionByName(s).distinct().orderBy("nk")


@query(
    "q_intersect",
    tags=("O4",),
    oracle="""
SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
INTERSECT
SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
ORDER BY nk
""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: INTERSECT (distinct semantics). The supplier threshold is
    LOWER than the customer one deliberately: sf0.001 has only 10
    suppliers, and a 9000-cut on both sides made the intersection EMPTY
    there — a vacuous 0=0 parity match (the q_scalar_subquery lesson);
    5000 keeps real rows at every fixture SF."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nk"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nk"))
    )
    return c.intersect(s).orderBy("nk")


@query(
    "q_except",
    tags=("O5",),
    oracle="""
SELECT o_custkey AS ck FROM orders
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
ORDER BY ck
""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: EXCEPT (distinct semantics) — ordering customers who are not
    high-balance. At the KEY grain deliberately: the old nation-grain
    version (25 values) went EMPTY at sf0.1 because every nation has a
    qualifying supplier there — a tiny value domain makes set
    difference degenerate at some SF (the vacuity trap, caught by the
    sf0.1 parity sweep); key-grain difference scales with the data at
    every SF (84 / 843 / 8055 rows)."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("ck"))
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("ck"))
    )
    return o.subtract(c).orderBy("ck")
