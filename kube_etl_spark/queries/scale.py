"""Scale-technique operators: skew mitigation and co-location patterns.

These register the 100 TB survival tricks as first-class, oracle-checked
operators: the salted join must produce byte-identical results to the
plain join (the technique changes the PHYSICAL plan only). The
plan-shape guarantees (no extra exchange, broadcast where expected,
pushdown reaching the scan) are asserted in tests/test_planshape.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exact import dsum, dsum_sql, money_sql
from ..registry import query

_N_SALTS = 8


def salted_join(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str, n_salts: int = _N_SALTS
) -> DataFrame:
    """Inner equi-join with key salting: the fact side gets a
    deterministic salt in [0, n_salts); the dim side is replicated
    n_salts× so every (key, salt) bucket finds its match. Splits one
    hot key's rows across n_salts reducers — the standard fix when one
    key holds a disproportionate share of a 100 TB fact table and AQE's
    skew splitting can't help (e.g. a subsequent groupBy on the key).
    Result set is identical to the plain join (salting is physical).

    The salt hashes the fact row's VALUES (all columns), never
    monotonically_increasing_id: mid's value depends on partition
    numbering, so a retried/recomputed stage would re-salt rows
    differently — results stay correct, but per-row routing becomes
    nondeterministic across retries, which turns idempotent downstream
    MERGE debugging into archaeology (VERDICT r2 #2). A value hash is
    stable under recomputation; rows identical in every column share a
    salt, which only matters if the hot key's rows are also near-total
    duplicates (then dedup first)."""
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[fact[c] for c in fact.columns]), F.lit(n_salts))
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(
        replicated_dim,
        (salted_fact[fact_key] == replicated_dim[dim_key])
        & (salted_fact["__salt"] == replicated_dim["__salt"]),
    ).drop("__salt")


@query(
    "q_join_skew_salted",
    tags=("J1", "skew"),
    oracle=f"""
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       {dsum_sql(money_sql('l_extendedprice'))} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join — must match the plain-join oracle exactly
    (the salt changes partitioning, never results)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        salted_join(li, orders, "l_orderkey", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice").cast("decimal(14,2)")).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_agg_two_phase",
    tags=("A1", "skew"),
    oracle="""
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_agg_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase distinct under a skewed group key: first aggregate on
    (group, value) — spreading one hot group over many reducers — then
    count per group. Equivalent to COUNT(DISTINCT) but with bounded
    per-reducer load; the shape to use when one group dominates."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_partkey")
        .filter(F.col("l_partkey").isNotNull())  # COUNT(DISTINCT) excludes NULLs
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("l_returnflag")
    )
