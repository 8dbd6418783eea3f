"""Aggregation operators (SURVEY.md §2.4, A1-A10). All EXT provenance:
the reference has no aggregation code (nearest analog is error-list
accumulation, /root/reference/pkg/export/export.go:99-167).

Flagship = q_agg_groupby, the TPC-H Q1 pricing summary: one wide scan →
map-side partial agg → tiny final agg. At 100 TB this is the canonical
"scan-heavy, shuffle-light" query: the shuffle carries only
(#groups × #partitions) rows, predicate `l_shipdate <=` is pushed to
parquet, and only 7 of 11 lineitem columns are read (column pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exact import davg, davg_sql, dsum, dsum_sql, money, money_sql, qty, rate, rate_sql
from ..registry import query

_Q1_CUTOFF = "1998-09-02 00:00:00"

# Exact-decimal term recipes shared by Spark and oracle (see exact.py).
_EXT = money_sql("l_extendedprice")
_DISC1 = f"(CAST(1 AS DECIMAL(3,0)) - {rate_sql('l_discount')})"
_TAX1 = f"(CAST(1 AS DECIMAL(3,0)) + {rate_sql('l_tax')})"


def _disc_price() -> F.Column:
    return money("l_extendedprice") * (F.lit(1).cast("decimal(3,0)") - rate("l_discount"))


def _charge() -> F.Column:
    return _disc_price() * (F.lit(1).cast("decimal(3,0)") + rate("l_tax"))


@query(
    "q_agg_groupby",
    bench=True,
    tags=("A1", "flagship"),
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dsum_sql(money_sql('l_quantity'))} AS sum_qty,
  {dsum_sql(_EXT)} AS sum_base_price,
  {dsum_sql(f'{_EXT} * {_DISC1}')} AS sum_disc_price,
  {dsum_sql(f'{_EXT} * {_DISC1} * {_TAX1}')} AS sum_charge,
  {davg_sql(money_sql('l_quantity'))} AS avg_qty,
  {davg_sql(_EXT)} AS avg_price,
  {davg_sql(rate_sql('l_discount'))} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 flagship: hash group-by with sum/avg/count (TPC-H Q1 shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(qty("l_quantity")).alias("sum_qty"),
            dsum(money("l_extendedprice")).alias("sum_base_price"),
            dsum(_disc_price()).alias("sum_disc_price"),
            dsum(_charge()).alias("sum_charge"),
            davg(qty("l_quantity")).alias("avg_qty"),
            davg(money("l_extendedprice")).alias("avg_price"),
            davg(rate("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_agg_global",
    tags=("A2",),
    oracle=f"""
SELECT
  {dsum_sql(money_sql('o_totalprice'))} AS total_revenue,
  {davg_sql(money_sql('o_totalprice'))} AS avg_order_value,
  COUNT(*) AS n_orders
FROM orders
""",
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: global (no-group) aggregate over orders."""
    return load_table(spark, sf_dir, "orders").agg(
        dsum(money("o_totalprice")).alias("total_revenue"),
        davg(money("o_totalprice")).alias("avg_order_value"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q_agg_count_distinct",
    tags=("A3",),
    oracle="""
SELECT
  o_orderpriority,
  COUNT(DISTINCT o_custkey) AS n_customers,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: distinct aggregate (expand-then-dedup under the hood)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )
