"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over kube_etl_spark: the registry (kube_etl_spark/registry.py)
is the single source of truth for the declared query list (SURVEY.md §2);
this module only adapts it to the driver's three-function contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kube_etl_spark import registry
from kube_etl_spark.session import configure

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    configure(spark)
    return registry.all_queries()["q_agg_groupby"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: _wrap(fn) for name, fn in registry.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (rows-only ops omitted)."""
    return registry.all_oracles()
