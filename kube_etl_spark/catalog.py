"""Fixture-table catalog: load + normalize the driver-generated parquet.

The reference enumerates its "catalog" via Kubernetes discovery
(ServerPreferredResources, /root/reference/pkg/export/export.go:98-128);
our catalog is the fixed fixture star schema described in FIXTURES.md §B.
``load_table`` is the single entry point every query uses, so type
normalization (ns-timestamp conversion, NTZ semantics) happens in exactly
one place.

Scale note: `spark.read.parquet` gives splittable, column-pruned,
predicate-pushdown scans for free; at 100 TB the same call reads a
partitioned directory tree — nothing here assumes single-file inputs.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .session import configure

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# ---------------------------------------------------------------------------
# Relation metadata cache (optimization r12, guide §6 "file listing").
#
# Measured: every bare `spark.read.parquet(path)` pays ~90-150 ms of
# driver-side schema inference (footer read + relation resolution), and
# the bench/parity harnesses rebuild each query's DataFrame from scratch
# per run — at 22 headliners × 3 timed runs × ~2.3 tables that was ~15 s
# of pure metadata re-inference per bench invocation (measured 129 ms →
# 37 ms per read with an explicit schema at sf0.1). A real deployment
# serves exactly this from the metastore/table format instead of
# re-reading footers per query — the same argument table_rowcount makes
# for parquet-footer row counts. Two layers, both metadata-only:
#
#   * _SCHEMA_CACHE: the inferred StructType per (sf_dir, table) —
#     engine metadata, valid across sessions (fixture dirs are
#     immutable; a new sf_dir gets its own entry).
#   * _DF_CACHE: the constructed (lazily-planned) DataFrame per LIVE
#     session, in a WeakKeyDictionary so a stopped session's entries
#     die with it. A DataFrame here is an unexecuted logical plan —
#     nothing is computed or persisted, every action still reads the
#     parquet bytes; this only skips re-resolving the same immutable
#     relation (listing + schema plumbing) on every query build.
# ---------------------------------------------------------------------------
_SCHEMA_CACHE: dict[str, StructType] = {}
_DF_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with schema + relation memoization (see above)."""
    per_session = _DF_CACHE.setdefault(spark, {})
    df = per_session.get(path)
    if df is not None:
        return df
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    per_session[path] = df
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with normalized types.

    This branch exists for NS-TYPED inputs only: a fixture whose
    events.ts is parquet TIMESTAMP(NANOS) surfaces (under
    spark.sql.legacy.parquet.nanosAsLong) as raw ns-since-epoch long,
    and `timestamp_micros(ts div 1000)` converts it. The shipped
    fixture SFs all store ts as timestamp[us], so no current fixture
    exercises it (ADVICE r4 — the docstring used to claim otherwise).
    Because the div-1000 silently drops sub-µs precision, the
    conversion raises per-row on any ts with nonzero sub-µs ns
    instead of truncating: real nanosecond data must fail loudly, not
    quietly lose its low digits. The guard is a JVM-side integer mod
    in the rarely-taken branch — no extra pass, no cost to the
    µs-typed fixtures.
    """
    configure(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = _read_parquet(spark, path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr(
                "IF(ts % 1000 = 0, timestamp_micros(ts DIV 1000),"
                " raise_error(CONCAT('events.ts has sub-microsecond"
                " precision (ns value ', CAST(ts AS STRING),"
                " '); the div-1000 conversion would truncate it')))"
            ).cast("timestamp_ntz"),
        )
    return df


def table_rowcount(sf_dir: str, name: str) -> int:
    """Exact row count from parquet FOOTER metadata — zero data read,
    no Spark job. This is the "table stats" a real catalog serves: at
    100 TB a `df.count()` just to size a parameter is a full scan;
    footers (or the metastore's rowCount stat) answer it in O(files)
    metadata reads."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
            for root, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
