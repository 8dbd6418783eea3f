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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    df = spark.read.parquet(path)
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
