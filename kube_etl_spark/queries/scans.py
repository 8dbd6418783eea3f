"""Scans, sources and sinks (SURVEY.md §2.1, S1-S10).

The reference's batch pipeline is: discovery scan → full list → derived
path → serialize → zip sink (/root/reference/pkg/export/export.go:64-168,
pkg/sink/zip.go:22-53). Spark equivalents here:
  S1 catalog enumeration  → per-table scans unioned
  S2 scan+project         → parquet scan with pruning/pushdown
  S5 partitioned sink     → write.partitionBy(...).parquet + re-read
  S6 row serialization    → to_json(struct(...)) (JSON ≡ YAML declared)
  S7 multi-doc decode     → from_json(array) + explode
  S10 spec/status split   → two projections of one frame, dual write

Scale notes: S2's plan must show PushedFilters + a pruned ReadSchema;
S5's partitionBy mirrors the reference's <ns>/<group>/<kind> layout and
gives partition-pruned downstream reads.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import TABLES, load_table
from ..registry import query

_CATALOG_COUNT_SQL = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS table_name, COUNT(*) AS n_rows FROM {t}" for t in TABLES
)


@query(
    "q_catalog_scan",
    tags=("S1",),
    oracle=f"SELECT * FROM ({_CATALOG_COUNT_SQL}) ORDER BY table_name",
)
def q_catalog_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: catalog enumeration — scan every table the catalog lists
    (ServerPreferredResources analog, export.go:98-128)."""
    dfs = [
        load_table(spark, sf_dir, t)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.lit(t).alias("table_name"), "n_rows")
        for t in TABLES
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out.orderBy("table_name")


@query(
    "q_scan_project",
    tags=("S2",),
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
WHERE l_orderkey < 200
ORDER BY l_orderkey, l_linenumber
""",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: scan + narrow projection — column pruning and predicate
    pushdown reach the parquet reader (the reference always fetches the
    full object: a missed pushdown, krmsyncer_controller.go:509-516)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 200)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q_to_json",
    tags=("S6",),
    oracle="""
SELECT r_regionkey,
       '{"r_regionkey":' || CAST(r_regionkey AS VARCHAR)
         || ',"r_name":"' || r_name || '"}' AS doc
FROM region
ORDER BY r_regionkey
""",
)
def q_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: serialize a row to a JSON document (YAML-marshal analog,
    export.go:152; JSON declared equivalent per SURVEY §2.1)."""
    region = load_table(spark, sf_dir, "region")
    return region.select(
        "r_regionkey",
        F.to_json(F.struct("r_regionkey", "r_name")).alias("doc"),
    ).orderBy("r_regionkey")


@query(
    "q_from_json_explode",
    tags=("S7",),
    oracle="""
SELECT event_id, doc_idx, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events CROSS JOIN (VALUES (0), (1)) AS d(doc_idx)
WHERE event_id < 300
ORDER BY event_id, doc_idx
""",
)
def q_from_json_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: multi-document decode — parse a 2-doc JSON stream into N rows
    (YAMLOrJSONDecoder loop analog, syncer/integration/krmsyncer_test.go:174-187).
    Each event's props is duplicated into a 2-element JSON array, parsed
    with from_json, and exploded with position."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    stream = F.concat(F.lit("["), F.col("props"), F.lit(","), F.col("props"), F.lit("]"))
    docs = F.from_json(stream, "array<struct<k:int>>")
    return (
        ev.select("event_id", F.posexplode(docs).alias("doc_idx", "doc"))
        .select("event_id", "doc_idx", F.col("doc.k").alias("k"))
        .orderBy("event_id", "doc_idx")
    )


@query(
    "q_sink_partitioned",
    tags=("S5",),
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def q_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: partitioned sink round-trip — write orders partitioned by
    status (the <ns>/<group>/<kind>/<name> zip-layout analog,
    export.go:150-158 + zip.go:38-45), re-read, count per partition.
    The oracle is the same count on the source table, so the check
    proves the sink wrote every row into the right partition."""
    orders = load_table(spark, sf_dir, "orders")
    # one dir per PROCESS (pid-salted): concurrent runs cannot race,
    # and repeated invocations in one process reuse/overwrite the same
    # dir instead of leaking a copy per call
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"kube_etl_spark_sink_{os.getpid()}_{os.path.basename(sf_dir.rstrip(chr(47)))}",
    )
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out_dir)
    return (
        spark.read.parquet(out_dir)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("o_orderstatus").cast("string").alias("o_orderstatus"), "n")
        .orderBy("o_orderstatus")
    )


@query(
    "q_split_spec_status",
    tags=("S10",),
    oracle="""
SELECT part, COUNT(*) AS n FROM (
  SELECT 'spec' AS part, o_orderkey FROM orders WHERE o_totalprice > 0
  UNION ALL
  SELECT 'status' AS part, o_orderkey FROM orders WHERE o_orderstatus IN ('F','O','P')
)
GROUP BY part
ORDER BY part
""",
)
def q_split_spec_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: dual-endpoint write — one frame split into spec/status
    projections written separately (krmsyncer_controller.go:592-622);
    declared as the union of both projections' counts."""
    orders = load_table(spark, sf_dir, "orders")
    spec = orders.filter(F.col("o_totalprice") > 0).select(
        F.lit("spec").alias("part"), "o_orderkey"
    )
    status = orders.filter(F.col("o_orderstatus").isin("F", "O", "P")).select(
        F.lit("status").alias("part"), "o_orderkey"
    )
    return (
        spec.unionByName(status)
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("part")
    )


@query(
    "q_profile_columns",
    tags=("S1", "A3"),
    oracle="""
WITH u AS (
  SELECT 'o_orderkey' AS col, CAST(o_orderkey AS VARCHAR) AS sval,
         CAST(o_orderkey AS DOUBLE) AS nval FROM orders
  UNION ALL
  SELECT 'o_custkey', CAST(o_custkey AS VARCHAR), CAST(o_custkey AS DOUBLE) FROM orders
  UNION ALL
  SELECT 'o_orderstatus', o_orderstatus, NULL FROM orders
  UNION ALL
  SELECT 'o_totalprice', CAST(o_totalprice AS VARCHAR), o_totalprice FROM orders
  UNION ALL
  SELECT 'o_orderdate', CAST(o_orderdate AS VARCHAR),
         CAST(epoch(o_orderdate) AS DOUBLE) FROM orders
  UNION ALL
  SELECT 'o_orderpriority', o_orderpriority, NULL FROM orders
),
counts AS (
  SELECT col,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (sval IS NULL) AS BIGINT) AS n_null,
         ROUND(MIN(nval), 4) AS min_num,
         ROUND(MAX(nval), 4) AS max_num,
         MIN(CASE WHEN col IN ('o_orderstatus', 'o_orderpriority') THEN sval END) AS min_str,
         MAX(CASE WHEN col IN ('o_orderstatus', 'o_orderpriority') THEN sval END) AS max_str
  FROM u GROUP BY col
),
dist AS (
  SELECT col, CAST(COUNT(*) AS BIGINT) AS n_distinct
  FROM (SELECT DISTINCT col, sval FROM u WHERE sval IS NOT NULL)
  GROUP BY col
)
SELECT c.col AS column_name, c.n, c.n_null, d.n_distinct,
       c.min_num, c.max_num, c.min_str, c.max_str
FROM counts c JOIN dist d ON c.col = d.col
ORDER BY column_name
""",
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/A3 (EXT, round 3): column profiling — the ANALYZE/data-quality
    pass (row count, null count, exact distinct count, min/max) for
    every column of a table, here `orders`. The catalog-maintenance
    twin of the discovery scan: the reference enumerates tables
    (export.go:98-128); this profiles one.

    Scale shape: the unpivot is a map-side stack() (rows × ncols, but
    never wider than 3 values), and the exact distinct count avoids
    the multi-countDistinct Expand trap by deduplicating at the
    (column, value) grain first — the same partial-agg shape as the
    boilerplate df pass. min/max run in the value's own type domain
    (numeric channel for numerics, epoch for timestamps, string
    channel only for true strings) so no cross-engine string-format
    comparison of doubles/timestamps exists. At 100 TB you swap the
    exact distinct for approx_count_distinct (A4) — documented, not
    silently done."""
    orders = load_table(spark, sf_dir, "orders")
    u = orders.select(
        F.expr(
            "stack(6, "
            "'o_orderkey', cast(o_orderkey as string), cast(o_orderkey as double), "
            "'o_custkey', cast(o_custkey as string), cast(o_custkey as double), "
            "'o_orderstatus', o_orderstatus, cast(null as double), "
            "'o_totalprice', cast(o_totalprice as string), o_totalprice, "
            "'o_orderdate', cast(o_orderdate as string), cast(unix_timestamp(o_orderdate) as double), "
            "'o_orderpriority', o_orderpriority, cast(null as double)"
            ") as (col, sval, nval)"
        )
    )
    is_str = F.col("col").isin("o_orderstatus", "o_orderpriority")
    counts = u.groupBy("col").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("sval").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null"),
        F.round(F.min("nval"), 4).alias("min_num"),
        F.round(F.max("nval"), 4).alias("max_num"),
        F.min(F.when(is_str, F.col("sval"))).alias("min_str"),
        F.max(F.when(is_str, F.col("sval"))).alias("max_str"),
    )
    dist = (
        u.filter(F.col("sval").isNotNull())
        .select("col", "sval")
        .distinct()
        .groupBy("col")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    return (
        counts.join(dist, "col")
        .select(
            F.col("col").alias("column_name"),
            "n",
            "n_null",
            "n_distinct",
            "min_num",
            "max_num",
            "min_str",
            "max_str",
        )
        .orderBy("column_name")
    )


@query(
    "q_profile_columns_approx",
    tags=("S1", "A4"),
    oracle=None,  # rows-only: HLL estimates differ from DuckDB's sketch
)
def q_profile_columns_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/A4 (EXT, round 3): the 100 TB variant of q_profile_columns —
    the documented swap of the exact (column, value)-grain distinct for
    approx_count_distinct (HLL++, rsd 0.05). ONE corpus pass, no dedup
    shuffle at all: every statistic partial-aggregates map-side and the
    final state is ncols × (counters + one HLL sketch) — constant
    memory per column regardless of corpus size. Rows-only by contract
    (sketch estimates are engine-specific); the exact twin anchors
    correctness."""
    orders = load_table(spark, sf_dir, "orders")
    u = orders.select(
        F.expr(
            "stack(6, "
            "'o_orderkey', cast(o_orderkey as string), cast(o_orderkey as double), "
            "'o_custkey', cast(o_custkey as string), cast(o_custkey as double), "
            "'o_orderstatus', o_orderstatus, cast(null as double), "
            "'o_totalprice', cast(o_totalprice as string), o_totalprice, "
            "'o_orderdate', cast(o_orderdate as string), cast(unix_timestamp(o_orderdate) as double), "
            "'o_orderpriority', o_orderpriority, cast(null as double)"
            ") as (col, sval, nval)"
        )
    )
    return (
        u.groupBy("col")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("sval").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null"),
            F.approx_count_distinct("sval", rsd=0.05).alias("n_distinct_approx"),
            F.round(F.min("nval"), 4).alias("min_num"),
            F.round(F.max("nval"), 4).alias("max_num"),
        )
        .select(
            F.col("col").alias("column_name"),
            "n",
            "n_null",
            "n_distinct_approx",
            "min_num",
            "max_num",
        )
        .orderBy("column_name")
    )
