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
    "q_export_manifest",
    tags=("S5", "S6", "A1"),
    oracle="""
SELECT o_orderstatus AS partition_value,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
       CAST(SUM(octet_length(encode(
           CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
           || '|' || o_orderpriority || '|' || CAST(o_orderdate AS VARCHAR)
       ))) AS BIGINT) AS content_bytes
FROM orders
GROUP BY o_orderstatus
ORDER BY partition_value
""",
)
def q_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S6 companion — the export MANIFEST: after the partitioned
    sink writes (same layout as q_sink_partitioned — the reference's
    <ns>/<group>/<kind> zip layout, export.go:150-158), emit one
    manifest row per partition with row count, distinct/min/max key,
    and canonical content bytes, computed from the RE-READ sink output.
    The oracle computes the same manifest from the source table, so a
    green hash proves the sink wrote every row of every partition —
    the operational 'what did the export contain' answer a user asks
    for first (VERDICT r7 #7a). content_bytes is octet_length of a
    canonical int/string/date projection (no floats: float formatting
    is not cross-engine-stable); physical file counts/sizes are
    engine-specific and live in the export job's stats line, not in a
    hash-checked manifest."""
    orders = load_table(spark, sf_dir, "orders")
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"kube_etl_spark_manifest_{os.getpid()}_"
        f"{os.path.basename(sf_dir.rstrip(chr(47)))}",
    )
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    line = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderpriority"),
        F.col("o_orderdate").cast("string"),
    )
    return (
        back.groupBy(F.col("o_orderstatus").cast("string").alias("partition_value"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("o_orderkey").alias("n_keys"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
            F.max("o_orderkey").cast("bigint").alias("max_key"),
            F.sum(F.octet_length(line)).cast("bigint").alias("content_bytes"),
        )
        .orderBy("partition_value")
    )


@query(
    "q_export_diff",
    tags=("S5", "S6", "A1", "A10"),
    oracle="""
WITH runs AS (
  SELECT 'old' AS run, o_orderstatus,
         CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
           || '|' || o_orderpriority || '|' || CAST(o_orderdate AS VARCHAR)
           AS line
  FROM orders
  UNION ALL
  SELECT 'new', o_orderstatus,
         CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
           || '|' || CASE WHEN o_orderkey % 101 = 0 THEN 'RESYNC'
                          ELSE o_orderpriority END
           || '|' || CAST(o_orderdate AS VARCHAR)
  FROM orders WHERE o_orderkey % 97 <> 0
)
SELECT o_orderstatus AS partition_value,
       CAST(COUNT(*) FILTER (WHERE run = 'old') AS BIGINT) AS n_old,
       CAST(COUNT(*) FILTER (WHERE run = 'new') AS BIGINT) AS n_new,
       CAST(SUM(octet_length(encode(line))) FILTER (WHERE run = 'old')
            AS BIGINT) AS bytes_old,
       CAST(SUM(octet_length(encode(line))) FILTER (WHERE run = 'new')
            AS BIGINT) AS bytes_new,
       CASE WHEN COUNT(*) FILTER (WHERE run = 'old')
               = COUNT(*) FILTER (WHERE run = 'new')
             AND SUM(octet_length(encode(line))) FILTER (WHERE run = 'old')
               = SUM(octet_length(encode(line))) FILTER (WHERE run = 'new')
            THEN 'unchanged' ELSE 'changed' END AS status
FROM runs
GROUP BY o_orderstatus
ORDER BY partition_value
""",
)
def q_export_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S6 extension (VERDICT r8 #7b): the export DIFF — the manifest
    delta between two export runs (q_export_manifest × snapshot_delta):
    per partition, row counts and canonical content bytes of both runs
    plus a changed/unchanged verdict — the 'what changed since the last
    export' answer an operator checks before re-publishing an artifact
    (reference analog: re-running export.go:98-163 against a drifted
    server and comparing zips by entry). The second run simulates drift
    deterministically: every 97th key deleted, every 101st key's
    priority rewritten.

    Scale/plan shape: both runs travel through ONE aggregation — rows
    are tagged with their run and unioned BEFORE the groupBy
    (conditional aggregates per run), never two aggregation subplans
    joined or unioned after the fact (the twin-broadcast hazard class
    planlint fences). One scan per run side, one shuffle on the
    partition key, map-side-combined counts/sums — at 100 TB the diff
    costs two scans and |partitions| rows of state. content_bytes uses
    the same no-floats canonical line as q_export_manifest."""
    orders = load_table(spark, sf_dir, "orders")

    def line(priority: F.Column) -> F.Column:
        return F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            priority,
            F.col("o_orderdate").cast("string"),
        )

    old = orders.select(
        F.lit("old").alias("run"),
        F.col("o_orderstatus").cast("string").alias("partition_value"),
        line(F.col("o_orderpriority")).alias("line"),
    )
    new = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        F.lit("new").alias("run"),
        F.col("o_orderstatus").cast("string").alias("partition_value"),
        line(
            F.when(F.col("o_orderkey") % 101 == 0, F.lit("RESYNC")).otherwise(
                F.col("o_orderpriority")
            )
        ).alias("line"),
    )
    is_old = F.col("run") == "old"
    agg = (
        old.unionByName(new)
        .groupBy("partition_value")
        .agg(
            F.count(F.when(is_old, 1)).cast("bigint").alias("n_old"),
            F.count(F.when(~is_old, 1)).cast("bigint").alias("n_new"),
            F.sum(F.when(is_old, F.octet_length("line")))
            .cast("bigint")
            .alias("bytes_old"),
            F.sum(F.when(~is_old, F.octet_length("line")))
            .cast("bigint")
            .alias("bytes_new"),
        )
    )
    status = F.when(
        (F.col("n_old") == F.col("n_new"))
        & (F.col("bytes_old") == F.col("bytes_new")),
        F.lit("unchanged"),
    ).otherwise(F.lit("changed"))
    return agg.select(
        "partition_value", "n_old", "n_new", "bytes_old", "bytes_new",
        status.alias("status"),
    ).orderBy("partition_value")


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


@query(
    "q_snapshot_diff",
    tags=("S9", "J5"),
    oracle="""
WITH base AS (
  SELECT o_orderkey AS k, o_orderpriority AS pri,
         CAST(o_totalprice AS DECIMAL(14,2)) AS p
  FROM orders
),
old AS (SELECT k, pri, p FROM base WHERE k % 11 <> 3),
new AS (
  SELECT k, pri, CASE WHEN k % 13 = 1 THEN p + 5 ELSE p END AS p
  FROM base WHERE k % 7 <> 2
)
SELECT CASE WHEN o.k IS NULL THEN 'added'
            WHEN n.k IS NULL THEN 'removed'
            WHEN o.p <> n.p THEN 'changed'
            ELSE 'unchanged' END AS change_type,
       COALESCE(n.pri, o.pri) AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(COALESCE(CAST(n.p * 100 AS BIGINT), 0)
              - COALESCE(CAST(o.p * 100 AS BIGINT), 0)) AS BIGINT)
         AS delta_cents
FROM old o FULL JOIN new n ON o.k = n.k
GROUP BY 1, 2 ORDER BY change_type, priority
""",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9b (EXT, round 6 — VERDICT r5 #6): snapshot diff — the batch
    twin of delete propagation. Given two corpus exports of the same
    table (the reference's export sink run at two points in time,
    export.go:64-168), classify every key as added / removed / changed
    / unchanged and report per-class row counts and the exact revenue
    delta — the reconciliation report an export consumer runs before
    trusting an incremental feed, and the fallback that RE-DERIVES a
    CDC stream when the upstream never emitted one. Fixture: the 'old'
    snapshot drops keys ≡3 (mod 11) (later additions), the 'new' drops
    keys ≡2 (mod 7) (deletions) and reprices keys ≡1 (mod 13) by
    +5.00 (changes).

    Scale shape: ONE full-outer equi-join on the snapshot key — both
    sides hash-partition on k and AQE right-sizes the post-join
    partitions; the classification is a map-side CASE over the joined
    row and the rollup is ≤ 4·|priorities| rows, partial-aggregated.
    No window, no sort except the ≤20-row presentation ordering. At
    100 TB both exports are parquet already partitioned by the key
    family, so the join co-locates without a shuffle (the bucketed-
    join path q_join_bucketed evidences).

    Determinism: 2dp DECIMAL prices compare exactly in both engines
    (+5 stays decimal-exact); deltas are exact cents; class+priority
    is a total grouping key."""
    dec = F.col("o_totalprice").cast("decimal(14,2)")
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        dec.alias("p"),
    )
    old = base.filter(F.col("k") % 11 != 3).select(
        F.col("k").alias("ok"), F.col("pri").alias("opri"), F.col("p").alias("op")
    )
    new = base.filter(F.col("k") % 7 != 2).select(
        F.col("k").alias("nk"),
        F.col("pri").alias("npri"),
        F.when(F.col("k") % 13 == 1, F.col("p") + 5).otherwise(F.col("p")).alias("np"),
    )
    j = old.join(new, old.ok == new.nk, "full")
    change = (
        F.when(F.col("ok").isNull(), "added")
        .when(F.col("nk").isNull(), "removed")
        .when(F.col("op") != F.col("np"), "changed")
        .otherwise("unchanged")
    )
    cents = lambda c: F.coalesce((F.col(c) * 100).cast("bigint"), F.lit(0))  # noqa: E731
    return (
        j.select(
            change.alias("change_type"),
            F.coalesce("npri", "opri").alias("priority"),
            (cents("np") - cents("op")).alias("d"),
        )
        .groupBy("change_type", "priority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("d").cast("bigint").alias("delta_cents"),
        )
        .orderBy("change_type", "priority")
    )


@query(
    "q_profile_incremental",
    tags=("S1", "A1", "ST6"),
    oracle="""
WITH f AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN o_orderkey % 3 = 0 AND o_orderkey % 13 = 5
              THEN CAST(o_totalprice + 5 AS DECIMAL(20,2))
              ELSE CAST(o_totalprice AS DECIMAL(20,2)) END AS p
  FROM orders
  WHERE NOT (o_orderkey % 3 = 1 AND o_orderkey % 13 = 7)
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(p) * 100 AS BIGINT) AS total_cents
FROM f GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def q_profile_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1c (EXT, round 6 — VERDICT r5 #6): the incrementally-maintained
    per-source stats profile, putting the IVM layer itself under the
    driver's hash gate. The orders table arrives as FOUR CDC batches —
    three inserts partitioned by key mod 3, then a churn batch that
    REPRICES keys ≡(0 mod 3, 5 mod 13) by +5.00 and DELETES keys
    ≡(1 mod 3, 7 mod 13) — maintained through MaterializedAgg
    (streaming/matview.py: per-batch delta = new-minus-old contribution
    of the batch's keys only, exact decimal credit/debit). The emitted
    frame is the VIEW STATE after the last batch, and the oracle is the
    plain one-shot GROUP BY over the logically-final table — so the
    hash match proves insert, update (debit old + credit new), and
    delete maintenance all converge to the recompute.

    Scale shape: per batch the fact table is never re-scanned — two
    key-pruned state slices + a |groups-touched| view merge (the ivm
    bench measures exactly this economics); the final read is a
    ≤|priorities|-row parquet scan. +5.00 on a ~10⁴-magnitude double
    is ulp-exact (5 is a multiple of ulp(x) at that exponent), so the
    decimal(20,2) cast agrees bit-for-bit across engines.

    Determinism: all state arithmetic is exact decimal(20,2)/bigint;
    batch seq order is fixed; emitted columns are integer counts and
    exact cents."""
    import shutil

    from ..streaming.cdc import StateTable
    from ..streaming.matview import MaterializedAgg

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="profile-incr-")
    try:
        ma = MaterializedAgg(
            StateTable(spark, f"{root}/fact", ["o_orderkey"], "seq"),
            StateTable(spark, f"{root}/view", ["o_orderpriority"], "seq"),
            fact_key="o_orderkey",
            group_col="o_orderpriority",
            value_col="o_totalprice",
        )
        k = F.col("o_orderkey")
        for i in range(3):
            ma.apply_fact_batch(
                orders.filter(k % 3 == i).withColumn("op", F.lit("upsert")), i + 1
            )
        churn = (
            orders.filter((k % 3 == 0) & (k % 13 == 5))
            .withColumn("o_totalprice", F.col("o_totalprice") + 5)
            .withColumn("op", F.lit("upsert"))
            .unionByName(
                orders.filter((k % 3 == 1) & (k % 13 == 7)).withColumn(
                    "op", F.lit("delete")
                )
            )
        )
        ma.apply_fact_batch(churn, 4)
        view = ma.read()
        return (
            view.select(
                "o_orderpriority",
                F.col("n_rows").cast("bigint").alias("n_rows"),
                (F.col("total") * 100).cast("bigint").alias("total_cents"),
            )
            .orderBy("o_orderpriority")
            # materialize BEFORE the state dir is removed: the returned
            # frame must survive the finally below (the driver collects
            # it later); the view is ≤|priorities| rows
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "q_snapshot_survivorship",
    tags=("S1", "S9", "A1"),
    oracle="""
WITH g1 AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 11 <> 3),
g2 AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 7 <> 2),
g3 AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 5 <> 0),
u AS (
  SELECT k, 1 AS gen FROM g1
  UNION ALL SELECT k, 2 FROM g2
  UNION ALL SELECT k, 3 FROM g3
),
lifecycle AS (
  SELECT k,
         MAX(CASE WHEN gen = 1 THEN 1 ELSE 0 END) AS p1,
         MAX(CASE WHEN gen = 2 THEN 1 ELSE 0 END) AS p2,
         MAX(CASE WHEN gen = 3 THEN 1 ELSE 0 END) AS p3
  FROM u GROUP BY k
)
SELECT CAST(p1 AS VARCHAR) || CAST(p2 AS VARCHAR) || CAST(p3 AS VARCHAR)
         AS pattern,
       CASE CAST(p1 AS VARCHAR) || CAST(p2 AS VARCHAR) || CAST(p3 AS VARCHAR)
            WHEN '111' THEN 'stable'
            WHEN '110' THEN 'dropped_latest'
            WHEN '011' THEN 'late_added'
            WHEN '101' THEN 'flapping'
            WHEN '100' THEN 'retired'
            WHEN '001' THEN 'new'
            ELSE 'transient' END AS lifecycle,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(k) AS BIGINT) AS key_checksum
FROM lifecycle
GROUP BY 1, 2
ORDER BY pattern
""",
)
def q_snapshot_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1e/S9 (EXT, round 7): key survivorship across THREE export
    generations — the n-way extension of q_snapshot_diff's pairwise
    report. Every key is classified by its presence pattern over the
    generations (stable / retired / new / late_added / dropped_latest /
    transient / FLAPPING — the present→absent→present pattern that
    signals an unstable upstream exporter, the failure mode a consumer
    of the reference's repeated full exports (export.go:111-163) can't
    see in any single pairwise diff). Fixture generations drop keys by
    coprime moduli (11, 7, 5), so all seven patterns occur.

    Scale shape: one projected scan per generation (at 100 TB the
    generations ARE separate exports — three scans is the honest
    shape), ONE key-keyed shuffle for the presence rollup
    (partial-aggregated map-side), then a ≤7-row pattern aggregate.
    No joins at all — the n-way full-outer join this replaces would
    shuffle n sides; the union+rollup shuffles once.

    Determinism: presence bits, counts and the key checksum are exact
    integers; the pattern vocabulary is closed."""
    base = load_table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    gens = [
        base.filter(F.col("k") % 11 != 3).withColumn("gen", F.lit(1)),
        base.filter(F.col("k") % 7 != 2).withColumn("gen", F.lit(2)),
        base.filter(F.col("k") % 5 != 0).withColumn("gen", F.lit(3)),
    ]
    u = gens[0].unionByName(gens[1]).unionByName(gens[2])
    life = u.groupBy("k").agg(
        *[
            F.max(F.when(F.col("gen") == i, 1).otherwise(0)).alias(f"p{i}")
            for i in (1, 2, 3)
        ]
    )
    pattern = F.concat(
        F.col("p1").cast("string"), F.col("p2").cast("string"), F.col("p3").cast("string")
    )
    lifecycle = (
        F.when(pattern == "111", "stable")
        .when(pattern == "110", "dropped_latest")
        .when(pattern == "011", "late_added")
        .when(pattern == "101", "flapping")
        .when(pattern == "100", "retired")
        .when(pattern == "001", "new")
        .otherwise("transient")
    )
    return (
        life.select(pattern.alias("pattern"), lifecycle.alias("lifecycle"), "k")
        .groupBy("pattern", "lifecycle")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("k").cast("bigint").alias("key_checksum"),
        )
        .orderBy("pattern")
    )
