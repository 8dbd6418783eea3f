"""Projections, filters and predicates (SURVEY.md §2.2, P1-P9).

These re-express the reference's per-object field handling as columnar
DataFrame expressions. P-semantics with citations:
  P1 nested-field projection  — krmsyncer_controller.go:561-584
  P2 drop/normalize           — krmsyncer_controller.go:518-521
  P3 defaults + derived path  — pkg/export/export.go:136-150
  P4 composite-key equality   — krmsyncer_controller.go:406
  P5 suffix glob              — krmsyncer_controller.go:395-404
  P6 membership (array / in)  — export.go:119; krmsyncer_controller.go:462-474
  P7 substring exclusion      — export.go:124
  P8 rule validation          — krmsyncer_controller.go:105-116

All run on the fixture tables (the driver's oracle can only see those),
with the reference's *shapes* mapped onto them. Predicates here are
Catalyst-pushable (verified: PushedFilters in .explain) — unlike the
reference, which filters client-side after a full fetch (a missed
pushdown, krmsyncer_controller.go:462-474).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "q_project_nested",
    tags=("P1",),
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) AS resource_id,
       o_orderstatus AS status_state,
       o_orderpriority AS spec_priority
FROM orders
WHERE o_totalprice > 400000
ORDER BY o_orderkey
""",
)
def q_project_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: build a spec/status document per row, then project dotted
    paths out of it (obj.spec.resourceID, obj.status.state) — the
    columnar analog of filterFields' nested-path copy."""
    orders = load_table(spark, sf_dir, "orders")
    obj = F.struct(
        F.struct(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderkey").cast("string").alias("resourceID"),
        ).alias("spec"),
        F.struct(F.col("o_orderstatus").alias("state")).alias("status"),
    )
    return (
        orders.filter(F.col("o_totalprice") > 400000)
        .withColumn("obj", obj)
        .select(
            "o_orderkey",
            F.col("obj.spec.resourceID").alias("resource_id"),
            F.col("obj.status.state").alias("status_state"),
            F.col("obj.spec.priority").alias("spec_priority"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q_drop_normalize",
    tags=("P2",),
    oracle="""
SELECT c_custkey, c_name, c_nationkey,
       CAST(NULL AS DOUBLE) AS c_acctbal,
       CAST(NULL AS VARCHAR) AS c_mktsegment
FROM customer
WHERE c_custkey <= 500
ORDER BY c_custkey
""",
)
def q_drop_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: normalization — volatile columns cleared before the sink
    (resourceVersion/uid/generation analog)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 500)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.lit(None).cast("double").alias("c_acctbal"),
            F.lit(None).cast("string").alias("c_mktsegment"),
        )
        .orderBy("c_custkey")
    )


@query(
    "q_case_coalesce_concat",
    tags=("P3", "F7"),
    oracle="""
SELECT event_id,
       CASE WHEN user_id % 5 = 0 THEN '_cluster'
            ELSE 'ns-' || CAST(user_id AS VARCHAR) END AS namespace,
       CASE WHEN event_type = 'click' THEN 'core' ELSE event_type END AS grp,
       (CASE WHEN user_id % 5 = 0 THEN '_cluster'
             ELSE 'ns-' || CAST(user_id AS VARCHAR) END)
         || '/' || (CASE WHEN event_type = 'click' THEN 'core' ELSE event_type END)
         || '/Event/' || CAST(event_id AS VARCHAR) || '.yaml' AS path
FROM events
WHERE event_id < 500
ORDER BY event_id
""",
)
def q_case_coalesce_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: export path derivation — ''→'_cluster' / ''→'core' defaulting
    + path concat (export.go:136-150)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    ns = F.when(F.col("user_id") % 5 == 0, F.lit("_cluster")).otherwise(
        F.concat(F.lit("ns-"), F.col("user_id").cast("string"))
    )
    grp = F.when(F.col("event_type") == "click", F.lit("core")).otherwise(
        F.col("event_type")
    )
    return ev.select(
        "event_id",
        ns.alias("namespace"),
        grp.alias("grp"),
        F.concat_ws(
            "/", ns, grp, F.lit("Event"), F.concat(F.col("event_id").cast("string"), F.lit(".yaml"))
        ).alias("path"),
    ).orderBy("event_id")


@query(
    "q_filter_conjunction",
    tags=("P4",),
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_returnflag = 'A' AND l_linestatus = 'F' AND l_quantity > 49
ORDER BY l_orderkey, l_linenumber
""",
)
def q_filter_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: multi-column equality conjunction (GVK-match analog) —
    pushed to the parquet scan."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_returnflag") == "A")
            & (F.col("l_linestatus") == "F")
            & (F.col("l_quantity") > 49)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q_filter_like_suffix",
    tags=("P5",),
    oracle="""
SELECT p_partkey, p_name
FROM part
WHERE p_name LIKE '%bolt'
ORDER BY p_partkey
""",
)
def q_filter_like_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: suffix-glob predicate (*.cnrm... analog) via endswith."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").endswith("bolt"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@query(
    "q_filter_array_contains",
    tags=("P6",),
    oracle="""
SELECT p_partkey, p_name
FROM part
WHERE list_contains(string_split(p_name, ' '), 'gear')
ORDER BY p_partkey
""",
)
def q_filter_array_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6a: array membership (Verbs-contains-'list' analog,
    export.go:119) — token array built by split."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.array_contains(F.split(F.col("p_name"), " "), "gear"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@query(
    "q_filter_isin",
    tags=("P6",),
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6b: in-list membership (namespace ∈ rule.namespaces analog,
    krmsyncer_controller.go:462-474)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_filter_not_contains",
    tags=("P7",),
    oracle="""
SELECT p_brand, COUNT(*) AS n
FROM part
WHERE NOT contains(p_name, 'red')
GROUP BY p_brand
ORDER BY p_brand
""",
)
def q_filter_not_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: substring-exclusion predicate (subresource '/' skip analog,
    export.go:124)."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(~F.col("p_name").contains("red"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("p_brand")
    )


# Rule rows mirroring the glob-validation unit table
# (syncer/controllers/krmsyncer_glob_test.go:24-89): a '*' in version/kind
# is only legal when the group is a '*.cnrm.cloud.google.com'-family glob.
_RULE_ROWS = [
    ("exact", "e2e.gkelabs.io", "v1", "TestCRD"),
    ("kcc_glob_ok", "*.cnrm.cloud.google.com", "*", "*"),
    ("kcc_exact_group_glob_ok", "kcc.cnrm.cloud.google.com", "*", "*"),
    ("kcc_apex_glob_ok", "cnrm.cloud.google.com", "*", "*"),
    ("bad_version_glob", "e2e.gkelabs.io", "*", "TestCRD"),
    ("bad_kind_glob", "e2e.gkelabs.io", "v1", "*"),
    ("bad_group_glob", "*.example.com", "*", "*"),
    ("bad_spoof_suffix", "*.evilcnrm.cloud.google.com", "*", "*"),
    ("bad_embedded_glob", "apps", "v1", "Deploy*"),
    ("kcc_exact", "kcc.cnrm.cloud.google.com", "v1beta1", "KCCResource"),
]

_RULE_VALUES = ", ".join(f"('{a}', '{b}', '{c}', '{d}')" for a, b, c, d in _RULE_ROWS)


@query(
    "q_validate_rules",
    tags=("P8",),
    oracle=f"""
SELECT rule_name,
       CAST(
         (NOT (grp LIKE '%*%' OR version LIKE '%*%' OR kind LIKE '%*%'))
         OR ((grp = '*.cnrm.cloud.google.com'
              OR grp LIKE '%.cnrm.cloud.google.com'
              OR grp = 'cnrm.cloud.google.com')
             AND version = '*' AND kind = '*')
       AS INTEGER) AS valid
FROM (VALUES {_RULE_VALUES}) AS r(rule_name, grp, version, kind)
ORDER BY rule_name
""",
)
def q_validate_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: rule validation — exact validateRule semantics
    (krmsyncer_controller.go:105-116): '*' anywhere makes a glob rule;
    legal only when group is KCC-family (literal *.cnrm glob, dotted
    suffix, or apex) AND version and kind are both '*'."""
    rules = spark.createDataFrame(
        _RULE_ROWS, "rule_name string, grp string, version string, kind string"
    )
    has_glob = (
        F.col("grp").contains("*")
        | F.col("version").contains("*")
        | F.col("kind").contains("*")
    )
    kcc_glob = (
        (
            (F.col("grp") == "*.cnrm.cloud.google.com")
            | F.col("grp").endswith(".cnrm.cloud.google.com")
            | (F.col("grp") == "cnrm.cloud.google.com")
        )
        & (F.col("version") == "*")
        & (F.col("kind") == "*")
    )
    return rules.select(
        "rule_name", (~has_glob | kcc_glob).cast("int").alias("valid")
    ).orderBy("rule_name")
