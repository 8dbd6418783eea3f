"""Data-quality audit operators (EXT; the ETL-hygiene tier).

The reference's controller refuses malformed rules before syncing
(`validateRule`, syncer/controllers/krmsyncer_controller.go — the
engine's P8 analog lives in streaming/sync.py); these operators are the
same stance applied to the WAREHOUSE side of the pipeline: audit the
landed tables themselves — referential integrity across the star, and
first-digit (Benford) screening for fabricated/corrupted numeric feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "q_benford_digits",
    tags=("A1", "F3"),
    oracle="""
WITH d AS (
  SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1
),
c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
t AS (SELECT SUM(n) AS total FROM c)
SELECT c.digit AS digit, c.n AS n,
       ROUND(c.n * 1.0 / t.total, 4) AS observed,
       ROUND(log10(1.0 + 1.0 / c.digit), 4) AS benford
FROM c, t
ORDER BY c.digit
""",
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): Benford first-digit screening — the distribution
    of leading digits of o_totalprice against log10(1+1/d), the
    classic fabricated-data / corrupted-feed detector (synthetic
    uniform fixtures deliberately FAIL Benford — the point is the
    comparison columns, not conformance). The leading digit comes from
    the decimal's string form, not floor(x/10^floor(log10 x)) — float
    log at power-of-ten boundaries misclassifies, strings don't.

    Scale shape: pure map-side projection + a 9-key groupBy; the
    normalizing total is a 1-row frame cross-joined back (broadcast).
    Nothing here grows with data size except the first scan."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = orders.select(
        F.substring(F.col("o_totalprice").cast("decimal(14,2)").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("total"), 4).alias("observed"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 4).alias("benford"),
        )
        .orderBy("digit")
    )


# Synthetic orphan injection shared by the Spark and oracle sides: the
# clean fixtures are referentially intact, so a plain audit would be a
# vacuous all-zeros green. 25 lineitem clones get order keys shifted
# past the real key range; 10 orders clones get customer keys shifted.
_AUG_LI_SQL = """
  SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem
  UNION ALL
  SELECT l_orderkey + 900000000, l_partkey, l_suppkey FROM lineitem
  WHERE l_orderkey < 100 AND l_linenumber = 1
"""
_AUG_ORD_SQL = """
  SELECT o_orderkey, o_custkey FROM orders
  UNION ALL
  SELECT o_orderkey + 900000000, o_custkey + 900000000 FROM orders
  WHERE o_orderkey < 40
"""


@query(
    "q_fk_orphans",
    tags=("J7", "A1"),
    oracle=f"""
WITH li AS ({_AUG_LI_SQL}),
ord AS ({_AUG_ORD_SQL}),
checks AS (
  SELECT 'lineitem->orders' AS fk, COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
  FROM li LEFT JOIN ord o ON li.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'lineitem->part', COUNT(*),
         CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM li LEFT JOIN part p ON li.l_partkey = p.p_partkey
  UNION ALL
  SELECT 'orders->customer', COUNT(*),
         CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM ord LEFT JOIN customer c ON ord.o_custkey = c.c_custkey
)
SELECT fk, n_rows, n_orphans FROM checks ORDER BY fk
""",
)
def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): referential-integrity audit across the star —
    orphan counts for lineitem→orders, lineitem→part and
    orders→customer, over fixtures augmented with known-bad rows (the
    clean fixtures are intact; without injection this green would be
    the vacuous all-zeros match VERDICT r2 flagged on
    q_scalar_subquery). The delete-propagation analog: these orphans
    are exactly what the reference's delete sink prevents
    (SURVEY §2.1 S9).

    Scale shape: each check is a left join probing a dimension — part
    and customer broadcast; orders⋈lineitem shuffles on the key it
    would shuffle on anyway, and only (key, null-flag) pairs reach the
    count. At 100 TB the counts stay map-side-combinable 1-row aggs."""
    li = load_table(spark, sf_dir, "lineitem")
    li_aug = li.select("l_orderkey", "l_partkey", "l_suppkey").unionByName(
        li.filter((F.col("l_orderkey") < 100) & (F.col("l_linenumber") == 1)).select(
            (F.col("l_orderkey") + 900000000).alias("l_orderkey"),
            "l_partkey",
            "l_suppkey",
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    ord_aug = orders.select("o_orderkey", "o_custkey").unionByName(
        orders.filter(F.col("o_orderkey") < 40).select(
            (F.col("o_orderkey") + 900000000).alias("o_orderkey"),
            (F.col("o_custkey") + 900000000).alias("o_custkey"),
        )
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        orphan_check(li_aug, ord_aug.select("o_orderkey"), "lineitem->orders", "l_orderkey", "o_orderkey", False)
        .unionByName(orphan_check(li_aug, part, "lineitem->part", "l_partkey", "p_partkey", True))
        .unionByName(orphan_check(ord_aug, cust, "orders->customer", "o_custkey", "c_custkey", True))
        .orderBy("fk")
    )


def orphan_check(
    fact: DataFrame, dim: DataFrame, fk: str, fkey: str, dkey: str, bcast: bool
) -> DataFrame:
    """One FK integrity probe: (fk, n_rows, n_orphans) for fact rows
    whose key misses the dimension. Shared by q_fk_orphans (augmented
    fixtures) and plans/audit.py (raw production tables)."""
    d = F.broadcast(dim) if bcast else dim
    return (
        fact.join(d, fact[fkey] == dim[dkey], "left")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(dim[dkey].isNull(), 1).otherwise(0)).alias("n_orphans"),
        )
        .select(F.lit(fk).alias("fk"), "n_rows", "n_orphans")
    )


@query(
    "q_audit_constraints",
    tags=("P8", "A2"),
    oracle="""
SELECT * FROM (
  SELECT 'accepted_values' AS check_name, 'orders.o_orderstatus' AS subject,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')) AS BIGINT)
           AS n_violations
  FROM orders
  UNION ALL
  SELECT 'fk', 'lineitem.l_orderkey->orders',
         CAST((SELECT COUNT(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
  UNION ALL
  SELECT 'not_null', 'orders.o_custkey',
         CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'pk_unique', 'orders.o_orderkey',
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'value_range', 'lineitem.l_discount in [0, 0.1]',
         CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1) AS BIGINT)
  FROM lineitem
)
ORDER BY check_name
""",
)
def q_audit_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 4): the expectations suite as one report — five
    warehouse constraint checks (primary-key uniqueness, not-null,
    accepted values, referential integrity, value range) evaluated to
    (check, subject, n_violations) rows, the Deequ/dbt-test shape.
    This puts the audit layer (plans/audit.py runs the full battery as
    a job) under the driver's hash gate through a representative
    cross-section.

    Scale shape: each check is one aggregate over one scan (the
    kind Catalyst collapses to partial+final with no wide state), and
    the FK check is a broadcast-able anti-join count; the report frame
    is five rows. At 100 TB the checks share scans per table via the
    audit job's unioned plan; here each stays independent so the
    oracle decomposes obviously.

    Determinism: pure integer counts."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def row(name: str, subject: str, agg_df: DataFrame) -> DataFrame:
        return agg_df.select(
            F.lit(name).alias("check_name"),
            F.lit(subject).alias("subject"),
            F.col("v").cast("bigint").alias("n_violations"),
        )

    checks = [
        row(
            "accepted_values",
            "orders.o_orderstatus",
            orders.agg(
                F.count_if(~F.col("o_orderstatus").isin("O", "F", "P")).alias("v")
            ),
        ),
        row(
            "fk",
            "lineitem.l_orderkey->orders",
            li.join(
                orders.select("o_orderkey"),
                li["l_orderkey"] == F.col("o_orderkey"),
                "left_anti",
            ).agg(F.count(F.lit(1)).alias("v")),
        ),
        row(
            "not_null",
            "orders.o_custkey",
            orders.agg(F.count_if(F.col("o_custkey").isNull()).alias("v")),
        ),
        row(
            "pk_unique",
            "orders.o_orderkey",
            orders.agg(
                (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v")
            ),
        ),
        row(
            "value_range",
            "lineitem.l_discount in [0, 0.1]",
            li.agg(
                F.count_if(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
                ).alias("v")
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check_name")
