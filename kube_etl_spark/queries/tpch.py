"""Full TPC-H-shaped analytical queries (EXT; complex multi-operator
compositions over the star schema — the 'can a reference user run their
real workload' tier beyond single-operator checks). Value domains
adapted to the driver fixtures (FIXTURES.md §B: brands Brand#1..,
nations NATION_n, dates 1995-2001).

Scale notes: these are the canonical mixed-shape plans — selective
dimension filters that must become broadcast sides, a wide fact scan
with pushed predicates, multi-level aggregation. All money math runs
through exact.py decimals so the value-hash check is engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exact import REVENUE_SQL as _REV
from ..exact import dsum, dsum_sql, money, money_sql, qty, rate, rate_sql, revenue as _rev
from ..registry import query


@query(
    "q_tpch_q3_shipping_priority",
    bench=True,
    tags=("TPCH",),
    oracle=f"""
SELECT l_orderkey,
       {dsum_sql(_REV)} AS revenue,
       CAST(o_orderdate AS TIMESTAMP_NS) AS o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
""",
)
def q_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers ⋈ orders ⋈ lineitem,
    revenue top-10. The customer filter shrinks the build side before
    the fact join; both date predicates push to the scans."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_Q7_NATIONS = ("NATION_1", "NATION_2", "NATION_3")


@query(
    "q_tpch_q7_nation_volume",
    tags=("TPCH",),
    oracle=f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {dsum_sql(_REV)} AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND cn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND sn.n_name <> cn.n_name
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q_tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between nation pairs by
    year — a 6-way join. Three nations instead of the canonical two:
    sf0.001's 10 suppliers span neither NATION_1 nor NATION_2, so the
    2-nation result was EMPTY there (a vacuous parity green); the pair
    semantics (sn <> cn, both directions grouped separately) are
    unchanged.

    Join order is scale-deliberate (VERDICT r1 #3): Catalyst does not
    reorder inner joins without CBO stats, so the 2-of-N nation
    selectivity is applied FIRST — supplier⋈broadcast(sn) and
    customer⋈broadcast(cn) each shrink to the two-nation subset before
    any fact-table shuffle. At 100 TB this is the difference between
    shuffling ~2/N of lineitem's join partners and paying the full
    fact⋈orders⋈supplier⋈customer intermediate before filtering.
    The reduced sides are NOT force-broadcast: at 100 TB the 2-nation
    supplier subset is still ~10⁷ rows, so AQE decides broadcast vs
    shuffle from the observed post-filter size."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    sn = nation.filter(F.col("n_name").isin(*_Q7_NATIONS)).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.filter(F.col("n_name").isin(*_Q7_NATIONS)).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    # nation filters first: each dimension shrinks before the fact joins
    supp2 = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    cust2 = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey", "cust_nation")
    )
    return (
        li.join(supp2, li.l_suppkey == supp2.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust2, orders.o_custkey == cust2.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(dsum(_rev()).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q_tpch_q19_bracket_predicates",
    tags=("TPCH",),
    oracle=f"""
SELECT {dsum_sql(_REV)} AS revenue, COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity >= 10 AND l_quantity <= 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity >= 20 AND l_quantity <= 50)
""",
)
def q_tpch_q19_bracket_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs bracket predicates across both join
    sides — the disjunction can't fully push down, but the per-bracket
    brand/size conjuncts prune the part build side."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, part.p_partkey == li.l_partkey)
    b = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 50))
    )
    return j.filter(b).agg(
        dsum(_rev()).alias("revenue"), F.count(F.lit(1)).alias("n_items")
    )


@query(
    "q_tpch_q10_returned_items",
    tags=("TPCH",),
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       {dsum_sql(_REV)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '2000-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '2001-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer in one
    quarter — date-pruned orders ⋈ return-filtered lineitem ⋈ customer
    ⋈ broadcast nation, top-20."""
    lo = F.lit("2000-10-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("2001-01-01 00:00:00").cast("timestamp_ntz")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(_rev()).alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "q_tpch_q18_large_orders",
    tags=("TPCH",),
    oracle="""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(14,2))) > 280
)
SELECT c_custkey, c_name, o_orderkey, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
""",
)
def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — a self-referential
    semi-join against an aggregated subquery (the aggregate feeds the
    IN-list); top-25 by price."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(14,2)")).alias("q"))
        .filter(F.col("q") > 280)
        .select("l_orderkey")
    )
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li.withColumnRenamed("l_orderkey", "lok"), F.col("o_orderkey") == F.col("lok"))
        .join(big, F.col("o_orderkey") == big.l_orderkey, "left_semi")
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(14,2)"))
            .cast("double")
            .alias("total_qty")
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@query(
    "q_tpch_q14_promo_share",
    tags=("TPCH",),
    oracle=f"""
SELECT ROUND(
         100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                               ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE)
               / {dsum_sql(_REV)}, 4) AS promo_share
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-03-01 00:00:00'
""",
)
def q_tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — a ratio of two conditional
    decimal sums over one date-pruned scan (both sums come from the SAME
    join pass; no second scan). The date predicate pushes to the
    lineitem scan; part joins once. Division happens on the two exact
    decimal totals, so the 4dp round is on an unstructured real."""
    lo = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-03-01 00:00:00").cast("timestamp_ntz")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev()
    zero = F.lit(0).cast("decimal(22,6)")
    return (
        li.join(part, part.p_partkey == li.l_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
                .cast("double")
                / dsum(rev),
                4,
            ).alias("promo_share")
        )
    )


@query(
    "q_tpch_q6_forecast_revenue",
    tags=("TPCH",),
    oracle=f"""
SELECT {dsum_sql(f"{money_sql('l_extendedprice')} * {rate_sql('l_discount')}")} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
)
def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: forecast-revenue-change — the pure
    pushdown-plus-aggregate query. No join at all: every predicate
    (date range, discount band, quantity cap) pushes to the parquet
    scan and the whole plan is scan → filter → one global decimal sum.
    At 100 TB this is the query where pushdown IS the runtime: the scan
    reads 4 columns of ~1/7 of the row groups (min/max pruning on
    l_shipdate) and nothing shuffles but one partial-agg row per task."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    return (
        li.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(money("l_extendedprice") * rate("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_tpch_q8_market_share",
    tags=("TPCH",),
    oracle=f"""
WITH flat AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         {_REV} AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = 'AMERICA'
    AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
                           ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
FROM flat
GROUP BY o_year
ORDER BY o_year
""",
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — NATION_2 suppliers' slice
    of PROMO-part volume sold into AMERICA-region customers, per year.
    Two-level aggregation expressed as one conditional-sum pass (no
    second scan, mirroring Q14). Scale shape: region⋈nation prunes the
    customer dimension via a broadcast BEFORE any fact shuffle; the
    supplier-side nation lookup is a broadcast rename (25 rows at any
    SF); p_type and the o_orderdate window push to the part/orders
    scans; the ratio divides two exact decimal totals per year."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    # region-pruned customer-nation keys: tiny broadcast filter
    cnat = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    snat = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(cnat), F.col("c_nationkey") == F.col("cn_key"), "left_semi")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(snat), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = _rev()
    zero = F.lit(0).cast("decimal(22,6)")
    flat = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            rev.alias("volume"),
            "supp_nation",
        )
    )
    return (
        flat.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("volume").cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q_tpch_q5_local_volume",
    tags=("TPCH",),
    oracle=f"""
SELECT n_name, {dsum_sql(_REV)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '2000-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
""",
)
def q_tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: local-supplier volume per nation in one region —
    the join carries an EXTRA non-key equality (s_nationkey =
    c_nationkey, 'local' semantics) on top of the key equijoin, and the
    region filter prunes the broadcast nation dimension before any fact
    shuffle (region⋈nation is dim-side, broadcast; the date window
    pushes to the orders scan)."""
    lo = F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # region-pruned nation list: tiny, broadcast everywhere it's needed
    nat = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .groupBy("n_name")
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@query(
    "q_tpch_q13_custdist",
    tags=("TPCH",),
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — a LEFT
    OUTER join whose extra predicate lives in the JOIN condition (not
    a WHERE, which would turn the outer join inner and lose the
    zero-order customers), then two aggregation levels.

    Scale shape: the outer join and the first group-by share the
    c_custkey/o_custkey hash partitioning, so the count-per-customer
    agg reuses the join exchange; the second group-by reduces to at
    most |distinct counts| rows (tiny) — its shuffle is negligible.
    The non-equi part of the predicate (o_orderpriority <> literal)
    pushes to the orders scan side of the join as a pre-filter on the
    null-producing side only, which Catalyst does automatically for
    left joins (filter on the right side of LEFT OUTER is
    pushdown-safe)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q_tpch_q15_top_supplier",
    tags=("TPCH",),
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {dsum_sql(_REV)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue
    — a reused aggregate subplan compared against its own global MAX.

    Scale shape: the revenue aggregate (the expensive part — a full
    pass over the date-pruned lineitem) is computed ONCE and cached;
    both consumers (the max and the equality filter) read the cached
    ~|suppliers| rows. The global MAX is a 1-row frame joined back by
    broadcast — NOT a Window.partitionBy() over nothing, which would
    funnel all suppliers through a single task. The revenue values are
    exact decimals, so the equality against MAX is engine-stable (no
    float ULP hazard)."""
    lo = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-04-01 00:00:00").cast("timestamp_ntz")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("rev_dec"))
    ).persist()
    top = revenue.agg(F.max("rev_dec").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(top), F.col("rev_dec") == F.col("max_rev"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("rev_dec").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch_q17_small_quantity",
    tags=("TPCH",),
    oracle=f"""
WITH fl AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#13'
),
st AS (
  SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(14,2))) AS sq, COUNT(*) AS n
  FROM fl GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM({money_sql('f.l_extendedprice')}) AS DOUBLE) / 7.0, 4)
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM fl f JOIN st ON f.l_partkey = st.l_partkey
WHERE CAST(f.l_quantity AS DECIMAL(14,2)) * 5 * st.n < st.sq
""",
)
def q_tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lines whose
    quantity is below 20% of their part's average, restricted to one
    brand — the correlated-aggregate-then-filter pattern. The avg
    comparison is division-free (qty·5·n < Σqty, all exact decimals):
    decimal division rounds differently across engines, so the
    threshold never divides.

    Scale shape: the brand filter cuts part to ~1/25 and broadcasts;
    lineitem is scanned once, the per-part stats aggregate map-side
    combines on l_partkey, and the stats frame (≤|brand parts| rows)
    broadcasts back — the fact table is never shuffled. At 100 TB the
    same plan holds because both broadcast sides scale with |part|/25,
    not with lineitem."""
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    fl = li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    st = fl.groupBy("l_partkey").agg(
        F.sum(qty("l_quantity")).alias("sq"), F.count(F.lit(1)).alias("n")
    )
    return (
        fl.join(F.broadcast(st), "l_partkey")
        .filter(qty("l_quantity") * F.lit(5) * F.col("n") < F.col("sq"))
        .agg(
            F.round(dsum(money("l_extendedprice")) / 7.0, 4).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_tpch_q22_idle_balance",
    tags=("TPCH",),
    oracle="""
WITH st AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS s, COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0
),
cand AS (
  SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal
  FROM customer c, st
  WHERE CAST(c.c_acctbal AS DECIMAL(14,2)) * st.n > st.s
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
)
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS totacctbal
FROM cand GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
)
def q_tpch_q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-sales-opportunity): customers with
    above-average positive balance and NO urgent orders, grouped by
    market segment (the fixture analog of Q22's phone-prefix country
    code; plain "no orders" is vacuous here — every fixture customer
    has orders, so the gate is no '1-URGENT' order).
    Composes a global scalar aggregate + anti join + group-by. The
    above-average test is division-free (bal·n > Σbal in exact
    decimals), so the threshold is engine-stable.

    Scale shape: the global stats frame is 1 row (broadcast as a
    literal-like side); the anti join shuffles on custkey — the shape
    AQE converts to broadcast-anti when the candidate side is small.
    customer is scanned twice (stats + candidates) but pruned to 3
    columns; at 100 TB a persist of the slim projection removes the
    second scan without changing the plan shape."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    st = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(money("c_acctbal")).alias("s"), F.count(F.lit(1)).alias("n")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    cand = (
        cust.crossJoin(F.broadcast(st))
        .filter(money("c_acctbal") * F.col("n") > F.col("s"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    )
    return (
        cand.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(money("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_tpch_q4_order_priority",
    tags=("TPCH",),
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking), adapted to the fixture
    columns: the reference Q4's lateness test (l_commitdate <
    l_receiptdate) uses columns the fixtures lack, so lateness here is
    'some line shipped more than 60 days after the order date' — the
    same correlated-EXISTS semi-join + single-level count, with the
    correlation carrying an inequality on BOTH tables' columns (the
    part plain equi-semi-joins can't express).

    Scale shape: the date window pushes to the orders scan; the EXISTS
    becomes a LEFT SEMI hash join on l_orderkey with the shipdate
    inequality as a residual — lineitem is filtered to the join's
    3-column projection and never aggregated. At 100 TB the semi join
    shuffles once on orderkey and short-circuits per key."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-07-01 00:00:00").cast("timestamp_ntz")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )
