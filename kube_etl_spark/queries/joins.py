"""Join operators (SURVEY.md §2.3, J1-J11).

Reference provenance: the reference's only join-like constructs are the
per-event nested-loop match of the object stream against the rule table
(broadcast semi/inner join with equality + suffix + in-list predicates,
/root/reference/syncer/controllers/krmsyncer_controller.go:426-474) and
rule×catalog suffix expansion (same file :151-199). J9 models the former
faithfully; the rest are the EXT relational surface.

Scale notes:
  * region/nation are O(10²) rows at any sf → explicit `broadcast()`;
    everything else is left to AQE's runtime broadcast/skew decisions.
  * The as-of join (J10) is implemented as union + running `last()`
    over one (key, time) shuffle — O(n log n), no row explosion — the
    shape that survives 100 TB, unlike an inequality join + group-max
    which explodes to |events|×|orders-per-key|.
  * The range join (J8) broadcasts the tiny band table → a broadcast
    nested-loop with a one-sided band probe, not a cartesian shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exact import REVENUE_SQL, dsum, dsum_sql, money, money_sql, revenue
from ..registry import query


@query(
    "q_join_inner",
    bench=True,
    tags=("J1",),
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: large-large inner equi-join (sort-merge / AQE-selected)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_quantity").cast("decimal(14,2)")).alias("total_qty"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_join_broadcast",
    tags=("J2",),
    oracle="""
SELECT r_name, COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
""",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: explicit broadcast hash join of a tiny dimension."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
        .orderBy("r_name")
    )


@query(
    "q_join_star",
    bench=True,
    tags=("J3",),
    oracle=f"""
SELECT n_name,
       {dsum_sql(REVENUE_SQL)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: multi-way star join (TPC-H Q5 shape); AQE reorders/broadcasts."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q_join_left",
    tags=("J4",),
    oracle="""
SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY c_custkey
""",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4a: left outer join preserving order-less customers."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@query(
    "q_join_right",
    tags=("J4",),
    oracle="""
SELECT s_suppkey, s_name, COUNT(l_orderkey) AS n_items
FROM lineitem RIGHT JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
ORDER BY s_suppkey
""",
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4b: right outer join preserving item-less suppliers."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey, "right")
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("l_orderkey").alias("n_items"))
        .orderBy("s_suppkey")
    )


@query(
    "q_join_full",
    tags=("J5",),
    oracle="""
WITH hi_cust AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
     big_ord AS (SELECT o_custkey, COUNT(*) AS n_big
                 FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey)
SELECT COALESCE(c_custkey, o_custkey) AS custkey,
       CAST(c_acctbal IS NOT NULL AS INTEGER) AS has_hi_bal,
       COALESCE(n_big, 0) AS n_big_orders
FROM hi_cust FULL JOIN big_ord ON c_custkey = o_custkey
ORDER BY custkey
""",
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: full outer join of two filtered sides."""
    hi_cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_acctbal")
    )
    big_ord = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    return (
        hi_cust.join(big_ord, hi_cust.c_custkey == big_ord.o_custkey, "full")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            F.col("c_acctbal").isNotNull().cast("int").alias("has_hi_bal"),
            F.coalesce("n_big", F.lit(0)).alias("n_big_orders"),
        )
        .orderBy("custkey")
    )


@query(
    "q_join_semi",
    tags=("J6",),
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 350000)
ORDER BY c_custkey
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: left semi join — existence test, no row duplication.

    REF analog: "does any rule match this event" (krmsyncer_controller.go:456-474).
    """
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "q_join_anti",
    tags=("J7",),
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')
ORDER BY c_custkey
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: left anti join — customers with no URGENT-priority orders.

    The anti side is filtered deliberately: every fixture customer has
    at least one order at every SF, so the unfiltered "no orders"
    variant returned ZERO rows and its driver green was a vacuous 0=0
    match (the q_scalar_subquery lesson, r02); the priority filter
    leaves ~13% of customers at each SF, so real rows are verified.

    REF analog: delete propagation = present-in-dest, absent-in-source
    (krmsyncer_controller.go:489-504).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


_BANDS_ROWS = [(0.0, 10000.0, "low"), (10000.0, 40000.0, "mid"), (40000.0, 1e12, "high")]


@query(
    "q_join_range",
    tags=("J8",),
    oracle="""
SELECT b.band, COUNT(*) AS n_items
FROM lineitem l
JOIN (VALUES (0.0, 10000.0, 'low'),
             (10000.0, 40000.0, 'mid'),
             (40000.0, 1000000000000.0, 'high')) AS b(lo, hi, band)
  ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
GROUP BY b.band
ORDER BY b.band
""",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: theta/range join — price banding via broadcast nested-loop.

    REF analog: suffix-match join of rules × catalog
    (krmsyncer_controller.go:160-192) — also a non-equi broadcast join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_BANDS_ROWS, "lo double, hi double, band string")
    return (
        li.join(
            F.broadcast(bands),
            (li.l_extendedprice >= bands.lo) & (li.l_extendedprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .orderBy("band")
    )


# The reference's rule table, re-shaped onto the events fixture: each rule
# matches an event_type (equality) or a '*suffix' glob, like the KCC
# suffix-glob rules (krmsyncer_controller.go:156-192); one event can match
# several rules → fan-out duplication by design (controller processes an
# event once per matching syncer, :431-530).
_RULES_ROWS = [
    ("r_click", "click", "sink_a"),
    ("r_click2", "click", "sink_b"),
    ("r_purchase", "purchase", "sink_a"),
    ("r_any_up", "*up", "sink_c"),  # matches signup (suffix glob)
]


@query(
    "q_rules_fanout",
    tags=("J9", "P4", "P5", "P9"),
    oracle="""
SELECT r.rule_name, r.sink, COUNT(*) AS n_events
FROM events e
JOIN (VALUES ('r_click', 'click', 'sink_a'),
             ('r_click2', 'click', 'sink_b'),
             ('r_purchase', 'purchase', 'sink_a'),
             ('r_any_up', '*up', 'sink_c')) AS r(rule_name, pattern, sink)
  ON e.event_type = r.pattern
     OR (r.pattern LIKE '*%' AND e.event_type LIKE '%' || substr(r.pattern, 2))
GROUP BY r.rule_name, r.sink
ORDER BY r.rule_name
""",
)
def q_rules_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 (REF): event stream × broadcast rule table with equality+glob
    predicates; 1 event → N matching rules (krmsyncer_controller.go:426-474)."""
    events = load_table(spark, sf_dir, "events")
    rules = spark.createDataFrame(_RULES_ROWS, "rule_name string, pattern string, sink string")
    cond = (events.event_type == rules.pattern) | (
        rules.pattern.startswith("*")
        & events.event_type.endswith(F.expr("substr(pattern, 2)"))
    )
    return (
        events.join(F.broadcast(rules), cond)
        .groupBy("rule_name", "sink")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("rule_name")
    )


@query(
    "q_join_asof",
    tags=("J10",),
    oracle="""
WITH od AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP_NS) AS ts, o.o_orderkey AS matched_orderkey
FROM events e
ASOF LEFT JOIN od o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: as-of join — latest order at-or-before each event's time.

    Implemented scale-first: union both sides tagged, one shuffle on
    (key, time), running `last(ignorenulls)` window. No row explosion —
    the inequality-join-then-argmax alternative is O(|events| ×
    |orders per key|) and dies at 100 TB. Ties (order exactly at event
    ts) resolve order-first, matching ASOF's >= semantics; orders are
    pre-deduped per (custkey, date) so the match is deterministic.
    """
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    od = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey")
    )
    left = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(None).cast("long").alias("ok"),
        F.lit(1).alias("is_event"),
    )
    right = od.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("ok"),
        F.lit(0).alias("is_event"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("is_event").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        left.unionByName(right)
        .withColumn("matched_orderkey", F.last("ok", ignorenulls=True).over(w))
        .filter(F.col("is_event") == 1)
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.col("t").alias("ts"),
            "matched_orderkey",
        )
        .orderBy("event_id")
    )


@query(
    "q_join_cross",
    tags=("J11",),
    oracle="""
SELECT r.r_name, n.n_name
FROM region r CROSS JOIN nation n
ORDER BY r.r_name, n.n_name
""",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: cross join (tiny × tiny only — guarded use at scale)."""
    region = load_table(spark, sf_dir, "region").select("r_name")
    nation = load_table(spark, sf_dir, "nation").select("n_name")
    return region.crossJoin(F.broadcast(nation)).orderBy("r_name", "n_name")


@query(
    "q_null_safe_join",
    tags=("J1", "J5", "A1"),
    oracle=f"""
WITH c AS (
  SELECT NULLIF(c_nationkey % 5, 4) AS tier,
         CAST(COUNT(*) AS BIGINT) AS n_cust,
         CAST(SUM({money_sql('c_acctbal')}) AS DOUBLE) AS cust_bal
  FROM customer GROUP BY NULLIF(c_nationkey % 5, 4)
),
s AS (
  SELECT NULLIF(s_nationkey % 5, 4) AS tier,
         CAST(COUNT(*) AS BIGINT) AS n_supp,
         CAST(SUM({money_sql('s_acctbal')}) AS DOUBLE) AS supp_bal
  FROM supplier GROUP BY NULLIF(s_nationkey % 5, 4)
)
SELECT CAST(COALESCE(c.tier, s.tier) AS BIGINT) AS tier,
       COALESCE(c.n_cust, 0) AS n_cust,
       COALESCE(c.cust_bal, 0.0) AS cust_bal,
       COALESCE(s.n_supp, 0) AS n_supp,
       COALESCE(s.supp_bal, 0.0) AS supp_bal
FROM c FULL JOIN s ON c.tier IS NOT DISTINCT FROM s.tier
ORDER BY tier NULLS FIRST
""",
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 4): NULL-semantics showcase — a nullable grouping key
    (NULLIF-derived tier; NULL rows form their own group in BOTH
    engines) full-outer-joined with NULL-SAFE equality (`<=>` /
    IS NOT DISTINCT FROM), so the NULL tier on one side matches the
    NULL tier on the other instead of silently dropping — the
    plain-equality full join would emit two half-rows for NULL. The
    explicit nulls-first ordering pins the one cross-engine default
    that differs (Spark ASC = NULLS FIRST, DuckDB ASC = NULLS LAST).

    Scale shape: both sides pre-aggregate to ≤5 rows before the join —
    the null-safe comparison runs on aggregates, never row-level (a
    row-level <=> join can't use a plain hash join's null-dropping
    fast path, so shrinking inputs first matters doubly at scale)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.nullif(F.col("c_nationkey") % 5, F.lit(4)).alias("tier"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cust"),
            dsum(money("c_acctbal")).alias("cust_bal"),
        )
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.nullif(F.col("s_nationkey") % 5, F.lit(4)).alias("tier_s"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_supp"),
            dsum(money("s_acctbal")).alias("supp_bal"),
        )
    )
    return (
        c.join(s, c["tier"].eqNullSafe(s["tier_s"]), "full")
        .select(
            F.coalesce(c["tier"], s["tier_s"]).cast("bigint").alias("tier"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
            F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal"),
        )
        .orderBy(F.col("tier").asc_nulls_first())
    )


@query(
    "q_join_nearest_event",
    tags=("J10", "EXT"),
    oracle="""
WITH clk AS (
  SELECT user_id, ts AS cts, MIN(event_id) AS cid
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, ts
),
err AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
cand AS (
  SELECT e.event_id, e.user_id, c.cid,
         abs(epoch_us(c.cts) - epoch_us(e.ts)) AS adt,
         CAST(epoch_us(c.cts) <= epoch_us(e.ts) AS INT) AS is_before,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
           ORDER BY abs(epoch_us(c.cts) - epoch_us(e.ts)) ASC,
                    CAST(epoch_us(c.cts) <= epoch_us(e.ts) AS INT) DESC,
                    c.cid ASC) AS rn
  FROM err e JOIN clk c USING (user_id)
)
SELECT e.event_id, e.user_id,
       CAST(COALESCE(b.cid, -1) AS BIGINT) AS nearest_click,
       CAST(COALESCE(b.adt, -1) AS BIGINT) AS dt_us,
       CASE WHEN b.cid IS NULL THEN 'none'
            WHEN b.is_before = 1 THEN 'before'
            ELSE 'after' END AS direction
FROM err e LEFT JOIN (SELECT * FROM cand WHERE rn = 1) b USING (event_id)
ORDER BY e.event_id
""",
)
def q_join_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10b: nearest-event join — each error is matched to the CLOSEST
    click by the same user in EITHER time direction (as-of joins look
    only backward; log/diagnostic correlation wants the nearest
    neighbor, before or after). Ties at equal distance resolve to the
    earlier (before) click; same-µs clicks are pre-deduped to the
    lowest event_id so every pick is a total order.

    Implemented scale-first with the q_join_asof union-carry trick run
    in BOTH directions over one sort: tag clicks and errors, one
    shuffle on user_id ordered by (µs, kind) — clicks sort before
    same-instant errors, so the backward frame sees them and the
    forward frame does not (no double count) — then `last(ignorenulls)`
    carries the previous click and `first(ignorenulls)` over the
    mirrored frame carries the next one. No row explosion: the
    inequality-join-then-argmin alternative the oracle runs is
    O(|errors| × |clicks per user|) and dies at 100 TB; this plan is
    two window passes over ONE exchange.

    Determinism: distances are exact µs integer differences (the
    q_time_to_convert unix_micros pattern); the before/after choice is
    dt_before <= dt_after on integers."""
    ev = load_table(spark, sf_dir, "events")
    us = "unix_micros(CAST(ts AS TIMESTAMP))"
    clk = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("cid"))
        .select("user_id", F.expr(us).alias("t_us"), "cid")
    )
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.expr(us).alias("t_us"), F.col("event_id")
    )
    tagged = clk.select(
        "user_id",
        "t_us",
        F.lit(0).alias("is_err"),
        F.lit(None).cast("long").alias("event_id"),
        "cid",
        F.col("t_us").alias("c_us"),
    ).unionByName(
        err.select(
            "user_id",
            "t_us",
            F.lit(1).alias("is_err"),
            "event_id",
            F.lit(None).cast("long").alias("cid"),
            F.lit(None).cast("long").alias("c_us"),
        )
    )
    w_b = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "is_err")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward carry = backward carry over the REVERSED total order:
    # Spark's (CURRENT ROW, UNBOUNDED FOLLOWING) frame re-scans the
    # partition tail per row — O(n²) per user (measured 10× on the
    # gapfill grid); the mirrored UnboundedPreceding frame streams in
    # O(n). (t_us desc, is_err desc) is the exact mirror of the asc
    # order, so same-instant clicks stay OUT of the forward frame and
    # IN the backward one, as before.
    w_f = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_us").desc(), F.col("is_err").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        tagged.withColumn("prev_c", F.last("cid", ignorenulls=True).over(w_b))
        .withColumn("prev_t", F.last("c_us", ignorenulls=True).over(w_b))
        .withColumn("next_c", F.last("cid", ignorenulls=True).over(w_f))
        .withColumn("next_t", F.last("c_us", ignorenulls=True).over(w_f))
        .filter(F.col("is_err") == 1)
    )
    take_before = F.col("prev_c").isNotNull() & (
        F.col("next_c").isNull()
        | ((F.col("t_us") - F.col("prev_t")) <= (F.col("next_t") - F.col("t_us")))
    )
    return carried.select(
        "event_id",
        "user_id",
        F.when(take_before, F.col("prev_c"))
        .otherwise(F.coalesce(F.col("next_c"), F.lit(-1)))
        .cast("bigint")
        .alias("nearest_click"),
        F.when(take_before, F.col("t_us") - F.col("prev_t"))
        .otherwise(
            F.coalesce(F.col("next_t") - F.col("t_us"), F.lit(-1))
        )
        .cast("bigint")
        .alias("dt_us"),
        F.when(take_before, F.lit("before"))
        .when(F.col("next_c").isNotNull(), F.lit("after"))
        .otherwise(F.lit("none"))
        .alias("direction"),
    ).orderBy("event_id")
