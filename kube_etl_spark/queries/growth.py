"""Customer-growth analytics: trend features, YoY, win-backs,
multi-touch attribution, and distribution ranks.

The round-5 widening batch — the BI/feature-engineering rollups a
retention or marketing team runs daily over the order/event log.
Every query keeps its arithmetic in exact integers (cents, days,
micro-cents, 10⁴-scaled rationals) so the Spark result value-hashes
identically to the DuckDB oracle; floats appear only as final
single-operation casts (see exact.py's rules).

Reference parity note: the reference engine (a Kubernetes controller,
see SURVEY.md §2 provenance) exposes none of this surface; these are
part of the 100 TB-pipeline extension mandated by SURVEY §2's EXT
rows, sharing the window/join/agg machinery proven by the §2 families
(W3 lag carries, J8 range joins, A1/A10 conditional aggs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

# Shared money scaling: o_totalprice / events.value are 2dp doubles in
# every fixture; DECIMAL(14,2)*100 → BIGINT cents is exact in both
# engines (the repo-wide pattern).
_CENTS = "CAST(CAST({c} AS DECIMAL(14,2)) * 100 AS BIGINT)"


@query(
    "q_user_trend_slope",
    tags=("A7", "EXT"),
    oracle=f"""
WITH pts AS (
  SELECT o_custkey,
         CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         {_CENTS.format(c='o_totalprice')} AS y
  FROM orders
),
s AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM pts GROUP BY o_custkey
)
SELECT o_custkey AS custkey, n AS n_orders,
       CAST((100 * (n * sxy - sx * sy)) // (n * sxx - sx * sx) AS DOUBLE) / 10000.0
         AS slope_usd_day,
       CASE WHEN n * sxy - sx * sy > 0 THEN 'rising'
            WHEN n * sxy - sx * sy < 0 THEN 'falling'
            ELSE 'flat' END AS trend
FROM s
WHERE n >= 3 AND n * sxx - sx * sx > 0
ORDER BY custkey
""",
)
def q_user_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 5): per-customer spend-trend slope — the closed-form
    least-squares slope of order value (USD) over order date (days),
    the classic churn-risk feature ("is this account's spend rising or
    falling?") computed for every customer in one aggregation.

    Determinism: the five sufficient statistics (n, Σx, Σy, Σxy, Σx²)
    are exact BIGINT sums of integer days × integer cents; the slope
    numerator/denominator stay integral and the 4dp USD/day slope is
    floor integer math (both engines truncate integral division toward
    zero — verified). No float ever enters an aggregation.

    Scale shape: ONE hashpartition(o_custkey) map-side-combinable agg
    over the fact scan — no window, no join, |customers| output rows.
    At 100 TB the five sums stream; magnitude headroom: the 10²-scaled
    numerator stays < 2⁶³ while Σ|xy| < 9×10¹⁶ (cents × day-offsets) —
    beyond that, swap the sums to DECIMAL(38,0), same plan."""
    pts = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.to_date(F.lit("1995-01-01")))
        .cast("bigint")
        .alias("x"),
        F.expr(_CENTS.format(c="o_totalprice")).alias("y"),
    )
    s = pts.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return (
        s.withColumn("num", F.expr("n * sxy - sx * sy"))
        .withColumn("den", F.expr("n * sxx - sx * sx"))
        .filter((F.col("n") >= 3) & (F.col("den") > 0))
        .selectExpr(
            "o_custkey AS custkey",
            "n AS n_orders",
            "CAST((100 * num) DIV den AS DOUBLE) / 10000.0 AS slope_usd_day",
            "CASE WHEN num > 0 THEN 'rising' WHEN num < 0 THEN 'falling'"
            " ELSE 'flat' END AS trend",
        )
        .orderBy("custkey")
    )


@query(
    "q_yoy_growth",
    tags=("F2", "A1", "EXT"),
    oracle=f"""
WITH m AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(month(o_orderdate) AS BIGINT) AS mo,
         CAST(SUM({_CENTS.format(c='o_totalprice')}) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
)
SELECT cur.y AS yr, cur.mo AS mon,
       CAST(cur.cents AS DOUBLE) / 100.0 AS revenue,
       CAST(((cur.cents - prev.cents) * 1000000) // prev.cents AS DOUBLE) / 10000.0
         AS yoy_pct
FROM m cur JOIN m prev ON cur.y = prev.y + 1 AND cur.mo = prev.mo
ORDER BY yr, mon
""",
)
def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 5): year-over-year monthly revenue growth — the BI
    staple. Joins each month to the same month one year earlier
    (calendar join, NOT lag(12) over row order: a missing month would
    silently shift a row-offset lag onto the wrong comparison, the
    classic sparse-calendar bug).

    Determinism: monthly revenue is an exact BIGINT cents sum; the
    growth percentage is floor integer math at 4dp (delta × 10⁶ stays
    < 2⁶³ up to ~$9×10¹⁰ of monthly delta; swap to DECIMAL(38,0)
    beyond). Revenue emits as cents/100 — one exact-integer double
    division.

    Scale shape: the fact scan collapses map-side to |months| rows
    (~80); the self-join runs on that tiny aggregate (broadcast), so
    the plan is one shuffle + a broadcast join however large the fact
    table is."""
    m = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.year("o_orderdate").cast("bigint").alias("y"),
            F.month("o_orderdate").cast("bigint").alias("mo"),
            F.expr(_CENTS.format(c="o_totalprice")).alias("c"),
        )
        .groupBy("y", "mo")
        .agg(F.sum("c").alias("cents"))
    )
    cur, prev = m.alias("cur"), m.alias("prev")
    return (
        cur.join(
            F.broadcast(prev),
            (F.col("cur.y") == F.col("prev.y") + 1) & (F.col("cur.mo") == F.col("prev.mo")),
        )
        .selectExpr(
            "cur.y AS yr",
            "cur.mo AS mon",
            "CAST(cur.cents AS DOUBLE) / 100.0 AS revenue",
            "CAST(((cur.cents - prev.cents) * 1000000) DIV prev.cents AS DOUBLE)"
            " / 10000.0 AS yoy_pct",
        )
        .orderBy("yr", "mon")
    )


@query(
    "q_reactivation",
    tags=("W3", "F2", "EXT"),
    oracle="""
WITH g AS (
  SELECT o_custkey, o_orderdate,
         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS prev_dt
  FROM orders
)
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mon,
       CAST(COUNT(*) AS BIGINT) AS n_winbacks,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM g
WHERE prev_dt IS NOT NULL
  AND datediff('day', CAST(prev_dt AS DATE), CAST(o_orderdate AS DATE)) > 365
GROUP BY 1, 2 ORDER BY yr, mon
""",
)
def q_reactivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 5): win-back detection — an order whose customer's
    previous order is more than 365 days older marks a REACTIVATION;
    rolled up monthly (how many win-backs, how many distinct customers
    came back). The lifecycle-marketing complement to
    q_retention_cohort (which measures staying; this measures
    returning after dormancy).

    Determinism: day-granularity gap on dates, integer counts only.
    The lag's total order is (o_orderdate, o_orderkey) — a full
    tie-break, same in both engines.

    Scale shape: one hashpartition(o_custkey) window pass (lag only),
    then a month-sized map-side-combinable agg; the distinct rides the
    same month grouping. No joins."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.lag("o_orderdate").over(w).alias("prev_dt"),
    )
    return (
        g.filter(
            F.col("prev_dt").isNotNull()
            & (
                F.datediff(
                    F.col("o_orderdate").cast("date"), F.col("prev_dt").cast("date")
                )
                > 365
            )
        )
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mon"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_winbacks"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
        )
        .orderBy("yr", "mon")
    )


@query(
    "q_attribution_linear",
    bench=True,
    tags=("J8", "A10", "EXT"),
    oracle=f"""
WITH purch AS (
  SELECT event_id AS pid, user_id, ts,
         {_CENTS.format(c='value')} AS cents
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts AS cts,
         COALESCE('ch_' || CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 4
                                AS VARCHAR), 'ch_unknown') AS channel
  FROM events WHERE event_type = 'click'
),
touched AS (
  SELECT p.pid, p.cents, c.channel
  FROM purch p LEFT JOIN clicks c
    ON p.user_id = c.user_id AND c.cts < p.ts AND c.cts >= p.ts - INTERVAL 7 DAY
),
k AS (
  SELECT pid, cents, channel,
         COUNT(channel) OVER (PARTITION BY pid) AS n_touch
  FROM touched
)
SELECT COALESCE(channel, 'organic') AS channel,
       CAST(COUNT(DISTINCT pid) AS BIGINT) AS n_purchases,
       CAST(SUM(CASE WHEN channel IS NULL THEN cents * 1000000
                     ELSE (cents * 1000000) // n_touch END) AS BIGINT)
         AS credit_microcents
FROM k GROUP BY 1 ORDER BY channel
""",
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 5): linear multi-touch attribution — every purchase
    splits its value EQUALLY across all of the user's clicks in the
    preceding 7 days (vs q_attribution_last_touch's winner-takes-all).
    Purchases with no qualifying click credit 'organic' in full. The
    second canonical marketing-attribution model; per-channel credit
    plus how many purchases each channel participated in.

    Determinism: the per-touch credit is (cents × 10⁶) DIV n_touch —
    truncating integer micro-cents, identical in both engines (≤
    n_touch−1 µ¢ of per-purchase truncation, deterministic); the
    rollup sums BIGINTs. The 7-day window is exact µs-precision
    interval arithmetic (strict < on the purchase side so a
    same-instant click never self-attributes).

    Scale shape: purchases ⋈ clicks is a user_id equi-join with the
    time predicate as a residual filter (broadcast while clicks fit,
    shuffle join past the threshold) — the fan-out is per-user
    touches-within-7-days, bounded by user activity, never
    |purchases|×|clicks|; the n_touch window partitions by
    (user_id, pid) — semantically identical to pid alone since pid is
    unique, but hashpartition(user_id) from the shuffle-join regime
    SATISFIES it (partition exprs ⊆ window keys), so the fanned-out
    frame is never re-exchanged for the window at the scale where that
    matters; final agg is channel-sized (≤5 keys)."""
    # NOT floored (r12): a parallel=True read was tried here (the click
    # leg JSON-parses props below the first exchange) but the clean
    # interleaved A/B at sf0.1/32 measured the floored read 1.52×
    # SLOWER warm (0.89 s → 1.35 s; bench-protocol medians a wash) —
    # the events table is small enough that the extra round-robin
    # exchange outweighs parallelizing the parse (guide §2.5's
    # cheap-scan caveat)
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        "ts",
        F.expr(_CENTS.format(c="value")).alias("cents"),
    )
    # a click whose props carries no parseable k must still be a TOUCH
    # (channel 'ch_unknown'), never a NULL channel: NULL would drop it
    # from n_touch AND route it to 'organic' with the FULL purchase
    # value — double-crediting the purchase past 100% (review find;
    # dormant on fixtures where every click has k, wrong in production)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cuser"),
        F.col("ts").alias("cts"),
        F.coalesce(
            F.concat(
                F.lit("ch_"),
                (F.get_json_object("props", "$.k").cast("bigint") % 4).cast("string"),
            ),
            F.lit("ch_unknown"),
        ).alias("channel"),
    )
    touched = purch.join(
        clicks,
        (F.col("user_id") == F.col("cuser"))
        & (F.col("cts") < F.col("ts"))
        & (F.col("cts") >= F.col("ts") - F.expr("INTERVAL 7 DAY")),
        "left",
    )
    # n_touch groups by purchase; pid is unique, so partitioning the
    # window by (user_id, pid) is semantically identical — and lets the
    # join's existing hashpartition(user_id) SATISFY the window's
    # clustered distribution (partition exprs ⊆ window keys), removing
    # a full exchange of the click-fanned-out frame (plan-pinned)
    k = touched.select(
        "pid",
        "cents",
        "channel",
        F.count("channel")
        .over(Window.partitionBy("user_id", "pid"))
        .alias("n_touch"),
    )
    return (
        k.groupBy(F.coalesce("channel", F.lit("organic")).alias("channel"))
        .agg(
            F.countDistinct("pid").cast("bigint").alias("n_purchases"),
            F.sum(
                F.when(
                    F.col("channel").isNull(), F.col("cents") * F.lit(1000000)
                ).otherwise(F.expr("(cents * 1000000) DIV n_touch"))
            )
            .cast("bigint")
            .alias("credit_microcents"),
        )
        .orderBy("channel")
    )


@query(
    "q_window_ntile_cume",
    tags=("W1", "A1", "EXT"),
    oracle="""
WITH r AS (
  SELECT c_mktsegment,
         CAST(c_acctbal AS DECIMAL(12,2)) AS bal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY CAST(c_acctbal AS DECIMAL(12,2)) DESC, c_custkey) AS rn,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n,
         NTILE(10) OVER (PARTITION BY c_mktsegment
                         ORDER BY CAST(c_acctbal AS DECIMAL(12,2)) DESC, c_custkey) AS decile
  FROM customer
)
SELECT c_mktsegment AS segment, CAST(decile AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(MAX(bal) AS DOUBLE) AS bal_hi,
       CAST(MIN(bal) AS DOUBLE) AS bal_lo,
       CAST(MAX((rn - 1) * 10000 // GREATEST(n - 1, 1)) AS BIGINT) AS pr_hi_4dp,
       CAST(MAX(rn * 10000 // n) AS BIGINT) AS cd_hi_4dp
FROM r GROUP BY 1, 2 ORDER BY segment, decile
""",
)
def q_window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 (round-5 widening): distribution ranks — NTILE decile,
    percent_rank and cume_dist per market segment, rolled up to the
    (segment, decile) band with its balance range. The feature-binning
    / percentile-banding pattern (quantile discretization of a skewed
    numeric into equal-count bands).

    Determinism: the window order is a TOTAL order (2dp decimal
    balance desc, custkey) so NTILE's remainder distribution (first
    buckets one longer) agrees across engines; percent_rank/cume_dist
    are re-derived from row_number/count in 10⁴-scaled floor integer
    math instead of the built-ins (whose double rounding can split on
    representation boundaries).

    Scale shape: one hashpartition(c_mktsegment) sort-window pass over
    the dimension, then a 10-band-per-segment rollup. NTILE needs the
    whole partition ordered — if ONE segment outgrows a task, the swap
    is scale.global_ntile run per segment (the exact distributed form
    q_rfm_segments uses since r9) or approx-quantile band edges + a
    broadcast range lookup when sketch-grade suffices; the exact form
    here IS the oracle for either swap."""
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    w = Window.partitionBy("c_mktsegment").orderBy(bal.desc(), F.col("c_custkey"))
    r = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        bal.alias("bal"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("c_mktsegment")).alias("n"),
        F.ntile(10).over(w).alias("decile"),
    )
    return (
        r.groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("decile").cast("bigint").alias("decile"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.max("bal").cast("double").alias("bal_hi"),
            F.min("bal").cast("double").alias("bal_lo"),
            F.max(F.expr("(rn - 1) * 10000 DIV GREATEST(n - 1, 1)"))
            .cast("bigint")
            .alias("pr_hi_4dp"),
            F.max(F.expr("rn * 10000 DIV n")).cast("bigint").alias("cd_hi_4dp"),
        )
        .orderBy("segment", "decile")
    )
