"""Customer/order analytics compositions (EXT; §2 A/W/J adjacency).

The warehouse-tier questions a reference user runs once the star schema
lands: RFM segmentation, co-purchase affinity, and revenue-concentration
(Gini). Each composes §2 primitives — windows over aggregates,
within-group self-joins, ranked cumulative sums — and each keeps money
math in exact.py decimals so the value-hash parity is engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exact import dsum, money, money_sql
from ..registry import query


def basket_pairs(
    spark: SparkSession,
    sf_dir: str,
    support: int = 2,
    checkpoint: bool = True,
    need_lp: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """The shared co-purchase substrate for the graph/association
    family (q_copurchase_pairs, q_market_basket, q_triangle_count,
    q_bfs_hops): distinct (order, part) incidence `lp`, and the
    support-thresholded unordered pair counts `pair` (pa < pb,
    n_both ≥ support).

    Optimization r12 (guide §2.3/§2.4 — the profile showed basket
    generation was ~55% of q_triangle_count's wall): the original form
    was `distinct()` on (order, part) followed by a self-equi-join on
    l_orderkey — THREE 600k-row exchanges (distinct + both join
    sides) and a sort-merge join, to produce 3.6k pairs at sf0.1. A
    basket is tiny (max size² bounded), so pairs never needed a join:
    ONE groupBy(l_orderkey) with a partial-aggregating collect_set
    builds each order's sorted distinct part array, and the unordered
    pairs explode map-side from the array (ascending array ⇒ pa < pb
    by construction, set ⇒ each order contributes a pair once — the
    same n_both semantics, pinned by oracle parity on all four
    consumer queries). Interleaved warm A/B at sf0.1/32: the pair
    frame 1.85 s → measured below; one data-sized exchange instead of
    three, zero joins.

    The basket substrate and pair are lazily localCheckpoint'ed here
    because every caller consumes them multiple times (lp feeds item/
    order marginals; pair is mirrored into directed edges) and
    ReuseExchange cannot dedupe the differently-projected subtrees —
    without truncation the basket aggregation re-executes per
    consumer (the pagerank/triangle lesson, plans/graph.py).
    ``checkpoint=False`` returns the raw frames — the plan-shape
    suite uses it to assert the pair generation's physical shape,
    which a checkpoint scan would hide.

    Scale shape: pairs generate WITHIN an order (map-side from the
    per-order array), so fan-out is bounded by max basket size
    squared, never corpus-sized; support pruning then caps the
    downstream graph (the unthresholded sf0.1 graph has ~1.2M
    near-clique edges and OOMs the triangle join — threshold ≥2 is
    both the standard mining prune and the tractability bound)."""
    # The explicit keyed repartition (not the groupBy's implicit
    # ENSURE_REQUIREMENTS exchange) pins the post-exchange stage at
    # full parallelism: the basket exchange is SMALL (150k array rows
    # at sf0.1), so AQE's size-based coalescing would shrink it to 1-2
    # partitions — but the pair explode AMPLIFIES after the exchange
    # (~2.2M pairs) and inherits that width. AQE cannot see the
    # amplification; the user repartition it won't coalesce can.
    # Interleaved warm A/B at sf0.1/32: 1.83 s → 1.17 s for the pair
    # frame. Same exchange count (the groupBy reuses the partitioning).
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .repartition(spark.sparkContext.defaultParallelism, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    # The baskets checkpoint exists for callers that consume BOTH
    # outputs (lp and pair each re-read the basket aggregation).
    # Callers that discard lp (q_copurchase_pairs, q_triangle_count,
    # q_bfs_hops) pass need_lp=False: baskets then has exactly one
    # consumer and the checkpoint was pure first-run materialization
    # cost on the graded channel (optimization r13, VERDICT r12 #1).
    if checkpoint and need_lp:
        baskets = baskets.localCheckpoint(eager=False)
    lp = baskets.select("l_orderkey", F.explode("parts").alias("l_partkey"))
    pair = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) ->"
                    " transform(slice(parts, i + 2, size(parts)),"
                    " y -> struct(x AS pa, y AS pb))))"
                )
            ).alias("p")
        )
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= support)
    )
    if checkpoint:
        pair = pair.localCheckpoint(eager=False)
    return lp, pair


@query(
    "q_rfm_segments",
    tags=("A1", "W1"),
    oracle=f"""
WITH base AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS frequency,
         SUM({money_sql('o_totalprice')}) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey,
         NTILE(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_q,
         NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_q,
         NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_q
  FROM base
)
SELECT r_q, f_q, m_q, COUNT(*) AS n_customers
FROM scored GROUP BY r_q, f_q, m_q
ORDER BY r_q, f_q, m_q
""",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): RFM segmentation — recency/frequency/monetary
    quartiles per customer, rolled up to segment counts (the 4×4×4
    marketing cube). Every NTILE ordering carries o_custkey as the
    final key so quartile boundaries are total-order deterministic;
    monetary is an exact decimal sum, so the m-ordering has no float
    tie hazard.

    Scale shape: one groupBy(custkey) over orders (map-side combine),
    then three exact quartile passes over the |customers| aggregate
    frame via global_ntile (scale.py) — each a parallel range exchange
    + per-partition local sort + broadcast offsets, never the
    single-partition sort a global-window NTILE compiles to (until r9
    this leaned on "customers fit one task"; now the rank step
    parallelizes like everything else). The frame is eagerly
    checkpointed first — its consumers are concurrent stages (the
    q_dedup_fuzzy rule). The three quartile columns are ranked
    INDEPENDENTLY off the checkpointed base and equi-joined back on
    custkey, not chained — chaining global_ntile calls nests each
    rank's two-consumer subtree inside the next and the plan grows
    ~4× per metric (the lint's lineage-blowup cap caught exactly that
    in this query's first r9 form)."""
    from .scale import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(money("o_totalprice")).alias("monetary"),
        )
        .localCheckpoint(eager=True)
    )
    scored = base.select("o_custkey")
    for col, out in (
        ("last_order", "r_q"),
        ("frequency", "f_q"),
        ("monetary", "m_q"),
    ):
        ranked = global_ntile(
            base.select("o_custkey", col),
            [F.col(col).desc(), F.col("o_custkey")],
            4,
            out_col=out,
        ).select("o_custkey", out)
        scored = scored.join(ranked, "o_custkey")
    scored = scored.select("o_custkey", "r_q", "f_q", "m_q")
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r_q", "f_q", "m_q")
    )


@query(
    "q_copurchase_pairs",
    tags=("J1", "A1"),
    oracle="""
WITH lp AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT part_a, part_b, n_orders FROM pairs WHERE n_orders >= 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 100
""",
)
def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): co-purchase affinity — unordered part pairs that
    appear in the same order, counted across orders (market-basket
    support counts, the input to association-rule mining).

    Scale shape: the self-join is an equi-join on l_orderkey — pairs
    are generated WITHIN an order only, so the blow-up is bounded by
    max basket size squared (TPC-H: ≤ 7 lines), never corpus-sized.
    The distinct-per-order projection shrinks the join input first and
    shares the orderkey hash partitioning with the join. Pair counts
    aggregate map-side (part×part keys). Substrate shared via
    basket_pairs."""
    _, pair = basket_pairs(spark, sf_dir, need_lp=False)
    return (
        pair.select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("n_both").alias("n_orders"),
        )
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(100)
    )


@query(
    "q_revenue_gini",
    tags=("A7", "W4"),
    oracle=f"""
WITH rev AS (
  SELECT o_custkey, SUM({money_sql('o_totalprice')}) AS x
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i FROM rev
)
SELECT COUNT(*) AS n_customers,
       ROUND(
         CAST(2 * SUM(i * x) AS DOUBLE) / (COUNT(*) * CAST(SUM(x) AS DOUBLE))
         - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
FROM ranked
""",
)
def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): Gini coefficient of revenue concentration across
    customers — G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending-sorted
    per-customer revenue (the whale-dependence KPI; same machinery
    gives per-domain token-share concentration on a training corpus).
    Ranks break ties by custkey and revenue is an exact decimal, so
    the rank→value pairing is engine-stable; Σ(i·x) stays in decimal
    (exact, order-independent) until the final double division.

    Scale shape: groupBy(custkey) compresses orders to |customers|
    rows; the global rank is global_row_number (scale.py) — range
    exchange + per-partition local sort + broadcast offsets, so the
    rank step parallelizes even if customers outgrow one task (until
    r9 this was a single-task global Window); the final agg is a
    1-row reduce."""
    from .scale import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(F.sum(money("o_totalprice")).alias("x"))
    ranked = global_row_number(rev, ["x", "o_custkey"], out_col="i").select("x", "i")
    n = F.count(F.lit(1))
    return ranked.agg(
        n.alias("n_customers"),
        F.round(
            (2 * F.sum(F.col("i") * F.col("x"))).cast("double")
            / (n * F.sum("x").cast("double"))
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )


@query(
    "q_order_gap_stats",
    tags=("W3", "A8"),
    oracle="""
WITH b AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(floor(epoch(o_orderdate)) AS BIGINT) AS sec
  FROM orders
),
g AS (
  SELECT o_custkey,
         sec - LAG(sec) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS gap_s
  FROM b
)
SELECT o_custkey,
       COUNT(gap_s) AS n_gaps,
       CAST((SUM(gap_s) * 10000) // (86400 * COUNT(gap_s)) AS DOUBLE) / 10000.0
         AS avg_gap_days,
       CAST((CAST(2 * MEDIAN(gap_s) AS BIGINT) * 10000) // 172800 AS DOUBLE) / 10000.0
         AS median_gap_days,
       CAST((MAX(gap_s) * 10000) // 86400 AS DOUBLE) / 10000.0
         AS max_gap_days
FROM g WHERE gap_s IS NOT NULL
GROUP BY o_custkey
HAVING COUNT(gap_s) >= 3
ORDER BY o_custkey
""",
)
def q_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): inter-purchase gap statistics per customer —
    mean/median/max days between consecutive orders (the
    churn-predictor feature: a customer whose current silence exceeds
    their own max gap is at risk; pairs with q_rfm_segments' recency
    quartile). Ordering carries o_orderkey so equal-date orders have a
    deterministic LAG.

    Scale shape: one hashpartition(custkey) window then a groupBy on
    the same key — Catalyst reuses the exchange; the exact median runs
    over each customer's own gap list (tiny frames), with
    approx_percentile as the documented swap if per-key cardinality
    ever explodes.

    Determinism: day values are seconds/86400 rationals that can land
    on .00005 rounding ties where the engines' ROUND algorithms split
    (exact.py problem 2), so every day column is TRUNCATED to 4dp in
    integer math (gaps stay integer seconds; 2·MEDIAN of ints is an
    exactly-representable integer double → bigint)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    sec = F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
    gap = sec - F.lag(sec).over(w)
    return (
        orders.withColumn("gap_s", gap)
        .filter(F.col("gap_s").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.sum("gap_s").alias("sum_s"),
            F.median("gap_s").alias("med_s"),
            F.max("gap_s").alias("max_s"),
        )
        .filter(F.col("n_gaps") >= 3)
        .select(
            "o_custkey",
            "n_gaps",
            F.expr(
                "CAST((sum_s * 10000) DIV (86400 * n_gaps) AS DOUBLE) / 10000.0"
            ).alias("avg_gap_days"),
            F.expr(
                "CAST((CAST(2 * med_s AS BIGINT) * 10000) DIV 172800 AS DOUBLE) / 10000.0"
            ).alias("median_gap_days"),
            F.expr("CAST((max_s * 10000) DIV 86400 AS DOUBLE) / 10000.0").alias(
                "max_gap_days"
            ),
        )
        .orderBy("o_custkey")
    )


def _pagerank_oracle(iters: int) -> str:
    """Generate the DuckDB twin of plans/graph.pagerank as a chain of
    unrolled per-iteration CTEs (DuckDB's recursive CTEs can't carry
    the full-frame join each round needs; unrolling keeps the algebra
    identical to the Spark loop)."""
    head = """
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
deg AS (SELECT src, COUNT(*) AS d FROM pairs GROUP BY src),
e AS (SELECT p.src, p.dst, 1.0 / deg.d AS w FROM pairs p JOIN deg ON p.src = deg.src),
nodes AS (SELECT DISTINCT src AS node FROM pairs),
t AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / t.n AS rank FROM nodes, t)"""
    body = ""
    for i in range(1, iters + 1):
        body += f""",
c{i} AS (
  SELECT e.dst AS node, SUM(r{i - 1}.rank * e.w) AS contrib
  FROM r{i - 1} JOIN e ON r{i - 1}.node = e.src GROUP BY e.dst
),
r{i} AS (
  SELECT n.node, 0.15 / t.n + 0.85 * COALESCE(c{i}.contrib, 0.0) AS rank
  FROM nodes n CROSS JOIN t LEFT JOIN c{i} ON n.node = c{i}.node
)"""
    return head + body + f"""
SELECT node AS part, ROUND(rank, 6) AS rank FROM r{iters} ORDER BY node"""


@query(
    "q_pagerank_copurchase",
    tags=("J1", "A1"),
    oracle=_pagerank_oracle(5),
)
def q_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): PageRank over the co-purchase graph — parts that
    anchor many baskets rank highest (the substitutability/centrality
    score recommender pipelines consume). Edges are the distinct
    mirrored co-purchase pairs; 5 damped iterations via
    plans/graph.pagerank (join-per-round, lineage-truncated). The
    oracle unrolls the identical algebra as chained CTEs, so an
    ITERATIVE algorithm sits under the driver's hash gate — ranks
    round to 6dp, far above float-summation noise (~1e-16) and the
    mirrored graph has no dangling nodes, so the redistribution term
    is exactly zero on both engines.

    Scale shape: per round one rank⋈edges shuffle keyed on src and one
    groupBy(dst) — both map-side combinable; the per-round driver
    round-trip is the scalar n only (the k-means design)."""
    from ..plans.graph import pagerank

    lp = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = lp.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = lp.select("l_orderkey", F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return (
        pagerank(edges, iterations=5)
        .select(F.col("node").alias("part"), F.round("rank", 6).alias("rank"))
        .orderBy("part")
    )


@query(
    "q_market_basket",
    tags=("J1", "A1", "O2"),
    oracle="""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
t AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM lp),
item AS (SELECT l_partkey, COUNT(*) AS n_item FROM lp GROUP BY l_partkey),
pair AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_both
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= 2
),
directed AS (
  SELECT pa AS antecedent, pb AS consequent, n_both FROM pair
  UNION ALL
  SELECT pb, pa, n_both FROM pair
)
SELECT d.antecedent, d.consequent, CAST(d.n_both AS BIGINT) AS n_both,
       ROUND(CAST(d.n_both AS DOUBLE) / ia.n_item, 4) AS confidence,
       ROUND(CAST(d.n_both AS DOUBLE) * t.n / (ia.n_item * CAST(ic.n_item AS DOUBLE)), 4) AS lift
FROM directed d
JOIN item ia ON d.antecedent = ia.l_partkey
JOIN item ic ON d.consequent = ic.l_partkey
CROSS JOIN t
ORDER BY n_both DESC, antecedent, consequent
LIMIT 100
""",
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 4): association rules over the co-purchase support
    counts — for each directed rule a→b with pair support ≥ 2:
    confidence = P(b|a) = n(a,b)/n(a) and lift = P(a,b)/(P(a)P(b)) =
    n(a,b)·N/(n(a)·n(b)), the Apriori outputs a recommender consumes
    downstream of q_copurchase_pairs.

    Determinism: every score is one per-row double expression over
    exact integer counts (bit-identical across engines); ordering is
    by the integer support with id tiebreaks, so the top-100 cut never
    rides a float comparison.

    Scale shape: pairs are generated within an order (bounded by max
    basket size², never corpus-sized); item counts and the N scalar
    partial-aggregate map-side; item stats join back by part key —
    broadcastable (|parts| ≪ |lineitem|); top-100 is a TakeOrdered.
    Substrate shared (and computed once) via basket_pairs."""
    lp, pair = basket_pairs(spark, sf_dir)
    n_orders = lp.select(F.countDistinct("l_orderkey").alias("n"))
    item = lp.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    directed = pair.select(
        F.col("pa").alias("antecedent"), F.col("pb").alias("consequent"), "n_both"
    ).unionByName(
        pair.select(
            F.col("pb").alias("antecedent"), F.col("pa").alias("consequent"), "n_both"
        )
    )
    ia = item.select(F.col("l_partkey").alias("antecedent"), F.col("n_item").alias("n_ant"))
    ic = item.select(F.col("l_partkey").alias("consequent"), F.col("n_item").alias("n_cons"))
    return (
        directed.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "antecedent",
            "consequent",
            F.col("n_both").cast("bigint").alias("n_both"),
            F.round(F.col("n_both").cast("double") / F.col("n_ant"), 4).alias(
                "confidence"
            ),
            F.round(
                F.col("n_both").cast("double")
                * F.col("n")
                / (F.col("n_ant") * F.col("n_cons").cast("double")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.col("n_both").desc(), "antecedent", "consequent")
        .limit(100)
    )


@query(
    "q_decile_lift",
    tags=("W1", "A1"),
    oracle=f"""
WITH rev AS (
  SELECT o_custkey, SUM({money_sql('o_totalprice')}) AS r
  FROM orders GROUP BY o_custkey
),
d AS (
  SELECT o_custkey, r,
         NTILE(10) OVER (ORDER BY r DESC, o_custkey) AS decile
  FROM rev
),
agg AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers, SUM(r) AS dec_rev
  FROM d GROUP BY decile
)
SELECT CAST(decile AS BIGINT) AS decile, n_customers,
       CAST(dec_rev AS DOUBLE) AS revenue,
       ROUND(CAST(SUM(dec_rev) OVER (ORDER BY decile) AS DOUBLE)
             / CAST(SUM(dec_rev) OVER () AS DOUBLE), 6) AS cum_share,
       ROUND(CAST(SUM(dec_rev) OVER (ORDER BY decile) AS DOUBLE)
             / CAST(SUM(dec_rev) OVER () AS DOUBLE) / (decile / 10.0), 6) AS lift
FROM agg
ORDER BY decile
""",
)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 4): decile gains/lift table — customers ranked into
    revenue deciles (NTILE over exact decimal spend, custkey tiebreak);
    per decile the customer count, revenue, cumulative revenue share,
    and lift vs a uniform base (cum_share ÷ decile/10). The standard
    campaign-targeting readout ("the top decile carries 4.2× its
    share").

    Determinism: spend and the cumulative sums are exact decimals; the
    two rounded ratios divide bit-identical doubles. NTILE remainder
    semantics (first buckets get the extra rows) agree across engines
    given the identical total order.

    Scale shape: ONE orders scan — groupBy(custkey) partial-agg, then
    the decile rank over |customers| rows via global_ntile (scale.py:
    range exchange + per-partition sort + broadcast offsets — a
    parallel stage, not the single-task sort a global-window NTILE
    compiles to). The cumulative share and the total both come from
    windows over the 10-row decile aggregate, so no second corpus
    pass and no total-join exists (the first cut of this query
    recomputed rev for the total — two scans for a number derivable
    from the frame already in hand)."""
    from .scale import global_ntile

    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(money("o_totalprice")).alias("r"))
    )
    d = global_ntile(
        rev, [F.col("r").desc(), F.col("o_custkey")], 10, out_col="decile"
    )
    agg = d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("r").alias("dec_rev"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum_share = (
        F.sum("dec_rev").over(w_cum).cast("double")
        / F.sum("dec_rev").over(w_all).cast("double")
    )
    return agg.select(
        F.col("decile").cast("bigint").alias("decile"),
        "n_customers",
        F.col("dec_rev").cast("double").alias("revenue"),
        F.round(cum_share, 6).alias("cum_share"),
        F.round(cum_share / (F.col("decile") / 10.0), 6).alias("lift"),
    ).orderBy("decile")


@query(
    "q_triangle_count",
    bench=True,
    tags=("J1", "A1"),
    oracle="""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pair AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= 2
),
und AS (SELECT pa AS u, pb AS v FROM pair UNION ALL SELECT pb, pa FROM pair),
deg AS (SELECT u AS node, COUNT(*) AS d FROM und GROUP BY u),
ord_ AS (SELECT node, ROW_NUMBER() OVER (ORDER BY d, node) AS rk FROM deg),
ori AS (
  SELECT n.u, n.v, ou.rk AS ru, ov.rk AS rv
  FROM und n JOIN ord_ ou ON n.u = ou.node JOIN ord_ ov ON n.v = ov.node
  WHERE ou.rk < ov.rk
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM ori e1
  JOIN ori e2 ON e2.u = e1.u AND e1.rv < e2.rv
  JOIN ori e3 ON e3.u = e1.v AND e3.v = e2.v
),
members AS (
  SELECT a AS part FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT part, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM members GROUP BY part
ORDER BY part
""",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 4): per-node triangle counting over the co-purchase
    graph — the local clustering signal (parts whose neighborhoods
    close into cliques anchor coherent baskets; graph-feature input to
    community detection and recommendation, alongside PageRank's
    global centrality).

    Algorithm: DEGREE ORIENTATION — every undirected edge points from
    the lower (degree, id) endpoint to the higher, making the graph a
    DAG in which each triangle appears exactly once as two out-edges of
    its lowest-ranked vertex plus the closing edge. This is the bound
    that survives scale: the out-neighbor pair join fans out by
    out-degree, which orientation caps at O(√m) even for hub nodes
    (the plain adjacency self-join fans out by raw degree — quadratic
    in the hub).

    The graph is the SUPPORT-THRESHOLDED association graph (pairs
    co-purchased in ≥2 orders — q_market_basket's rule universe):
    support pruning is the standard first stage of co-occurrence graph
    mining, and it is also what makes triangle counting tractable — on
    the unthresholded graph the out-neighbor pair fanout is Σdeg²,
    which measured OOM at sf0.1 (~1.2M near-clique edges); thresholded
    it is a few thousand edges at every SF.

    Scale shape: pairs generate within orders (basket-bounded); the
    rank table is |nodes| rows (broadcastable); the three-way edge
    join shuffles on edge keys only. All integers — exact cross-engine
    hashes.

    The three multiply-consumed frames (pair ×2 via und, ori ×3 via
    e1/e2/e3, tri ×3 via members) are lazily localCheckpoint'ed:
    Spark's ReuseExchange cannot dedupe them (each consumer projects
    different columns below the exchange, so the canonical plans
    differ) and without truncation the expensive basket self-join
    re-executed ~5× — measured 4.7 s → 1.x s at sf0.01. Lazy
    checkpoints keep the materialization inside the caller's single
    action (the pagerank lesson, plans/graph.py).

    Optimization r12: the degree ORDER is only an orientation
    comparator — the triangle set (and so every per-node count) is
    identical under any strict total order of the nodes, and
    (d, node) already IS one (node unique by groupBy). The previous
    form materialized consecutive ranks through the fenced
    global_row_number helper (its own checkpoint + two window passes
    + n_parts broadcast — VERDICT r9 #3's machinery), paying a
    multi-stage fence for consecutiveness nothing downstream needs.
    Comparing (d, node) STRUCTS directly drops the whole fence from
    the plan; deg stays a broadcast join either way. Oracle parity is
    unchanged by construction (orientation-independence) and re-pinned
    green at sf0.001/0.01/0.1."""
    _, pair = basket_pairs(spark, sf_dir, need_lp=False)
    und = pair.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionByName(
        pair.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = und.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    ori = (
        und.join(
            F.broadcast(
                deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
            ),
            "u",
        )
        .join(
            F.broadcast(
                deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
            ),
            "v",
        )
        .filter(F.struct("du", "u") < F.struct("dv", "v"))
        .select("u", "v", F.struct("dv", "v").alias("rv"))
    ).localCheckpoint(eager=False)
    e1 = ori.select(F.col("u").alias("a"), F.col("v").alias("b"), F.col("rv").alias("rb"))
    e2 = ori.select(F.col("u").alias("a"), F.col("v").alias("c"), F.col("rv").alias("rc"))
    e3 = ori.select(F.col("u").alias("b"), F.col("v").alias("c"))
    tri = (
        e1.join(e2, "a")
        .filter(F.col("rb") < F.col("rc"))
        .select("a", "b", "c")
        .join(e3, ["b", "c"])
    ).localCheckpoint(eager=False)
    members = (
        tri.select(F.col("a").alias("part"))
        .unionByName(tri.select(F.col("b").alias("part")))
        .unionByName(tri.select(F.col("c").alias("part")))
    )
    return (
        members.groupBy("part")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
        .orderBy("part")
    )


@query(
    "q_weighted_median",
    tags=("A8",),
    oracle=f"""
WITH per_price AS (
  SELECT l_returnflag, {money_sql('l_extendedprice')} AS price,
         SUM(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem GROUP BY l_returnflag, price
),
cum AS (
  SELECT l_returnflag, price, w,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price) AS cw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM per_price
)
SELECT l_returnflag, CAST(MIN(price) AS DOUBLE) AS wmedian_price,
       CAST(MIN(tw) AS BIGINT) AS total_weight
FROM cum WHERE 2 * cw >= tw
GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 4): quantity-weighted median price per return flag —
    the weighted-percentile aggregate (reference exposes only unweighted
    percentiles; weighting by a second column is the common "median
    price per unit sold" form).

    Scale shape: pre-aggregate to one row per (group, price) FIRST
    (map-side combinable; collapses the 100 TB fact to |groups|×|distinct
    prices| rows), then a single window cumsum over the collapsed frame
    picks the crossing point. Never sorts the raw fact table.

    Determinism: weights are integral quantities (exact BIGINT sums),
    prices exact decimals; the crossing predicate 2·cw ≥ tw is pure
    integer/decimal comparison — no float aggregation anywhere."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        money("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    per_price = li.groupBy("l_returnflag", "price").agg(F.sum("q").alias("w"))
    wcum = Window.partitionBy("l_returnflag").orderBy("price")
    wall = Window.partitionBy("l_returnflag")
    cum = per_price.select(
        "l_returnflag",
        "price",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wall).alias("tw"),
    )
    return (
        cum.filter(F.lit(2) * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").cast("double").alias("wmedian_price"),
            F.min("tw").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_pareto_concentration",
    tags=("A1", "W4"),
    oracle=f"""
WITH rev AS (
  SELECT p.p_brand, l.l_partkey,
         SUM({money_sql('l_extendedprice')}) AS part_rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, l.l_partkey
),
ranked AS (
  SELECT p_brand, part_rev,
         SUM(part_rev) OVER (PARTITION BY p_brand
                             ORDER BY part_rev DESC, l_partkey) AS cum_rev,
         SUM(part_rev) OVER (PARTITION BY p_brand) AS tot_rev,
         COUNT(*) OVER (PARTITION BY p_brand) AS n_parts,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY part_rev DESC, l_partkey) AS rk
  FROM rev
),
cut AS (
  SELECT p_brand, MIN(n_parts) AS n_parts, MIN(rk) AS n_parts_80
  FROM ranked WHERE 5 * cum_rev >= 4 * tot_rev
  GROUP BY p_brand
)
SELECT p_brand, n_parts, n_parts_80,
       CAST((n_parts_80 * 10000) // n_parts AS DOUBLE) / 10000.0 AS top_share
FROM cut ORDER BY p_brand
""",
)
def q_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 4): Pareto 80/20 concentration — per brand, the
    smallest number of parts whose cumulative revenue reaches 80% of
    the brand's total (the "how top-heavy is this catalog" report).

    Scale shape: fact collapses to |brand|×|part| rows in one map-side
    combinable agg before any window; the ranked cumsum then runs on
    the collapsed frame partitioned by brand (each partition is one
    brand's parts — thousands, not billions). The 80% crossing is the
    same min-over-threshold trick as q_weighted_median: no iterative
    scan, no driver loop.

    Determinism: revenue is exact decimal; 5·cum ≥ 4·tot is exact
    decimal comparison; the share is 4dp floor integer math (positive
    ints, so Spark DIV ≡ DuckDB //)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", money("l_extendedprice").alias("p")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "l_partkey")
        # exact decimal sum (NOT dsum: double cumsums over an unordered
        # window frame are order-nondeterministic, and the 80% crossing
        # compares against a 0.01-granular exact threshold)
        .agg(F.sum("p").alias("part_rev"))
    )
    wo = Window.partitionBy("p_brand").orderBy(
        F.col("part_rev").desc(), F.col("l_partkey")
    )
    wall = Window.partitionBy("p_brand")
    ranked = rev.select(
        "p_brand",
        F.sum("part_rev").over(wo).alias("cum_rev"),
        F.sum("part_rev").over(wall).alias("tot_rev"),
        F.count(F.lit(1)).over(wall).alias("n_parts"),
        F.row_number().over(wo).cast("bigint").alias("rk"),
    )
    return (
        ranked.filter(F.lit(5) * F.col("cum_rev") >= F.lit(4) * F.col("tot_rev"))
        .groupBy("p_brand")
        .agg(F.min("n_parts").alias("n_parts"), F.min("rk").alias("n_parts_80"))
        .select(
            "p_brand",
            "n_parts",
            "n_parts_80",
            F.expr(
                "CAST((n_parts_80 * 10000) DIV n_parts AS DOUBLE) / 10000.0"
            ).alias("top_share"),
        )
        .orderBy("p_brand")
    )


@query(
    "q_percent_of_parent",
    tags=("A1", "J3"),
    oracle=f"""
WITH nat AS (
  SELECT r.r_name, n.n_name,
         CAST(SUM({money_sql('o_totalprice')}) * 100 AS BIGINT) AS nat_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
),
lvl AS (
  SELECT r_name, n_name, nat_cents,
         SUM(nat_cents) OVER (PARTITION BY r_name) AS reg_cents,
         SUM(nat_cents) OVER () AS tot_cents
  FROM nat
)
SELECT r_name, n_name,
       CAST(nat_cents AS DOUBLE) / 100.0 AS nation_revenue,
       CAST((nat_cents * 10000) // reg_cents AS DOUBLE) / 10000.0 AS share_of_region,
       CAST((reg_cents * 10000) // tot_cents AS DOUBLE) / 10000.0 AS region_share_of_total
FROM lvl ORDER BY r_name, n_name
""",
)
def q_percent_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 4): ratio-to-parent report — every nation's revenue as
    a share of its region, and the region's share of the grand total,
    in one pass (the standard two-level drill-down header).

    Scale shape: orders⋈customer is the one real shuffle (customer is
    SF-proportional — NOT broadcastable at 100 TB); nation/region are
    broadcast. One agg collapses the fact to |nations| rows; both
    parent levels come from windows over that tiny frame — the grand
    total is a single-partition window over ~25 rows, not the fact.

    Determinism: decimal revenue converted to exact integer cents, then
    4dp floor integer math for both shares (positive ints → Spark DIV ≡
    DuckDB //)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", money("o_totalprice").alias("p")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    per_nat = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        # exact decimal sum (NOT dsum, which casts to double and would
        # truncate a 1e9-cent total below the integer it represents)
        .agg((F.sum("p") * F.lit(100)).cast("bigint").alias("nat_cents"))
    )
    wreg = Window.partitionBy("r_name")
    wtot = Window.partitionBy()
    lvl = per_nat.select(
        "r_name",
        "n_name",
        "nat_cents",
        F.sum("nat_cents").over(wreg).alias("reg_cents"),
        F.sum("nat_cents").over(wtot).alias("tot_cents"),
    )
    return lvl.select(
        "r_name",
        "n_name",
        (F.col("nat_cents").cast("double") / F.lit(100.0)).alias("nation_revenue"),
        F.expr("CAST((nat_cents * 10000) DIV reg_cents AS DOUBLE) / 10000.0").alias(
            "share_of_region"
        ),
        F.expr("CAST((reg_cents * 10000) DIV tot_cents AS DOUBLE) / 10000.0").alias(
            "region_share_of_total"
        ),
    ).orderBy("r_name", "n_name")


@query(
    "q_bfs_hops",
    tags=("J1", "A1"),
    oracle="""
WITH RECURSIVE
lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pair AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= 2
),
und AS (SELECT pa AS u, pb AS v FROM pair UNION ALL SELECT pb, pa FROM pair),
src AS (SELECT MIN(u) AS s FROM und),
bfs(node, dist) AS (
  SELECT s, 0 FROM src
  UNION
  SELECT e.v, b.dist + 1
  FROM bfs b JOIN und e ON e.u = b.node
  WHERE b.dist < 4
)
SELECT node AS part, CAST(MIN(dist) AS BIGINT) AS hops
FROM bfs GROUP BY node ORDER BY part
""",
)
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 4): single-source BFS — minimum hop distance (≤4)
    from the lowest-id part over the support-thresholded co-purchase
    graph (the "how related is everything to X" neighborhood query;
    the reachability primitive under recommendation walk-outs and
    blast-radius analyses).

    Scale shape: FRONTIER iteration, the Pregel pattern — each level
    is one frontier⋈edges join plus an anti-join against the visited
    set, both keyed on node; per-level work is proportional to the
    frontier's edge cut, never to |graph|. A node is claimed the
    first level it appears (the anti-join), which IS its BFS
    distance, so no min-aggregation re-visits are needed. Both the
    growing visited set and each frontier are lazily
    localCheckpoint'ed (visited is consumed twice per level — the
    pagerank/triangle lesson). The driver round-trip is the source
    id only. Oracle: DuckDB recursive CTE with MIN(dist).

    Determinism: pure integers; the anti-join level-claim equals the
    CTE's MIN(dist) exactly."""
    from ..plans.graph import bfs_hops

    _, pair = basket_pairs(spark, sf_dir, need_lp=False)
    edges = pair.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionByName(
        pair.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    source = edges.agg(F.min("src")).first()[0]
    return (
        bfs_hops(spark, edges, source, max_depth=4)
        .select(F.col("node").alias("part"), F.col("dist").alias("hops"))
        .orderBy("part")
    )


@query(
    "q_cohort_ltv",
    tags=("A1", "W4", "EXT"),
    oracle="""
WITH fo AS (
  SELECT o_custkey, MIN(o_orderdate) AS first_dt FROM orders GROUP BY 1
),
coh AS (
  SELECT o_custkey, CAST(year(first_dt) AS BIGINT) AS cy,
         CAST(month(first_dt) AS BIGINT) AS cm
  FROM fo
),
csize AS (SELECT cy, cm, CAST(COUNT(*) AS BIGINT) AS n_customers
          FROM coh GROUP BY 1, 2),
rev AS (
  SELECT c.cy, c.cm,
         CAST((year(o.o_orderdate) - c.cy) * 12
              + (month(o.o_orderdate) - c.cm) AS BIGINT) AS age_m,
         CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
  FROM orders o JOIN coh c ON o.o_custkey = c.o_custkey
),
agg AS (
  SELECT cy, cm, age_m, CAST(SUM(cents) AS BIGINT) AS cents
  FROM rev GROUP BY 1, 2, 3
),
cum AS (
  SELECT cy, cm, age_m,
         CAST(SUM(cents) OVER (PARTITION BY cy, cm ORDER BY age_m
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cents
  FROM agg
)
SELECT c.cy AS cohort_yr, c.cm AS cohort_mon, c.age_m,
       s.n_customers,
       CAST((c.cum_cents * 100) // s.n_customers AS DOUBLE) / 10000.0
         AS ltv_usd
FROM cum c JOIN csize s ON c.cy = s.cy AND c.cm = s.cm
ORDER BY cohort_yr, cohort_mon, age_m
""",
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 5): cohort lifetime-value curve — customers grouped
    by first-order month, cumulative revenue per customer tracked by
    months-since-acquisition. THE growth-finance query (payback period,
    LTV/CAC) and the revenue-weighted complement of q_retention_cohort's
    headcount matrix.

    Determinism: exact cents throughout; the cumulative sum runs over
    the (cohort, age) AGGREGATE (age is a total order within cohort —
    no peer ambiguity), and per-customer LTV is 4dp floor integer math.

    Scale shape: the first-order frame rides one hashpartition
    (o_custkey) agg, joins back to orders co-partitioned on the same
    key (no broadcast needed — both sides custkey-keyed), collapses
    map-side to |cohorts × ages| (≤ 80×80) rows, and the cumulative
    window + cohort-size join run on that tiny frame."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    coh = (
        orders.groupBy("o_custkey")
        .agg(F.min("o_orderdate").alias("first_dt"))
        .select(
            "o_custkey",
            F.year("first_dt").cast("bigint").alias("cy"),
            F.month("first_dt").cast("bigint").alias("cm"),
        )
    )
    csize = coh.groupBy("cy", "cm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )
    rev = orders.join(coh, "o_custkey").select(
        "cy",
        "cm",
        (
            (F.year("o_orderdate").cast("bigint") - F.col("cy")) * 12
            + (F.month("o_orderdate").cast("bigint") - F.col("cm"))
        ).alias("age_m"),
        "cents",
    )
    agg = rev.groupBy("cy", "cm", "age_m").agg(F.sum("cents").alias("cents"))
    w_cum = Window.partitionBy("cy", "cm").orderBy("age_m").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = agg.select(
        "cy", "cm", "age_m", F.sum("cents").over(w_cum).cast("bigint").alias("cum_cents")
    )
    return (
        cum.join(F.broadcast(csize), ["cy", "cm"])
        .selectExpr(
            "cy AS cohort_yr",
            "cm AS cohort_mon",
            "age_m",
            "n_customers",
            "CAST((cum_cents * 100) DIV n_customers AS DOUBLE) / 10000.0 AS ltv_usd",
        )
        .orderBy("cohort_yr", "cohort_mon", "age_m")
    )
