"""Window functions (SURVEY.md §2.5, W1-W6).

W6 is the REF-grounded one: the informer cache materializes
latest-state-per-key (/root/reference/syncer/controllers/
krmsyncer_controller.go:327-375) — exactly `row_number()==1` over the
key ordered by descending version/time. The streaming CDC path has a
seq-typed twin of the same compaction (streaming/cdc.latest_op).

Determinism: every window ORDER BY ends in a unique key so rank/lag
results are stable across partitionings (and across engines).

Scale notes: window partitionBy is one hash shuffle on the key; frames
are evaluated with a streaming buffer per partition — no quadratic
blowup. Skewed keys (one user with 10⁹ events) are the risk at 100 TB;
for those paths, pre-aggregate or salt before windowing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def latest_state(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Latest row per key — the informer-cache compaction (W6/REF).
    order_cols must end in a unique column (the module's determinism
    rule); all are applied descending. Delegates to the ONE shared
    compaction (streaming/cdc.latest_op) so the batch query and the
    streaming MERGE sink can never drift apart."""
    from ..streaming.cdc import latest_op

    return latest_op(df, key_cols, order_cols)


@query(
    "q_window_rank",
    tags=("W1",),
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile
FROM customer
WHERE c_custkey <= 1000
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
ORDER BY c_mktsegment, rn
""",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: ranking family over a per-segment window."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 1000)
        .select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
        )
        .orderBy("c_mktsegment", "rn")
    )


@query(
    "q_window_topk_group",
    bench=True,
    tags=("W2",),
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
ORDER BY o_custkey, rn
""",
)
def q_window_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: top-k per group — rank filter ≤ k; Catalyst pushes the
    rn<=3 limit into the window sort (WindowGroupLimit) so each
    partition keeps only k rows."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@query(
    "q_window_lag_lead",
    tags=("W3",),
    oracle="""
SELECT user_id, event_id, event_type,
       LAG(event_type) OVER w AS prev_type,
       LEAD(event_type) OVER w AS next_type,
       FIRST_VALUE(event_id) OVER w AS first_event
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
ORDER BY user_id, event_id
""",
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: analytic lag/lead/first over per-user event time."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            F.first("event_id").over(w).alias("first_event"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q_window_running_sum",
    tags=("W4",),
    oracle="""
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(14,2))) OVER (
         PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_value
FROM events
WHERE user_id < 20
ORDER BY user_id, event_id
""",
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: running aggregate with an explicit ROWS frame (decimal-exact
    so prefix sums are order-independent bit-for-bit)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .select(
            "user_id",
            "event_id",
            F.sum(F.col("value").cast("decimal(14,2)"))
            .over(w)
            .cast("double")
            .alias("running_value"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q_window_range_frame",
    tags=("W5",),
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       COUNT(*) OVER (
         PARTITION BY o_custkey ORDER BY o_orderkey
         RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW
       ) AS n_near
FROM orders
WHERE o_custkey < 50
ORDER BY o_custkey, o_orderkey
""",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: RANGE frame over a numeric ordering key — counts orders whose
    orderkey lies within 10000 below the current row's."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderkey").asc())
        .rangeBetween(-10000, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.count(F.lit(1)).over(w).alias("n_near"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "q_window_last_state",
    tags=("W6",),
    oracle="""
SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP_NS) AS ts FROM (
  SELECT user_id, event_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id
""",
)
def q_window_last_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 (REF): latest state per key — the informer-cache/CDC
    compaction (krmsyncer_controller.go:327-375) via the latest_state
    helper."""
    ev = load_table(spark, sf_dir, "events")
    return (
        latest_state(ev, ["user_id"], ["ts", "event_id"])
        .select("user_id", "event_id", "event_type", "ts")
        .orderBy("user_id")
    )


@query(
    "q_window_distribution",
    tags=("W1",),
    oracle="""
SELECT c_custkey, c_mktsegment,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cdist
FROM customer
WHERE c_custkey < 300
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
ORDER BY c_custkey
""",
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1b: distribution window functions — ntile bucketing,
    percent_rank, cume_dist per segment (the balance-percentile family
    the rank query doesn't cover). Deterministic ordering via the
    (c_acctbal, c_custkey) composite sort key; both ratios are exact
    rationals of identical row counts, so the 6dp round is tie-free."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 300)
        .select(
            "c_custkey",
            "c_mktsegment",
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
        .orderBy("c_custkey")
    )


@query(
    "q_window_running_distinct",
    tags=("W4", "A3"),
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY user_id, event_type ORDER BY ts, event_id
              ) = 1 THEN 1 ELSE 0 END AS is_first
  FROM events
)
SELECT user_id, event_id,
       CAST(SUM(is_first) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS distinct_types_so_far
FROM flagged
ORDER BY user_id, event_id
""",
)
def q_window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/A3 (EXT, round 4): RUNNING distinct count per key — after
    each event, how many distinct event types has this user produced
    so far? `COUNT(DISTINCT) OVER (...)` is unsupported in both
    engines' windowed form; the standard re-expression is two stacked
    windows: flag each row that is the FIRST occurrence of its
    (user, type) (row_number = 1 over the value partition), then a
    running SUM of the flags over event order — the is-first flag
    linearizes set growth into an additive quantity.

    Determinism: pure integers over the total order (ts, event_id).

    Scale shape: two window exchanges — (user, type) for the
    first-occurrence flag, then user for the running sum (the finer
    partitioning is not reusable for the coarser one) — but no joins,
    no distinct-Expand, and window state is O(partition); the
    COUNT(DISTINCT)-per-prefix alternative would be a per-row
    set-aggregation blowup."""
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("is_first"),
        )
        .select(
            "user_id",
            "event_id",
            F.sum("is_first").over(w_run).cast("bigint").alias("distinct_types_so_far"),
        )
        .orderBy("user_id", "event_id")
    )
