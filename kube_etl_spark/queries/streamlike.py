"""Streaming-operator batch equivalents (SURVEY.md §2.9, ST1-ST7).

Each q_stream_*/q_cdc_* runs the SAME builder code that the real
Structured Streaming pipelines use (kube_etl_spark/streaming/*) — the
builders are mode-agnostic DataFrame transforms, so running them on the
batch events fixture IS the declared batch-equivalent semantics the
DuckDB oracle checks. The true streaming behavior (watermarks dropping
late rows, micro-batch MERGE idempotence, availableNow replay) is
asserted in tests/test_streaming.py and tests/test_sync.py.

Reference provenance: ST6/ST7 are the KRMSyncer's actual data path
(idempotent SSA upsert + NotFound retraction,
/root/reference/syncer/controllers/krmsyncer_controller.go:586-624,
417-423, 489-504); windows/watermarks are EXT (the reference has none).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from ..streaming import windowed
from ..streaming.cdc import latest_op


@query(
    "q_stream_tumbling",
    bench=True,
    tags=("ST1",),
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP_NS) AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
ORDER BY 1
""",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1: tumbling 1-hour event-time window (epoch-aligned, so the
    batch oracle is date_trunc)."""
    ev = load_table(spark, sf_dir, "events")
    return windowed.tumbling(ev, "1 hour").orderBy("window_start")


@query(
    "q_stream_sliding",
    tags=("ST2",),
    oracle="""
SELECT CAST(time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes'
            AS TIMESTAMP_NS) AS window_start,
       COUNT(*) AS n_events
FROM events, (SELECT unnest(range(0, 4)) AS k) k
GROUP BY 1
ORDER BY 1
""",
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2: sliding 1h/15m window — every event lands in exactly 4
    windows; oracle generates the 4 slide offsets per event."""
    ev = load_table(spark, sf_dir, "events")
    return windowed.sliding(ev, "1 hour", "15 minutes").orderBy("window_start")


@query(
    "q_stream_session",
    tags=("ST3",),
    oracle="""
WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM o
)
SELECT user_id, CAST(MIN(ts) AS TIMESTAMP_NS) AS session_start, COUNT(*) AS n_events
FROM s
GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3: per-user session windows, 30-minute gap; a gap ≥ 30m starts
    a new session (session end is exclusive). Oracle = gaps-and-islands."""
    ev = load_table(spark, sf_dir, "events")
    return windowed.session(ev, "30 minutes").orderBy("user_id", "session_start")


@query(
    "q_stream_watermark",
    tags=("ST4",),
    oracle="""
WITH o AS (
  SELECT event_type, ts,
         MAX(ts) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events
)
SELECT event_type,
       CAST(SUM(CASE WHEN ts < wm - INTERVAL '10 minutes' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late,
       COUNT(*) AS n_total
FROM o
GROUP BY event_type
ORDER BY event_type
""",
)
def q_stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 batch analog: late-data accounting under a 10-minute
    watermark with per-row advancement in arrival order (event_id).
    The real micro-batch drop behavior is asserted in
    tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events")
    return windowed.late_data_accounting(ev, "10 minutes")


@query(
    "q_stream_dedup",
    tags=("ST5",),
    oracle="""
WITH aug AS (
  SELECT * FROM events
  UNION ALL
  SELECT * FROM events WHERE event_id < 500
),
d AS (SELECT DISTINCT * FROM aug)
SELECT event_type, COUNT(*) AS n_events
FROM d
GROUP BY event_type
ORDER BY event_type
""",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5: dedup by event_id — the duplicated delivery case (an
    at-least-once source re-emits events; copies are byte-identical).
    Streaming twin: dropDuplicates within watermark."""
    ev = load_table(spark, sf_dir, "events")
    aug = ev.unionByName(ev.filter(F.col("event_id") < 500))
    return (
        aug.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type")
    )


def _with_op(ev: DataFrame) -> DataFrame:
    """events as a CDC op-log keyed on user_id: 'error' ⇒ delete
    (the NotFound retraction analog), anything else ⇒ upsert."""
    return ev.withColumn(
        "op",
        F.when(F.col("event_type") == "error", "delete").otherwise("upsert"),
    )


@query(
    "q_cdc_upsert",
    tags=("ST6",),
    oracle="""
SELECT user_id, event_id, value
FROM (
  SELECT user_id, event_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
""",
)
def q_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6 (REF): last-writer-wins upsert compaction with deletes —
    the destination-state MERGE the KRMSyncer performs per event
    (krmsyncer_controller.go:586-624), as one batch compaction using
    the same latest_op helper the streaming StateTable sink uses."""
    ops = _with_op(load_table(spark, sf_dir, "events"))
    last = latest_op(ops, ["user_id"], ["ts", "event_id"])
    return (
        last.filter(F.col("op") != "delete")
        .select("user_id", "event_id", "value")
        .orderBy("user_id")
    )


@query(
    "q_cdc_apply_oplog",
    tags=("ST7",),
    oracle="""
WITH last AS (
  SELECT user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
),
ops AS (
  SELECT user_id,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
         value
  FROM last
)
SELECT COALESCE(c.c_custkey, o.user_id) AS key,
       CASE WHEN o.op = 'upsert' THEN o.value ELSE c.c_acctbal END AS final_value,
       CASE WHEN o.op = 'upsert' THEN 'oplog' ELSE 'snapshot' END AS src
FROM customer c FULL JOIN ops o ON c.c_custkey = o.user_id
WHERE o.op IS NULL OR o.op <> 'delete'
ORDER BY key
""",
)
def q_cdc_apply_oplog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST7 (REF): apply an op-log to a snapshot — full-outer MERGE where
    upserts override/insert and deletes remove (delete propagation,
    krmsyncer_controller.go:489-504). Snapshot = customer keyed by
    c_custkey; op-log = events keyed by user_id."""
    snap = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ops = latest_op(
        _with_op(load_table(spark, sf_dir, "events")), ["user_id"], ["ts", "event_id"]
    ).select("user_id", "op", "value")
    merged = snap.join(ops, snap.c_custkey == ops.user_id, "full")
    return (
        merged.filter(F.col("op").isNull() | (F.col("op") != "delete"))
        .select(
            F.coalesce("c_custkey", "user_id").alias("key"),
            F.when(F.col("op") == "upsert", F.col("value"))
            .otherwise(F.col("c_acctbal"))
            .alias("final_value"),
            F.when(F.col("op") == "upsert", "oplog")
            .otherwise("snapshot")
            .alias("src"),
        )
        .orderBy("key")
    )


@query(
    "q_stream_stream_join",
    tags=("ST8", "J8"),
    oracle="""
SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '10 minutes'
ORDER BY click_id, purchase_id
""",
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, batch semantics: click→purchase
    attribution within a 10-minute window per user. This exact
    time-range condition is what makes the STREAMING version's state
    bounded — each side keeps only rows inside the watermarked interval
    (the real stream-stream run is tests/test_streaming.py's
    attribution test). At 100 TB the join shuffles both sides on
    user_id once; the interval predicate prunes within partitions."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") > F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 10 minutes")),
        )
        .select("click_id", "purchase_id", "user_id")
        .orderBy("click_id", "purchase_id")
    )


@query(
    "q_rollup_multires",
    tags=("ST1", "rollup"),
    oracle="""
SELECT CAST(bucket_start AS TIMESTAMP_NS) AS bucket_start, resolution, n_events, total_value FROM (
  SELECT date_trunc('hour', ts) AS bucket_start, '1 hour' AS resolution,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
  FROM events GROUP BY 1
  UNION ALL
  SELECT date_trunc('day', ts), '1 day',
         COUNT(*),
         CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE)
  FROM events GROUP BY 1
)
ORDER BY resolution, bucket_start
""",
)
def q_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup (hour + day buckets),
    batch semantics of the continuously-maintained table in
    streaming/rollup.py (whose stream≡batch equality is asserted in
    tests/test_streaming.py). Epoch-aligned windows ⇒ date_trunc oracle."""
    from ..streaming.rollup import rollup_aggregate

    ev = load_table(spark, sf_dir, "events")
    return (
        rollup_aggregate(ev, "1 hour")
        .unionByName(rollup_aggregate(ev, "1 day"))
        .orderBy("resolution", "bucket_start")
    )


@query(
    "q_scd2_intervals",
    bench=True,
    tags=("ST6", "ST7", "W3"),
    oracle="""
WITH oplog AS (
  SELECT user_id AS key, event_id AS seq, ts,
         CASE WHEN event_id % 7 = 0 THEN 'delete' ELSE 'upsert' END AS op
  FROM events
),
w AS (
  SELECT key, seq, op, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY key ORDER BY seq) AS valid_to
  FROM oplog
)
SELECT key, seq,
       CAST(valid_from AS TIMESTAMP_NS) AS valid_from,
       CAST(valid_to AS TIMESTAMP_NS) AS valid_to,
       CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM w
WHERE op <> 'delete'
ORDER BY key, seq
""",
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6/ST7 (round 4): SCD Type-2 historization of an op-log —
    every surviving version as a row with its validity interval
    [valid_from, valid_to), deletes closing their predecessor's
    interval and emitting no row. Runs the SAME scd2_history builder
    the incremental Scd2Table maintains per micro-batch
    (streaming/cdc.py:189) on the batch op-log (events reshaped:
    every 7th event_id is a delete), putting the CDC layer's
    historization semantics under the driver's hash gate — the
    incremental≡batch equivalence is pinned in tests/test_streaming.py.

    Scale shape: ONE lead() window over hashpartition(key) computes
    every interval — no self-join, no per-version scans; is_current
    emitted as bigint (cross-engine boolean canonicalization is not
    relied on)."""
    from ..streaming.cdc import scd2_history

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"),
        F.col("event_id").alias("seq"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.when(F.col("event_id") % 7 == 0, "delete").otherwise("upsert").alias("op"),
        F.col("props").alias("payload"),
    )
    return (
        scd2_history(ev, ["key"], "seq", "ts")
        .select(
            "key",
            "seq",
            "valid_from",
            "valid_to",
            F.col("is_current").cast("bigint").alias("is_current"),
        )
        .orderBy("key", "seq")
    )
