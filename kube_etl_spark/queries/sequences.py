"""Event-sequence operators over the events table (EXT; §2.9 adjacency).

The reference's data path is an ordered per-object event stream
(watch events applied in arrival order — syncer/controllers/
krmsyncer_controller.go's reconcile loop); these operators are the
analytical questions a user asks OF such a stream once it lands in a
table: how do states transition, how predictable is each emitter, how
do runs of identical states compress, and where did a series shift.
All are pure DataFrame/window plans keyed on user_id — one
hashpartition(user_id) exchange family each, no Python, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "q_event_transitions",
    tags=("W3", "A1"),
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT event_type AS from_state, nxt AS to_state,
       COUNT(*) AS n,
       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY event_type), 4) AS p
FROM s WHERE nxt IS NOT NULL
GROUP BY event_type, nxt
ORDER BY from_state, to_state
""",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): first-order Markov transition matrix — for each
    (state, next-state) pair over per-user event sequences, the count
    and the row-normalized transition probability. The per-user
    ordering is (ts, event_id) — a total order, so LEAD is
    deterministic.

    Scale shape: one hashpartition(user_id) window for LEAD, then a
    groupBy on the (from, to) pair — 25 output groups here, at most
    |states|² anywhere, so the second shuffle carries counts, not
    events. The normalizing SUM runs over the tiny aggregated frame
    (a |states|-partition window), never over raw rows."""
    ev = load_table(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            "event_type",
            F.lead("event_type").over(w_seq).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("from_state"), F.col("nxt").alias("to_state"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_norm = Window.partitionBy("from_state")
    return (
        pairs.select(
            "from_state",
            "to_state",
            "n",
            F.round(F.col("n") / F.sum("n").over(w_norm), 4).alias("p"),
        )
        .orderBy("from_state", "to_state")
    )


@query(
    "q_user_entropy",
    tags=("A1", "A7"),
    oracle="""
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY user_id, event_type
),
t AS (SELECT user_id, SUM(n) AS tot FROM c GROUP BY user_id)
SELECT c.user_id AS user_id,
       CAST(t.tot AS BIGINT) AS n_events,
       COUNT(*) AS n_types,
       ROUND(-SUM((c.n * 1.0 / t.tot) * LN(c.n * 1.0 / t.tot)), 4) AS entropy
FROM c JOIN t ON c.user_id = t.user_id
GROUP BY c.user_id, t.tot
ORDER BY c.user_id
""",
)
def q_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): Shannon entropy of each user's event-type mix —
    the behavioral-predictability score (bot detection: near-zero
    entropy = single-action loops; anomaly: entropy spikes). Two-level
    aggregation: (user, type) counts, then entropy over the counts.

    Scale shape: the (user, type) groupBy is the only shuffle over raw
    rows and partial-aggregates map-side; the per-user total comes from
    a window over the ALREADY-aggregated frame (≤ |states| rows per
    user) in the same user_id hash family — no join back to raw data,
    no second wide shuffle."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w_u = Window.partitionBy("user_id")
    frac = F.col("n") / F.sum("n").over(w_u)
    return (
        c.select(
            "user_id",
            F.sum("n").over(w_u).alias("n_events"),
            "n",
            (-frac * F.log(frac)).alias("term"),
        )
        .groupBy("user_id", "n_events")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.round(F.sum("term"), 4).alias("entropy"),
        )
        .orderBy("user_id")
    )


@query(
    "q_collapse_runs",
    tags=("W3", "ST7"),
    oracle="""
WITH s AS (
  SELECT user_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
           AS grp
  FROM events
)
SELECT user_id, event_type, CAST(MIN(ts) AS TIMESTAMP_NS) AS run_start, COUNT(*) AS run_len
FROM s
GROUP BY user_id, event_type, grp
HAVING COUNT(*) >= 2
ORDER BY user_id, run_start, event_type
""",
)
def q_collapse_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): run-length compression of per-user event streams
    — collapse consecutive identical event types into (start, length)
    runs, the gaps-and-islands shape. This is the batch analog of CDC
    event compaction (the reference coalesces a burst of updates to
    one object into the final state before syncing; SURVEY §3.3):
    runs ≥ 2 are exactly the bursts compaction would collapse.

    Scale shape: the two ROW_NUMBERs share one hashpartition(user_id)
    sort (same partition family, Catalyst plans one exchange), and the
    grouping key (user, type, rn−rk) aggregates map-side. Output is
    bounded by the number of runs, not events."""
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_type",
            "ts",
            (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("grp"),
        )
        .groupBy("user_id", "event_type", "grp")
        .agg(F.min("ts").alias("run_start"), F.count(F.lit(1)).alias("run_len"))
        .filter(F.col("run_len") >= 2)
        .select("user_id", "event_type", "run_start", "run_len")
        .orderBy("user_id", "run_start", "event_type")
    )


@query(
    "q_cusum_changepoint",
    tags=("W4", "A7"),
    oracle="""
WITH st AS (
  SELECT user_id, AVG(value) AS mu, STDDEV_SAMP(value) AS sd, COUNT(*) AS n
  FROM events GROUP BY user_id
),
c AS (
  SELECT e.user_id, st.n,
         SUM((e.value - st.mu) / st.sd)
           OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS cus
  FROM events e JOIN st ON e.user_id = st.user_id
  WHERE st.sd > 0
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       ROUND(MAX(ABS(cus)), 4) AS max_cusum
FROM c GROUP BY user_id, n
ORDER BY user_id
""",
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): CUSUM mean-shift score per series — cumulative
    sum of standardized deviations along each user's time-ordered
    values; the peak |CUSUM| is the classic change-point statistic (a
    stable series stays near 0, a level shift ramps linearly). Reports
    the peak only: the argmax row sits on a float near-tie knife edge,
    so it belongs in a tolerance-based test, not a hash-equal oracle.

    Scale shape: per-user mean/std are window aggregates in the SAME
    hashpartition(user_id) family as the cumulative window — one
    exchange, one sort, then a map-side-combinable groupBy(user). The
    cumulative SUM folds left-to-right over identical doubles in both
    engines (deterministic order ⇒ bit-stable, the q_ewma_smoothing
    argument)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w_u = Window.partitionBy("user_id")
    w_cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    mu = F.avg("value").over(w_u)
    sd = F.stddev_samp("value").over(w_u)
    n = F.count(F.lit(1)).over(w_u)
    cus = F.sum((F.col("value") - mu) / sd).over(w_cum)
    return (
        ev.withColumn("sd", sd)
        .withColumn("n", n)
        .filter(F.col("sd") > 0)
        .withColumn("cus", cus)
        .groupBy("user_id", F.col("n").alias("n_events"))
        .agg(F.round(F.max(F.abs(F.col("cus"))), 4).alias("max_cusum"))
        .orderBy("user_id")
    )


@query(
    "q_session_stats",
    tags=("ST", "A1"),
    oracle="""
WITH b AS (
  SELECT user_id, ts, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
),
e AS (
  SELECT user_id, ts, event_id, sec,
         CASE WHEN sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              OR LAG(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM b
),
s AS (
  SELECT user_id, sec,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM e
),
sessions AS (
  SELECT user_id, sess, COUNT(*) AS n_events,
         MAX(sec) - MIN(sec) AS dur_s
  FROM s GROUP BY user_id, sess
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST((SUM(n_events) * 10000) // COUNT(*) AS DOUBLE) / 10000.0
         AS avg_events_per_session,
       CAST((SUM(dur_s) * 10000) // (60 * COUNT(*)) AS DOUBLE) / 10000.0
         AS avg_session_minutes
FROM sessions GROUP BY user_id ORDER BY user_id
""",
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): per-user session SUMMARY over 30-minute-gap
    sessions — count, events per session, mean duration (the
    engagement rollup downstream of ST3's per-session windows and
    q_concurrency_profile's sweep, sharing their island definition).

    Scale shape: island detection and the session rollup share one
    hashpartition(user_id) exchange family (lag window → cumulative
    flag → (user, sess) agg → (user) agg, each map-side combinable
    after the first sort). Output is |users| rows.

    Determinism: both averages are rationals with small denominators
    (n, 60·n) that systematically land on .00005 rounding ties where
    Spark (HALF_UP on the exact decimal) and DuckDB (float nearbyint)
    disagree — exact.py problem 2. So they are TRUNCATED to 4dp in
    pure integer math (scale by 10⁴, integer-divide, exact int→double)
    — bit-identical in both engines by construction."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = sec - F.lag(sec).over(w_u)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    s = ev.withColumn(
        "sess",
        F.sum(new_sess).over(w_u.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn("sec", sec)
    sessions = s.groupBy("user_id", "sess").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("sec") - F.min("sec")).alias("dur_s"),
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.sum("dur_s").alias("sum_dur"),
        )
        .select(
            "user_id",
            "n_sessions",
            "n_events",
            F.expr(
                "CAST((n_events * 10000) DIV n_sessions AS DOUBLE) / 10000.0"
            ).alias("avg_events_per_session"),
            F.expr(
                "CAST((sum_dur * 10000) DIV (60 * n_sessions) AS DOUBLE) / 10000.0"
            ).alias("avg_session_minutes"),
        )
        .orderBy("user_id")
    )


@query(
    "q_mode_per_group",
    tags=("A1", "W2"),
    oracle="""
WITH cnt AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
),
rk AS (
  SELECT user_id, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM cnt
)
SELECT user_id, event_type AS mode_type, n AS n_occurrences
FROM rk WHERE rn = 1 ORDER BY user_id
""",
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 4): statistical mode per group — each user's most
    frequent event type (the categorical companion to A8's numeric
    percentiles; ties break to the lexicographically smallest type so
    the winner is deterministic, unlike a bare F.mode/arg_max).

    Scale shape: groupBy(user, type) count is map-side combinable and
    collapses the 100 TB event log to |users|×|types| rows; the
    ROW_NUMBER top-1 then runs per user on ≤|types| rows each — Spark
    plans it as WindowGroupLimit (rank pushed down, nothing sorted
    beyond the tiny per-user frame)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    cnt = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("n").alias("n_occurrences"),
        )
        .orderBy("user_id")
    )


@query(
    "q_rolling_active_users",
    tags=("A3", "ST2"),
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
obs AS (SELECT DISTINCT d AS day FROM ud),
exp AS (
  SELECT user_id, d, d + CAST(i AS INT) AS day
  FROM ud, range(7) t(i)
)
SELECT strftime(e.day, '%Y-%m-%d') AS day,
       COUNT(DISTINCT CASE WHEN e.d = e.day THEN e.user_id END) AS dau,
       COUNT(DISTINCT e.user_id) AS wau
FROM exp e JOIN obs o ON e.day = o.day
GROUP BY e.day ORDER BY e.day
""",
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 4): DAU / trailing-7-day WAU — the engagement
    headline metric, and the canonical exact-distinct-over-SLIDING-
    window problem (q_window_running_distinct is the cumulative
    cousin; a plain COUNT(DISTINCT) OVER a moving frame is unsupported
    and would be quadratic anyway).

    Scale shape: collapse the 100 TB event log to distinct
    (user, day) pairs FIRST (map-side combinable; |users|×|days|
    rows), then fan each pair out to the ≤7 window days it
    contributes to and count distinct per day. The fan-out rides the
    tiny collapsed frame — never the raw log — and both metrics share
    one shuffle keyed on day. The same expansion gives any trailing
    window W at |users|×|days|×W cost; for W ≫ 30 switch to the
    bitmap layer (plans/sketches.py) which ORs per-day bitmaps
    instead.

    Output covers OBSERVED days only — the raw fan-out extends 6 days
    past the last event (phantom rows with dau=0 and a decaying wau),
    so the frame is semi-joined back to the distinct event dates.

    Determinism: dates and counts only; day emitted as yyyy-MM-dd
    string so the dtype is engine-stable."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    ud = ev.distinct()
    obs = ud.select(F.col("d").alias("day")).distinct()
    exp = ud.withColumn(
        "day", F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6)))
    ).join(F.broadcast(obs), "day", "left_semi")
    return (
        exp.groupBy("day")
        .agg(
            F.countDistinct(
                F.when(F.col("d") == F.col("day"), F.col("user_id"))
            ).alias("dau"),
            F.countDistinct("user_id").alias("wau"),
        )
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "dau", "wau")
        .orderBy("day")
    )


@query(
    "q_time_to_convert",
    tags=("A1", "W3"),
    oracle="""
WITH s AS (
  SELECT user_id, MIN(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT s.user_id, s.signup_ts, MIN(e.ts) AS first_purchase_ts
  FROM s LEFT JOIN events e
    ON e.user_id = s.user_id AND e.event_type = 'purchase'
   AND e.ts >= s.signup_ts AND e.ts < s.signup_ts + INTERVAL 7 DAY
  GROUP BY s.user_id, s.signup_ts
),
lat AS (
  SELECT user_id,
         CASE WHEN first_purchase_ts IS NULL THEN NULL
              ELSE (epoch_us(first_purchase_ts) - epoch_us(signup_ts)) // 1000000
         END AS lat_s
  FROM p
)
SELECT COUNT(*) AS n_signup_users,
       COUNT(lat_s) AS n_converted,
       CAST((COUNT(lat_s) * 10000) // COUNT(*) AS DOUBLE) / 10000.0 AS conv_rate,
       CAST((SUM(lat_s) * 10000) // (86400 * COUNT(lat_s)) AS DOUBLE) / 10000.0
         AS avg_days_to_convert,
       CAST((MAX(lat_s) * 10000) // 86400 AS DOUBLE) / 10000.0 AS max_days_to_convert
FROM lat
""",
)
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 4): signup→purchase conversion latency — of the users
    who ever signed up, how many purchased AFTER signing up, and how
    long that took (the activation-funnel headline; complements
    q_funnel_stages' reach counts and q_attribution_last_touch's
    credit assignment with the TIME dimension). Conversion counts only
    within a 7-DAY window of signup — the bounded-window form every
    real activation metric uses (and what keeps the rate informative:
    unbounded, every fixture user eventually purchases).

    Scale shape: the signup anchor collapses the log to |users| rows
    first; the earliest qualifying purchase comes from one
    conditional min over a keyed join (user_id — co-partitioned with
    the anchor aggregate); the final frame is a 1-row reduce.

    Determinism: latencies are integer epoch seconds; all three
    ratios are 4dp floor integer math."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("pts")
    )
    # the qualifying-purchase condition lives in the JOIN (a post-join
    # filter would drop signup users whose only purchases PREDATE the
    # signup — they must stay, unconverted, like the oracle's LEFT JOIN)
    p = (
        s.join(
            purch,
            (s["user_id"] == purch["p_user"])
            & (purch["pts"] >= s["signup_ts"])
            & (purch["pts"] < s["signup_ts"] + F.expr("INTERVAL 7 DAY")),
            "left",
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.min("pts").alias("first_purchase_ts"))
    )
    # latency = floor of the EXACT microsecond difference (ADVICE r4:
    # unix_timestamp truncates each operand to whole seconds first,
    # which disagrees with the oracle's full-precision epoch diff on
    # any sub-second carry — ~half the converted users at sf0.1).
    # pts >= signup_ts guarantees the difference is non-negative, so
    # integer DIV is the floor on both engines.
    lat = p.select(
        F.when(
            F.col("first_purchase_ts").isNotNull(),
            F.expr(
                "(unix_micros(CAST(first_purchase_ts AS TIMESTAMP))"
                " - unix_micros(CAST(signup_ts AS TIMESTAMP))) DIV 1000000"
            ).cast("bigint"),
        ).alias("lat_s")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_signup_users"),
        F.count("lat_s").alias("n_converted"),
        F.expr(
            "CAST((count(lat_s) * 10000) DIV count(1) AS DOUBLE) / 10000.0"
        ).alias("conv_rate"),
        F.expr(
            "CAST((sum(lat_s) * 10000) DIV (86400 * count(lat_s)) AS DOUBLE) / 10000.0"
        ).alias("avg_days_to_convert"),
        F.expr("CAST((max(lat_s) * 10000) DIV 86400 AS DOUBLE) / 10000.0").alias(
            "max_days_to_convert"
        ),
    )


@query(
    "q_dedup_events_window",
    tags=("ST5", "W3", "L1"),
    oracle="""
WITH aug AS (
  SELECT event_id, ts, user_id, event_type, value FROM events
  UNION ALL
  SELECT event_id + 1000000000, ts + INTERVAL '2 seconds',
         user_id, event_type, value
  FROM events WHERE event_id % 37 = 5
),
f AS (
  SELECT event_type,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                       PARTITION BY user_id, event_type, value
                       ORDER BY ts, event_id) <= 300
              THEN 1 ELSE 0 END AS is_redelivery
  FROM aug
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(is_redelivery) AS BIGINT) AS n_redelivered,
       CAST((SUM(is_redelivery) * 10000) // COUNT(*) AS DOUBLE) / 10000.0
         AS redelivery_share
FROM f GROUP BY event_type ORDER BY event_type
""",
)
def q_dedup_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5b (EXT, round 6): at-least-once redelivery audit — the BATCH
    twin of streaming dedup-withinWatermark: an event is a redelivery
    if an identical payload (same user, type, value) arrived within
    the preceding 5 minutes. The data-quality report a pipeline owner
    runs over a landed day to size how much duplicate mass the
    streaming dedup would have absorbed (and to pick its watermark).
    Fixture plants +2s copies of event_id ≡ 5 (mod 37) — the classic
    producer-retry shape — so every SF has real redeliveries to count.

    Scale shape: one hashpartition(user, type, value) exchange for the
    LAG, then an event-type-sized map-combinable rollup — the payload
    identity IS the partition key, so dup detection is a per-partition
    sorted scan, never a self-join. At 100 TB the key would be
    xxhash64(payload) (8 bytes on the wire); value doubles as the
    payload here.

    Determinism: second-truncated epoch diffs (integer), planted
    copies are bit-identical doubles so the equality partition is
    exact; 4dp share via integer DIV."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    aug = ev.unionByName(
        ev.filter(F.col("event_id") % 37 == 5).select(
            (F.col("event_id") + 1000000000).alias("event_id"),
            (F.col("ts") + F.expr("INTERVAL 2 SECONDS")).alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
    )
    w = Window.partitionBy("user_id", "event_type", "value").orderBy("ts", "event_id")
    sec = F.unix_timestamp(F.col("ts").cast("timestamp"))
    f = aug.select(
        "event_type",
        F.when((sec - F.lag(sec).over(w)) <= 300, 1).otherwise(0).alias("is_redelivery"),
    )
    return (
        f.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("is_redelivery").cast("bigint").alias("n_redelivered"),
        )
        .select(
            "event_type",
            "n_events",
            "n_redelivered",
            F.expr(
                "CAST((n_redelivered * 10000) DIV n_events AS DOUBLE) / 10000.0"
            ).alias("redelivery_share"),
        )
        .orderBy("event_type")
    )
