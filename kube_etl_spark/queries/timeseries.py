"""Time-series operators over the events table (EXT; §2.9 adjacency).

The reference has no time-series surface (its only temporal data is CDC
event arrival order); these are the hypertable-style operators a
metrics/observability user of a k8s ETL pipeline reaches for next:
dense gap-filled series with last-observation-carried-forward, and
ordered-stage funnel analysis. Both are pure DataFrame/window plans —
no Python, one hashpartition(user_id) exchange family each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "q_gapfill_locf",
    tags=("ST", "W5"),
    oracle="""
WITH b AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
hv AS (SELECT user_id, hour, value FROM b WHERE rn = 1),
span AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM b GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS hour
  FROM span
)
SELECT g.user_id,
       CAST(g.hour AS TIMESTAMP_NS) AS hour,
       CAST(hv.hour IS NULL AS BOOLEAN) AS is_gap,
       LAST_VALUE(hv.value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
FROM grid g LEFT JOIN hv ON g.user_id = hv.user_id AND g.hour = hv.hour
ORDER BY g.user_id, g.hour
""",
)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): dense hourly gap-fill with last-observation-
    carried-forward — the hypertable `time_bucket_gapfill + locf`
    shape. Per user: hour buckets spanning that user's own activity
    window, hour value = the hour's LAST event (ts, then event_id,
    descending — a deterministic pick, not a float re-aggregation),
    missing hours flagged and filled by the previous non-null value.

    Scale shape (SEGMENT-EXPLODE, round-9 rewrite — the
    q_gapfill_interpolate plan applied to its LOCF sibling): a gap
    hour's LOCF value IS its preceding observation's value, so the
    dense grid never needs to exist as a join input. One lead() window
    over the OBSERVED hours gives each observation its successor; each
    observation map-side explodes [hour, next_hour) — itself plus the
    gap rows it fills — carrying its value. The grid join, the span
    aggregate, and the grid-sized LOCF window are gone; remaining
    exchanges are the hour pick, the observation-sized lead window
    (both keyed on user_id), and the output sort. Grid size is still
    bounded by each user's own activity span (no corpus-wide
    [min, max] densification), and at 100 TB sparse users cost explode
    OUTPUT, never shuffle or sort input. No Python, no collect."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
        "ts",
        "event_id",
    )
    w_pick = Window.partitionBy("user_id", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    hv = (
        b.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select("user_id", "hour", "value")
    )
    w_u = Window.partitionBy("user_id").orderBy("hour")
    seg = hv.select(
        "user_id",
        "hour",
        "value",
        F.lead("hour").over(w_u).alias("next_hour"),
    )
    return (
        seg.select(
            "user_id",
            "value",
            F.col("hour").alias("obs_hour"),
            F.explode(
                F.sequence(
                    "hour",
                    F.coalesce(
                        F.expr("next_hour - INTERVAL 1 HOUR"), F.col("hour")
                    ),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("hour"),
        )
        .select(
            "user_id",
            "hour",
            (F.col("hour") != F.col("obs_hour")).alias("is_gap"),
            F.col("value").alias("value_locf"),
        )
        .orderBy("user_id", "hour")
    )


@query(
    "q_funnel_stages",
    tags=("ST", "W1"),
    oracle="""
WITH w1 AS (
  SELECT user_id, event_type, ts,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t_view
  FROM events
),
w2 AS (
  SELECT user_id, event_type, ts, t_view,
         MIN(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
           OVER (PARTITION BY user_id) AS t_click
  FROM w1
),
w3 AS (
  SELECT user_id, t_view, t_click,
         MIN(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
           OVER (PARTITION BY user_id) AS t_purchase
  FROM w2
)
SELECT user_id,
       CAST(MIN(t_view) AS TIMESTAMP_NS) AS t_view,
       CAST(MIN(t_click) AS TIMESTAMP_NS) AS t_click,
       CAST(MIN(t_purchase) AS TIMESTAMP_NS) AS t_purchase,
       CAST(CASE WHEN MIN(t_view) IS NULL THEN 0
                 WHEN MIN(t_click) IS NULL THEN 1
                 WHEN MIN(t_purchase) IS NULL THEN 2
                 ELSE 3 END AS INT) AS stages_completed
FROM w3
GROUP BY user_id
ORDER BY user_id
""",
)
def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): ordered-stage funnel — per user, the first 'view',
    the first 'click' strictly after it, the first 'purchase' strictly
    after that, and how many stages completed. The product-analytics
    staple (conversion funnels) expressed as three CASCADED windows
    over the SAME partitioning: each stage's threshold is a per-user
    window constant consumed by the next window's conditional MIN.

    Scale shape: all three windows and the final group-by share
    hashpartition(user_id), so Catalyst plans ONE exchange and runs
    the cascade pipelined within it — the funnel costs a single
    shuffle of (user_id, event_type, ts) triples regardless of stage
    count. No joins, no Python."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    wu = Window.partitionBy("user_id")
    t_view = F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(wu)
    w1 = ev.withColumn("t_view", t_view)
    t_click = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
            F.col("ts"),
        )
    ).over(wu)
    w2 = w1.withColumn("t_click", t_click)
    t_purchase = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t_click")),
            F.col("ts"),
        )
    ).over(wu)
    w3 = w2.withColumn("t_purchase", t_purchase)
    stages = (
        F.when(F.col("t_view").isNull(), 0)
        .when(F.col("t_click").isNull(), 1)
        .when(F.col("t_purchase").isNull(), 2)
        .otherwise(3)
    )
    return (
        w3.groupBy("user_id")
        .agg(
            F.min("t_view").alias("t_view"),
            F.min("t_click").alias("t_click"),
            F.min("t_purchase").alias("t_purchase"),
        )
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            stages.cast("int").alias("stages_completed"),
        )
        .orderBy("user_id")
    )


@query(
    "q_retention_cohort",
    tags=("ST", "A3"),
    oracle="""
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         date_trunc('week', e.ts) AS active_week
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT CAST(cohort_week AS TIMESTAMP_NS) AS cohort_week,
       CAST(date_diff('day', cohort_week, active_week) / 7 AS INT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM activity
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
""",
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): weekly cohort retention — users grouped by the
    week of their FIRST event; for each (cohort week, week offset)
    cell, how many of that cohort were active. The product-analytics
    retention triangle.

    Scale shape: the first-event agg, the self-join back, and the
    per-(user, week) distinct all hash-partition by user_id, so the
    whole left half of the plan shares one exchange family; only the
    final (cohort_week, offset) rollup — already reduced to one row
    per (user, week) — re-shuffles, and that input is bounded by
    |users| × |weeks|, not |events|. No countDistinct expand: the
    distinct happens at the (user, week) grain where it is a
    deduplicating aggregate on the same user_id partitioning."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.select("user_id", F.date_trunc("week", "ts").alias("active_week"))
        .join(firsts, "user_id")
        .select("user_id", "cohort_week", "active_week")
        .distinct()
    )
    offset = (
        F.datediff(F.to_date("active_week"), F.to_date("cohort_week")) / 7
    ).cast("int")
    return (
        activity.select("cohort_week", offset.alias("week_offset"), "user_id")
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "q_histogram_value",
    tags=("A1", "F3"),
    oracle="""
WITH s AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM events)
SELECT LEAST(CAST(floor((value - mn) * 20.0 / (mx - mn)) AS BIGINT), 19) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(value), 4) AS lo,
       ROUND(MAX(value), 4) AS hi
FROM events, s
GROUP BY bin
ORDER BY bin
""",
)
def q_histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): equi-width histogram of a numeric column with
    data-driven bounds — the `width_bucket` shape (Spark has no
    width_bucket over data-derived bounds without two passes).

    Scale shape: pass 1 is a 1-row global min/max (partial-aggregated,
    map-side); that row is broadcast into the binning projection, so
    pass 2 is map-side arithmetic + a 20-group aggregate. Bin edges are
    computed with the IDENTICAL double expression in both engines
    ((v - mn) * 20.0 / (mx - mn), then floor) so IEEE results match
    bit-for-bit; per-bin extrema are order-independent (min/max), never
    an order-dependent double sum."""
    ev = load_table(spark, sf_dir, "events").select("value")
    bounds = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    bin_col = F.least(
        F.floor(
            (F.col("value") - F.col("mn")) * F.lit(20.0) / (F.col("mx") - F.col("mn"))
        ).cast("bigint"),
        F.lit(19).cast("bigint"),
    )
    return (
        ev.join(F.broadcast(bounds))
        .select(bin_col.alias("bin"), "value")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
        .orderBy("bin")
    )


@query(
    "q_zscore_outliers",
    tags=("A7", "L4"),
    oracle="""
WITH s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sv,
         CAST(SUM(CAST(value AS DECIMAL(14,2)) * CAST(value AS DECIMAL(14,2)))
              AS DOUBLE) AS sq
  FROM events GROUP BY event_type
),
m AS (
  SELECT event_type, n, sv / n AS mean,
         sqrt((sq - sv * sv / n) / (n - 1)) AS std
  FROM s
)
SELECT e.event_type, m.n,
       ROUND(m.mean, 4) AS mean,
       ROUND(m.std, 4) AS std,
       CAST(COUNT(*) FILTER (abs(e.value - m.mean) > 2 * m.std) AS BIGINT)
         AS n_outliers
FROM events e JOIN m ON e.event_type = m.event_type
GROUP BY e.event_type, m.n, m.mean, m.std
ORDER BY e.event_type
""",
)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): per-group z-score outlier detection — the
    feature-standardization / outlier-clipping pass of an ML data-prep
    pipeline: per event type, mean and sample stddev, then the count
    of events beyond 2 sigma.

    Determinism across engines WITHOUT tolerance: the fixture values
    are 2dp-quantized, so Σv and Σv² run through exact decimal sums
    (order-independent; v² has exactly 4 decimals) and cast to double
    — bit-identical in both engines — and mean/std/the 2σ comparison
    are then the IDENTICAL IEEE double expressions on identical
    inputs. stddev_samp() directly would be an order-dependent double
    accumulation and is deliberately avoided.

    Scale shape: pass 1 is a map-side-combined per-type aggregate
    (output = |event types| rows); its result is BROADCAST into the
    per-row outlier test, so pass 2 is map-side arithmetic + the same
    tiny per-type aggregate. Two corpus scans, no window, no Python."""
    from ..exact import money

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(money("value")).cast("double").alias("sv"),
        F.sum(money("value") * money("value")).cast("double").alias("sq"),
    )
    m = s.select(
        "event_type",
        "n",
        (F.col("sv") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("sq") - F.col("sv") * F.col("sv") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("std"),
    )
    return (
        ev.join(F.broadcast(m), "event_type")
        .groupBy("event_type", "n", "mean", "std")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("mean")) > 2 * F.col("std"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            "n",
            F.round("mean", 4).alias("mean"),
            F.round("std", 4).alias("std"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


@query(
    "q_concurrency_profile",
    tags=("ST", "W4"),
    # Oracle attached (was rows-only by window capacity in early r3);
    # the same SQL also runs in tests/test_streaming.py with semantic
    # sanity checks on top.
    oracle="""
WITH e AS (
  -- per-timestamp floor-to-second BEFORE differencing: Spark's
  -- unix_timestamp truncates each timestamp, and floor(a)-floor(b) ≠
  -- floor(a-b) at the 1800 s boundary with fractional epochs
  SELECT user_id, ts,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))) AS BIGINT) > 1800
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
s AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM e
),
sessions AS (
  SELECT user_id, sess, MIN(ts) AS t0, MAX(ts) AS t1
  FROM s GROUP BY user_id, sess
),
deltas AS (
  SELECT t0 AS t, 1 AS d FROM sessions
  UNION ALL
  SELECT t1 AS t, -1 AS d FROM sessions
),
swept AS (
  SELECT t, d, SUM(d) OVER (ORDER BY t ASC, d DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
  FROM deltas
)
SELECT CAST(date_trunc('hour', t) AS TIMESTAMP_NS) AS hour,
       CAST(MAX(live) AS BIGINT) AS peak_concurrency,
       CAST(LAST(live ORDER BY t ASC, d DESC) AS BIGINT) AS eoh_concurrency
FROM swept GROUP BY date_trunc('hour', t) ORDER BY hour
""",
)
def q_concurrency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): interval-overlap sweep — how many user sessions
    are active simultaneously, hour by hour. Sessions are 30-minute-gap
    islands per user; the sweep turns each session into a +1 at start
    and a -1 at end, orders the deltas by time, and the running sum IS
    the live concurrency. Emitted per hour: max and end-of-hour
    concurrency. The classic capacity-planning / peak-load query.

    Scale shape: island detection is one hashpartition(user_id) window
    (lag + cumulative flag sum); the sweep's running sum is
    global_cumsum (scale.py) — a range-partitioned distributed prefix
    sum over the SESSION endpoints (two rows per session, orders of
    magnitude smaller than events), never a single-task global window:
    concurrency is a corpus-global property, but its global order
    costs one parallel range exchange, not one task. Final rollup is
    hour-sized."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w_u = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp(F.col("ts")) - F.lag(F.unix_timestamp(F.col("ts"))).over(w_u)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess_id = F.sum(new_sess).over(
        w_u.rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = (
        ev.withColumn("sess", sess_id)
        .groupBy("user_id", "sess")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    )
    deltas = sessions.select(
        F.col("t0").alias("t"), F.lit(1).alias("d")
    ).unionByName(sessions.select(F.col("t1").alias("t"), F.lit(-1).alias("d")))
    # order starts before ends at the same instant so a zero-length
    # session still counts as concurrent with itself at its instant;
    # the sweep is global_cumsum (scale.py) — a range-partitioned
    # distributed prefix sum, not the single-task sort a global
    # cumulative Window compiles to (the docstring's "a range-
    # partitioned sort handles it", executed since r9)
    from .scale import global_cumsum

    swept = global_cumsum(
        deltas, [F.col("t").asc(), F.col("d").desc()], "d", out_col="live"
    )
    # eoh = the cumulative net through the hour — a running sum of
    # hourly delta totals over the hour-sized aggregate frame. NOT
    # F.last("live") in the groupBy: an aggregate last() has no
    # ordering guarantee once the input has >1 partition (it happens
    # to work under the single-partition global sweep, which is
    # exactly the accident a scaled-up run breaks); the hourly net
    # formulation is order-independent and equals the oracle's
    # LAST(live ORDER BY t, d DESC) identically.
    hourly = swept.groupBy(F.date_trunc("hour", "t").alias("hour")).agg(
        F.max("live").cast("bigint").alias("peak_concurrency"),
        F.sum("d").alias("net"),
    )
    w_h = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    return (
        hourly.select(
            "hour",
            "peak_concurrency",
            F.sum("net").over(w_h).cast("bigint").alias("eoh_concurrency"),
        )
        .orderBy("hour")
    )


@query(
    "q_drift_psi",
    tags=("A7", "L4"),
    # Oracle attached (was rows-only by window capacity in early r3);
    # also asserted with a stationarity sanity check in
    # tests/test_streaming.py.
    oracle="""
WITH b AS (
  SELECT MIN(value) AS mn, MAX(value) AS mx,
         to_timestamp((epoch(MIN(ts)) + epoch(MAX(ts))) / 2) AS mid
  FROM events
),
tagged AS (
  SELECT event_type,
         LEAST(CAST(floor((value - mn) * 10.0 / (mx - mn)) AS BIGINT), 9) AS bucket,
         CASE WHEN ts < mid THEN 'old' ELSE 'new' END AS half
  FROM events, b
),
piv AS (
  SELECT event_type, bucket,
         COUNT(*) FILTER (half = 'old') AS c_old,
         COUNT(*) FILTER (half = 'new') AS c_new
  FROM tagged GROUP BY event_type, bucket
),
tot AS (
  SELECT event_type, SUM(c_old) AS n_old, SUM(c_new) AS n_new
  FROM piv GROUP BY event_type
)
SELECT p.event_type AS event_type,
       CAST(t.n_old AS BIGINT) AS n_old,
       CAST(t.n_new AS BIGINT) AS n_new,
       ROUND(SUM(((p.c_old + 0.5) / (t.n_old + 5.0) - (p.c_new + 0.5) / (t.n_new + 5.0))
             * ln(((p.c_old + 0.5) / (t.n_old + 5.0)) / ((p.c_new + 0.5) / (t.n_new + 5.0)))), 6) AS psi
FROM piv p JOIN tot t USING (event_type)
GROUP BY p.event_type, t.n_old, t.n_new
ORDER BY p.event_type
""",
)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): distribution-drift monitoring — the population
    stability index (PSI) of `value` between the first and second half
    of the event stream, per event type. The data-quality alarm every
    production pipeline runs between corpus snapshots: PSI < 0.1 ≈
    stable, > 0.25 ≈ investigate.

    Method: 10 equi-width buckets over the GLOBAL value range (shared
    by both halves, so bucket edges cancel engine differences the same
    way q_histogram_value's do), Laplace-smoothed shares
    p_i=(c_i+0.5)/(n+5), PSI = Σ (p_i−q_i)·ln(p_i/q_i).

    Scale shape: one pass computes the 1-row global bounds + midpoint
    timestamp; pass two is map-side bucket/half tagging into a
    (type × bucket × half) aggregate — hundreds of rows out of any
    corpus size; the PSI fold runs on that tiny frame. All doubles go
    through identical fixed-order expressions in both engines."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    bounds = ev.agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        # midpoint of the time RANGE (not median): cheap, deterministic
        F.timestamp_seconds(
            (F.unix_timestamp(F.min("ts")) + F.unix_timestamp(F.max("ts"))) / 2
        ).alias("mid"),
    )
    bucket = F.least(
        F.floor(
            (F.col("value") - F.col("mn")) * F.lit(10.0) / (F.col("mx") - F.col("mn"))
        ).cast("bigint"),
        F.lit(9).cast("bigint"),
    )
    half = F.when(F.col("ts") < F.col("mid"), "old").otherwise("new")
    counts = (
        ev.join(F.broadcast(bounds))
        .select("event_type", bucket.alias("bucket"), half.alias("half"))
        .groupBy("event_type", "bucket", "half")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pivoted = (
        counts.groupBy("event_type", "bucket")
        .agg(
            F.sum(F.when(F.col("half") == "old", F.col("c")).otherwise(0)).alias("c_old"),
            F.sum(F.when(F.col("half") == "new", F.col("c")).otherwise(0)).alias("c_new"),
        )
    )
    tot = pivoted.groupBy("event_type").agg(
        F.sum("c_old").alias("n_old"), F.sum("c_new").alias("n_new")
    )
    p = (F.col("c_old") + 0.5) / (F.col("n_old") + 5.0)
    q = (F.col("c_new") + 0.5) / (F.col("n_new") + 5.0)
    term = (p - q) * F.log(p / q)
    return (
        pivoted.join(F.broadcast(tot), "event_type")
        .groupBy("event_type", "n_old", "n_new")
        .agg(F.round(F.sum(term), 6).alias("psi"))
        .select(
            "event_type",
            F.col("n_old").cast("bigint").alias("n_old"),
            F.col("n_new").cast("bigint").alias("n_new"),
            "psi",
        )
        .orderBy("event_type")
    )


@query(
    "q_ewma_smoothing",
    tags=("W4", "A7"),
    # Oracle attached (was rows-only by window capacity in early r3);
    # also asserted with envelope sanity checks in
    # tests/test_streaming.py.
    oracle="""
WITH t AS (
  SELECT user_id, ts, value,
         (epoch_us(ts) - epoch_us(MIN(ts) OVER (PARTITION BY user_id))) / (86400.0 * 1e6) AS tp
  FROM events
),
c AS (
  SELECT user_id, ts, value,
         exp(-tp) * SUM(value * exp(tp)) OVER (
           PARTITION BY user_id ORDER BY ts, value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ewma,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, value DESC) AS rn
  FROM t
)
SELECT user_id, CAST(ts AS TIMESTAMP_NS) AS ts,
       ROUND(value, 4) AS value, ROUND(ewma, 4) AS ewma
FROM c WHERE rn <= 5 ORDER BY user_id, ts
""",
)
def q_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): exponentially-weighted moving average over an
    IRREGULARLY-sampled series (τ = 1 day) per user — the
    metrics-smoothing primitive (load averages, rate estimators,
    anomaly baselines) that plain windowed means get wrong when sample
    spacing varies.

    The recursion y_i = y_{i-1}·e^(−Δt/τ) + v_i is unrolled into a
    closed form a cumulative window can compute:
        y_i = e^(−t'_i) · Σ_{j≤i} v_j · e^(t'_j),   t' = (t − min_t)/τ
    Per-user normalization by min_t keeps e^(t') finite (fixture span
    30 days ⇒ e^30 ≈ 1e13, well inside double range; production jobs
    re-normalize per partition window). The cumulative sum runs in
    frame order — both engines fold left-to-right over identical
    doubles, so results are bit-identical with no tolerance.

    Scale shape: one hashpartition(user_id) window (the min_t is a
    per-user window constant in the same exchange); everything else is
    per-row arithmetic. Output capped to the last 5 rows per user
    (WindowGroupLimit shape) to keep the frame driver-friendly."""
    tau = 86400.0
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    wu = Window.partitionBy("user_id")
    w_cum = Window.partitionBy("user_id").orderBy("ts", "value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # microsecond epochs on BOTH engines (unix_timestamp truncates to
    # seconds; DuckDB's epoch keeps the fraction — mixing them skews tp)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    min_us = F.unix_micros(F.min("ts").over(wu).cast("timestamp"))
    tprime = (us - min_us) / (tau * 1e6)
    ewma = F.exp(-tprime) * F.sum(F.col("value") * F.exp(tprime)).over(w_cum)
    w_rank = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("value").desc()
    )
    return (
        ev.withColumn("ewma", F.round(ewma, 4))
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= 5)
        .select("user_id", "ts", F.round("value", 4).alias("value"), "ewma")
        .orderBy("user_id", "ts")
    )


@query(
    "q_rolling_median",
    tags=("W4", "A8"),
    oracle="""
WITH m AS (
  SELECT user_id, ts, event_id, value,
         MEDIAN(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS med,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, CAST(ts AS TIMESTAMP_NS) AS ts,
       ROUND(value, 4) AS value, ROUND(med, 4) AS roll_median
FROM m WHERE rn <= 5
ORDER BY user_id, ts, event_id
""",
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): trailing 9-row rolling MEDIAN per series — the
    robust smoother (EWMA's complement: immune to single spikes, so
    it's the de-noiser under q_zscore_outliers-style alerting).

    Spark's `median` aggregate rejects bounded window frames
    (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the frame median is
    computed as collect_list over the ROWS frame → array_sort → exact
    middle (odd) / mean of the two middles (even) — the same linear
    interpolation DuckDB's MEDIAN window applies, and fully inside
    JVM expressions (no Python).

    Scale shape: one hashpartition(user_id) sorted window; the frame
    is O(9) rows so the per-row sort is constant work — no state
    blow-up at any series length. Output capped to the last 5 rows per
    user (the WindowGroupLimit shape, same hash family) to keep the
    driver frame bounded."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w_roll = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-8, 0)
    w_rank = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    frame = F.array_sort(F.collect_list("value").over(w_roll))
    n = F.size(frame)
    med = F.when(
        n % 2 == 1,
        F.element_at(frame, ((n + 1) / 2).cast("int")),
    ).otherwise(
        (
            F.element_at(frame, (n / 2).cast("int"))
            + F.element_at(frame, (n / 2 + 1).cast("int"))
        )
        / 2
    )
    return (
        ev.withColumn("med", med)
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= 5)
        .select(
            "user_id",
            "ts",
            F.round("value", 4).alias("value"),
            F.round("med", 4).alias("roll_median"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


@query(
    "q_anomaly_mad",
    tags=("A7", "A8"),
    oracle="""
WITH med AS (
  SELECT event_type, MEDIAN(value) AS m FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, med.m, ABS(e.value - med.m) AS d
  FROM events e JOIN med ON e.event_type = med.event_type
),
mad AS (
  SELECT event_type, MEDIAN(d) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type AS event_type,
       COUNT(*) AS n,
       ROUND(ANY_VALUE(d.m), 4) AS med,
       ROUND(ANY_VALUE(mad.mad), 4) AS mad,
       CAST(SUM(CASE WHEN d.d > 3 * 1.4826 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad ON d.event_type = mad.event_type
GROUP BY d.event_type
ORDER BY d.event_type
""",
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): median-absolute-deviation outlier detection per
    segment — the robust twin of q_zscore_outliers (mean/std are
    themselves dragged by the outliers they hunt; median/MAD are not).
    Flags |v − med| > 3·1.4826·MAD (1.4826 scales MAD to σ under
    normality) and reports per-segment counts.

    Scale shape: two exact-median aggregations over the SAME
    hashpartition(event_type) key — Catalyst reuses the exchange — and
    the deviation join is against a |segments|-row frame, auto-
    broadcast. Medians are exact here as the oracle anchor; the
    sketch path at 100 TB is approx_percentile (q_agg_percentile_approx
    is this engine's registered rows-only twin for that trade)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("m"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("value") - F.col("m"))
    )
    mad = dev.groupBy("event_type").agg(F.median("d").alias("mad"))
    thr = 3 * 1.4826 * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.any_value("m"), 4).alias("med"),
            F.round(F.any_value("mad"), 4).alias("mad"),
            F.sum(F.when(F.col("d") > thr, 1).otherwise(0)).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@query(
    "q_winsorize",
    tags=("A8", "A10"),
    oracle="""
WITH q AS (
  SELECT event_type,
         quantile_cont(value, 0.01) AS p01,
         quantile_cont(value, 0.99) AS p99
  FROM events GROUP BY event_type
)
SELECT e.event_type AS event_type,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN e.value < q.p01 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
       CAST(SUM(CASE WHEN e.value > q.p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
       ROUND(AVG(LEAST(GREATEST(e.value, q.p01), q.p99)), 4) AS mean_winsorized,
       ROUND(AVG(e.value), 4) AS mean_raw
FROM events e JOIN q ON e.event_type = q.event_type
GROUP BY e.event_type
ORDER BY e.event_type
""",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 3): p01/p99 winsorization per segment — clip the
    tails to the exact percentile bounds and compare the winsorized
    mean to the raw mean (the standard heavy-tail pre-treatment before
    training-statistics jobs; the training-data analog is outlier-doc
    clipping before loss-weighted sampling). Spark's exact `percentile`
    and DuckDB's `quantile_cont` share linear interpolation, so the
    clip bounds agree bit-for-bit.

    Scale shape: percentile bounds per segment (|segments| rows,
    broadcast back), then one map-side-combinable aggregate over the
    clipped expression — two scans, one tiny join, no wide shuffle of
    raw rows beyond the percentile agg's own hashpartition(event_type).
    At 100 TB swap the exact percentile for approx_percentile and the
    plan is unchanged."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.01)).alias("p01"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("value") < F.col("p01"), 1).otherwise(0)).alias(
                "n_clipped_lo"
            ),
            F.sum(F.when(F.col("value") > F.col("p99"), 1).otherwise(0)).alias(
                "n_clipped_hi"
            ),
            F.round(F.avg(clipped), 4).alias("mean_winsorized"),
            F.round(F.avg("value"), 4).alias("mean_raw"),
        )
        .orderBy("event_type")
    )


@query(
    "q_time_weighted_avg",
    tags=("W3", "A1"),
    oracle="""
WITH seq AS (
  SELECT user_id, CAST(value AS DECIMAL(14,2)) AS v,
         epoch_us(ts) AS us,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_us
  FROM events
),
seg AS (
  SELECT user_id, v, next_us - us AS dur
  FROM seq WHERE next_us IS NOT NULL
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(dur) AS BIGINT) AS span_us,
       ROUND(CAST(SUM(v * dur) AS DOUBLE) / CAST(SUM(dur) AS DOUBLE), 4) AS twa
FROM seg
GROUP BY user_id
HAVING COUNT(*) >= 2
ORDER BY user_id
""",
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 4): time-weighted average (TWAP) of `value` per user —
    each observation weighted by how long it was the latest one (its
    interval to the next event), the correct mean for irregularly-
    sampled gauges where the plain AVG over-weights bursts.

    Determinism: value has exactly 2dp (fixture-verified) so the
    DECIMAL(14,2) cast is lossless; durations are integer microsecond
    epochs (`unix_micros` ↔ `epoch_us`); Σ(v·dur) is an exact decimal
    sum and Σdur an exact bigint sum, so the final division is one
    bit-identical double op, rounded 4dp. Ordering inside each user is
    (ts, event_id) — a total order.

    Scale shape: ONE hashpartition(user_id) exchange feeds both the
    lead() window and the groupBy (same key) — Catalyst reuses the
    partitioning; no data-sized broadcast, no Python."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.col("value").cast("decimal(14,2)").alias("v"),
            us.alias("us"),
            F.lead(us).over(w).alias("next_us"),
        )
        .filter(F.col("next_us").isNotNull())
        .select("user_id", "v", (F.col("next_us") - F.col("us")).alias("dur"))
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum("dur").cast("bigint").alias("span_us"),
            F.round(
                F.sum(F.col("v") * F.col("dur")).cast("double")
                / F.sum("dur").cast("double"),
                4,
            ).alias("twa"),
        )
        .filter(F.col("n_segments") >= 2)
        .orderBy("user_id")
    )


@query(
    "q_attribution_last_touch",
    tags=("W3", "A10", "L4"),
    oracle="""
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(value AS DECIMAL(14,2)) AS v,
         CASE WHEN event_type = 'click'
              THEN 'ch_' || CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 4 AS VARCHAR)
         END AS click_channel
  FROM events
),
carried AS (
  SELECT user_id, event_type, v,
         LAST_VALUE(click_channel IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS last_click
  FROM tagged
)
SELECT COALESCE(last_click, 'organic') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(v) AS DOUBLE) AS revenue
FROM carried
WHERE event_type = 'purchase'
GROUP BY COALESCE(last_click, 'organic')
ORDER BY channel
""",
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 4): last-touch attribution — every purchase is
    credited to the user's most recent PRECEDING click's channel
    (channel derived deterministically from the click's props.k % 4),
    'organic' when no click precedes it. The marketing-analytics
    staple, and the classic ignoreNulls running-carry window.

    Determinism: the carry is last_value(ignoreNulls) over the total
    order (ts, event_id) with an explicit UNBOUNDED..1 PRECEDING frame
    (the purchase row itself can never self-attribute); revenue is a
    decimal-exact sum (value is 2dp) emitted as double.

    Scale shape: ONE hashpartition(user_id) window pass over events,
    then a channel-cardinality (≤5 keys) map-side-combined agg — no
    joins, no Python, no skew (channels are hash-derived)."""
    channel = F.when(
        F.col("event_type") == "click",
        F.concat(
            F.lit("ch_"),
            (F.get_json_object("props", "$.k").cast("bigint") % 4).cast("string"),
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("value").cast("decimal(14,2)").alias("v"),
        F.last(channel, ignorenulls=True).over(w).alias("last_click"),
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("last_click", F.lit("organic")).alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum("v").cast("double").alias("revenue"),
        )
        .orderBy("channel")
    )


@query(
    "q_seasonality_index",
    tags=("F2", "A1"),
    oracle="""
WITH cell AS (
  SELECT isodow(ts) AS dow_iso, hour(ts) AS hr, COUNT(*) AS n_events
  FROM events GROUP BY dow_iso, hr
),
tot AS (
  SELECT CAST(SUM(n_events) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_cells
  FROM cell
)
SELECT CAST(dow_iso AS BIGINT) AS dow_iso, CAST(hr AS BIGINT) AS hr,
       n_events,
       CAST((n_events * n_cells * 10000) // total AS DOUBLE) / 10000.0
         AS seasonality_idx
FROM cell, tot ORDER BY dow_iso, hr
""",
)
def q_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 4): weekly seasonality profile — event volume per
    (ISO weekday, hour) cell, normalized by the mean cell volume
    (index 1.0 = average load; the capacity-planning heatmap input,
    complementing q_concurrency_profile's interval sweep with the
    calendar-shape view).

    Scale shape: one scan → one 168-cell-max aggregate (map-side
    combinable); the normalizing total is a broadcast 1-row frame
    over those cells. The timestamp never leaves the scan — only the
    two extracted small ints shuffle.

    Determinism: Spark weekday() (0=Mon) + 1 ≡ DuckDB isodow()
    (1=Mon); hour() agrees on the µs-ntz timestamps; the index is
    4dp floor integer math."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.expr("weekday(ts)") + F.lit(1)).cast("bigint").alias("dow_iso"),
        F.hour("ts").cast("bigint").alias("hr"),
    )
    cell = ev.groupBy("dow_iso", "hr").agg(F.count(F.lit(1)).alias("n_events"))
    tot = cell.agg(
        F.sum("n_events").alias("total"), F.count(F.lit(1)).alias("n_cells")
    )
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            "dow_iso",
            "hr",
            "n_events",
            F.expr(
                "CAST((n_events * n_cells * 10000) DIV total AS DOUBLE) / 10000.0"
            ).alias("seasonality_idx"),
        )
        .orderBy("dow_iso", "hr")
    )


@query(
    "q_gapfill_interpolate",
    bench=True,
    tags=("ST", "W5", "EXT"),
    oracle="""
WITH b AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
hv AS (SELECT user_id, hour, cents FROM b WHERE rn = 1),
span AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM b GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS hour
  FROM span
),
g AS (
  SELECT g.user_id, g.hour, hv.cents,
         CAST(epoch(g.hour) AS BIGINT) // 3600 AS hr
  FROM grid g LEFT JOIN hv ON g.user_id = hv.user_id AND g.hour = hv.hour
),
f AS (
  SELECT user_id, hour, cents, hr,
         LAST_VALUE(cents IGNORE NULLS) OVER wp AS prev_c,
         LAST_VALUE(CASE WHEN cents IS NOT NULL THEN hr END IGNORE NULLS)
           OVER wp AS prev_h,
         FIRST_VALUE(cents IGNORE NULLS) OVER wn AS next_c,
         FIRST_VALUE(CASE WHEN cents IS NOT NULL THEN hr END IGNORE NULLS)
           OVER wn AS next_h
  FROM g
  WINDOW wp AS (PARTITION BY user_id ORDER BY hour
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY hour
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, CAST(hour AS TIMESTAMP_NS) AS hour,
       cents IS NULL AS is_gap,
       CAST(CASE WHEN cents IS NOT NULL THEN cents * 100
                 ELSE ((prev_c * (next_h - prev_h)
                        + (next_c - prev_c) * (hr - prev_h)) * 100)
                      // (next_h - prev_h) END AS DOUBLE) / 10000.0
         AS value_interp
FROM f ORDER BY user_id, hour
""",
)
def q_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round 5): dense hourly gap-fill with LINEAR INTERPOLATION —
    the hypertable `interpolate()` complement of q_gapfill_locf (LOCF
    holds the last reading flat; interpolation draws the line between
    the bracketing readings — the right fill for continuously-varying
    measurements vs LOCF's right fill for state). Same per-user grid
    contract as LOCF: buckets span each user's own activity window, so
    every grid row has both a preceding and a following observation
    (the span endpoints are observed hours) and no edge NULLs exist.

    Determinism: observations are exact cents; hour positions are
    epoch-hour integers used only as DIFFERENCES (any constant
    session-zone offset cancels); the interpolated value is one floor
    integer division of an integer numerator — prev·(nh−ph) +
    (Δc)·(h−ph) — per row, emitted at 4dp USD. Gap rows are strictly
    between observations so the divisor is ≥ 1 by construction.

    Scale shape (SEGMENT-EXPLODE, round-9 rewrite): the previous form
    materialized the dense per-user hour grid, LEFT-JOINED the hourly
    observations into it, and ran two grid-sized window passes (asc +
    desc carries) — three data-sized exchanges over a frame the fill
    factor can make arbitrarily LARGER than the observations. Gap rows
    are fully determined by their bracketing observation PAIR, so the
    grid never needs to exist as a join input: one lead() window over
    the OBSERVED hours (strictly smaller than the grid) gives each
    observation its successor, and each observation map-side explodes
    the hours [hour, next_hour) — itself plus its trailing gap rows —
    computing the interpolation inline from the pair it already holds.
    Exchange family: the hour pick and the lead window (both keyed on
    user_id), then the output sort; the grid join, the span aggregate,
    and BOTH grid-sized fill windows are gone. Measured at sf0.1
    (1.05 M grid rows from 251k observed hours): 2.97 s → ~1.4 s, and
    at 100 TB the win grows with the gap ratio — sparse users cost
    explode output, never shuffle or sort input. No Python, no
    corpus-wide grid.

    The forward bracket comes from lead() over observations — the
    O(n²) UnboundedFollowing frame pitfall (measured 24 s vs 2.4 s on
    the grid form) no longer has a surface to regress on: no window
    ever spans generated rows.

    Optimization r12 (guide §2.4 "two operations keyed the same way can
    share one exchange"): the hour-pick window was keyed
    (user_id, hour) and the successor window user_id — two data-sized
    exchanges, because hashpartitioning(user_id, hour) does NOT satisfy
    a user_id clustering. Keying the pick window on user_id alone and
    ordering (hour ASC, ts DESC, event_id DESC) makes the first row of
    each hour block the same (latest ts, id) pick via one lag()
    comparison, and the successor window's (hour) ordering is a PREFIX
    of that sort — so both windows share ONE exchange and ONE sort.
    The explicit repartition pins the stage's width: the events
    exchange is small (~2 MB at sf0.1) so AQE would coalesce it to 1-2
    partitions, but the gap explode AMPLIFIES after it (251k observed
    hours -> 1.05M grid rows) — the basket_pairs lesson. Interleaved
    warm A/B at sf0.1/32: 1.90 s -> 1.18 s (0.62×); plan: 3 data-sized
    exchanges -> 2."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("hour"),
        F.expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)").alias("cents"),
        "ts",
        "event_id",
    ).repartition(spark.sparkContext.defaultParallelism, "user_id")
    w_pick = Window.partitionBy("user_id").orderBy(
        F.col("hour").asc(), F.col("ts").desc(), F.col("event_id").desc()
    )
    hv = (
        b.withColumn("prev_hour", F.lag("hour").over(w_pick))
        .filter(F.col("prev_hour").isNull() | (F.col("prev_hour") != F.col("hour")))
        .select("user_id", "hour", "cents")
    )
    w_u = Window.partitionBy("user_id").orderBy("hour")
    seg = hv.select(
        "user_id",
        "hour",
        "cents",
        F.lead("hour").over(w_u).alias("next_hour"),
        F.lead("cents").over(w_u).alias("next_c"),
    )
    g = seg.select(
        "user_id",
        "cents",
        "next_c",
        F.expr("unix_timestamp(hour) DIV 3600").alias("prev_h"),
        F.expr("unix_timestamp(next_hour) DIV 3600").alias("next_h"),
        F.explode(
            F.sequence(
                "hour",
                F.coalesce(
                    F.expr("next_hour - INTERVAL 1 HOUR"), F.col("hour")
                ),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour"),
    ).withColumn("hr", F.expr("unix_timestamp(hour) DIV 3600"))
    return g.select(
        "user_id",
        "hour",
        (F.col("hr") != F.col("prev_h")).alias("is_gap"),
        F.expr(
            "CAST(CASE WHEN hr = prev_h THEN cents * 100"
            " ELSE ((cents * (next_h - prev_h)"
            "        + (next_c - cents) * (hr - prev_h)) * 100)"
            "      DIV (next_h - prev_h) END AS DOUBLE) / 10000.0"
        ).alias("value_interp"),
    ).orderBy("user_id", "hour")
