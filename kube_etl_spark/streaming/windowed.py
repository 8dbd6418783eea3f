"""Event-time windowed aggregation builders (ST1-ST3) + watermark
accounting (ST4).

Reference provenance: the KRMSyncer has NO event-time windows or
watermarks (SURVEY.md §2.9) — these are the EXT surface. Builders take
any DataFrame with (ts, user_id, value, ...) and work unchanged on
batch frames and streaming frames (`F.window`/`F.session_window` are
mode-agnostic; `withWatermark` is applied only when streaming).

Scale notes: tumbling/sliding aggs shuffle on (window, keys) with
map-side partial aggregation; sliding with slide s and length l
replicates each row l/s times *logically* but Spark expands windows
without materializing copies pre-shuffle. Session windows require a
per-key sort-merge; at 100 TB the watermark bounds state size — without
it the state store grows forever (the reason ST4 exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exact import dsum


def tumbling(df: DataFrame, length: str = "1 hour") -> DataFrame:
    """ST1: tumbling-window count/sum over event time."""
    return (
        df.groupBy(F.window("ts", length).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value").cast("decimal(14,2)")).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def sliding(df: DataFrame, length: str = "1 hour", slide: str = "15 minutes") -> DataFrame:
    """ST2: sliding-window count — each event lands in length/slide windows."""
    return (
        df.groupBy(F.window("ts", length, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session(df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """ST3: session windows per user — events merge while consecutive
    gaps are < gap; a gap ≥ gap starts a new session."""
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


def late_data_accounting(df: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """ST4 batch analog: per-row watermark simulation in arrival order
    (event_id = arrival sequence). A row is late iff its event time is
    older than (max event time seen so far) - delay — exactly the rows a
    streaming watermark would drop with per-row watermark advancement
    (Spark's real watermark advances per micro-batch, so this is the
    strictest/deterministic variant; the real behavior is asserted in
    tests/test_streaming.py). The strict-prefix max is global_cummax
    (queries/scale.py) — a range-partitioned distributed prefix max,
    not the single-task sort the global Window form compiles to;
    event_id is the unique arrival sequence, so the strict-prefix
    total-order contract holds."""
    from ..queries.scale import global_cummax

    flagged = global_cummax(
        df, ["event_id"], "ts", out_col="__wm", inclusive=False
    ).withColumn(
        "is_late",
        F.when(
            F.col("ts") < F.col("__wm") - F.expr(f"INTERVAL {delay}"), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.sum("is_late").cast("bigint").alias("n_late"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .orderBy("event_type")
    )
