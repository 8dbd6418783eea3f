"""Continuous click→purchase attribution — the managed-job form of the
watermarked stream-stream interval join.

The batch twin is ``q_stream_stream_join`` (queries/streamlike.py,
driver-hash-green): purchases attributed to a same-user click within a
bounded window. This module runs the SAME join as a Structured
Streaming query — both sides watermarked, the time-range condition
bounding each side's join state to the watermark+window interval (the
textbook reason interval joins stream with finite state while
unconstrained stream-stream joins cannot) — and lands matched pairs in
a replay-idempotent StateTable keyed (click_id, purchase_id), so
at-least-once redelivery after a crash upserts the same rows instead
of duplicating them. Single-writer ownership is the state layer's
standard contract: pass ``lease=`` for enforced cross-process fencing
(jobs/run_attribution.py --lease wires it).

Scale notes (100 TB): the join shuffles both sides on user_id once;
per-key state holds only rows inside the watermark+window horizon, so
state size is rate x window, independent of stream length. The match
sink merges per batch into the keyed table — batch-sized work.

Reference behavior mirrored: the syncer's dual-stream correlation
(watch events joined to destination state within a bounded resync
horizon, /root/reference/syncer/krmsyncer_controller.go) — here as
declarative watermark semantics instead of handwritten timers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cdc import StateTable

DEFAULT_WINDOW = "10 minutes"
DEFAULT_WATERMARK = "1 hour"


def split_sides(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> tuple[DataFrame, DataFrame]:
    """Split an event stream (event_id, user_id, event_type, ts) into
    the watermarked click and purchase sides of the join. Works on
    batch frames too (withWatermark is a no-op there) — the e2e test
    runs the identical builder both ways."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks, purchases


def interval_join(
    clicks: DataFrame, purchases: DataFrame, window: str = DEFAULT_WINDOW
) -> DataFrame:
    """The attribution join: purchase strictly after the click and
    within `window`. One definition for stream and batch — the
    stream≡batch test holds by construction."""
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {window}")),
    ).select("click_id", "purchase_id", "user_id")


class AttributionTable:
    """Matched (click_id, purchase_id) pairs as a replay-idempotent
    StateTable: seq = batch id, so a redelivered batch overwrites its
    own rows. Pairs are immutable facts — there is no delete path."""

    def __init__(self, spark, base_dir: str, lease=None):
        self.table = StateTable(
            spark,
            base_dir,
            ["click_id", "purchase_id"],
            "seq",
            lease=lease,
        )

    def merge_matches(self, batch: DataFrame, batch_id: int) -> None:
        self.table.merge_batch(
            batch.withColumn("seq", F.lit(int(batch_id)).cast("bigint")).withColumn(
                "op", F.lit("upsert")
            )
        )

    def pairs(self) -> DataFrame | None:
        cur = self.table.read()
        if cur is None:
            return None
        return cur.select("click_id", "purchase_id", "user_id")


def run_attribution_stream(
    events: DataFrame,
    table: AttributionTable,
    checkpoint_dir: str,
    window: str = DEFAULT_WINDOW,
    watermark: str = DEFAULT_WATERMARK,
) -> None:
    """Drain the available event stream (availableNow) through the
    interval join into the pairs table. The JOIN's cross-batch state
    lives in the stream checkpoint (the engine's store); the SINK's
    idempotence comes from the batch-id-keyed merge."""
    clicks, purchases = split_sides(events, watermark)
    joined = interval_join(clicks, purchases, window)
    q = (
        joined.writeStream.foreachBatch(
            lambda batch, bid: table.merge_matches(batch, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
