"""Continuous multi-resolution rollup — the hypertable/continuous-
aggregate analog (EXT; no reference counterpart). Maintains coarse
time-bucket aggregates (e.g. hourly + daily) over an event stream,
incrementally and restart-safely:

  * the aggregation itself runs in Spark's checkpointed streaming state
    (update mode ⇒ each micro-batch emits only buckets it changed);
  * the sink upserts whole buckets into a keyed StateTable — replaying
    a micro-batch rewrites the same bucket values (idempotent), the
    same convergence argument as the CDC MERGE sink.

Scale: state is one row per (bucket, resolution) — bounded by time
span, not event volume; the watermark lets Spark drop bucket state
once the bucket can no longer change, so a year-long stream holds
hours' worth of open buckets, not the year.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exact import dsum
from .cdc import StateTable


def rollup_aggregate(events: DataFrame, length: str) -> DataFrame:
    """One resolution of the rollup: count + exact sum per bucket.
    Mode-agnostic (batch frame or stream)."""
    return (
        events.groupBy(F.window("ts", length).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value").cast("decimal(14,2)")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            F.lit(length).alias("resolution"),
            "n_events",
            "total_value",
        )
    )


def run_continuous_rollup(
    stream: DataFrame,
    state: StateTable,
    checkpoint_dir: str,
    resolutions: tuple[str, ...] = ("1 hour", "1 day"),
    watermark: str = "1 hour",
) -> None:
    """Maintain all resolutions of the rollup from one event stream.

    Each resolution is its own streaming aggregation (they share the
    source); update-mode foreachBatch receives changed buckets only and
    upserts them keyed on (bucket_start, resolution). seq = the
    bucket's cumulative (n_events, total_value): n_events is monotonic
    in bucket completeness and independent of batch numbering, so a
    restart with a fresh checkpoint (batch ids reset to 0) can never
    lose newer cumulative values to stale state — the more-complete row
    wins. total_value is the deterministic tie-break for the edge where
    two runs admitted DIFFERENT same-sized subsets of late rows (equal
    counts, different sums): the winner is then arbitrary in principle
    but stable across replays, which idempotence needs. Construct the
    StateTable with seq_col=["__seq", "total_value"].
    """
    for i, length in enumerate(resolutions):
        agg = rollup_aggregate(stream.withWatermark("ts", watermark), length)

        def _upsert(batch: DataFrame, _batch_id: int) -> None:
            state.merge_batch(
                batch.withColumn("op", F.lit("upsert")).withColumn(
                    "__seq", F.col("n_events")
                )
            )

        # sequential: the StateTable is single-writer by contract
        q = (
            agg.writeStream.foreachBatch(_upsert)
            .outputMode("update")
            .option("checkpointLocation", f"{checkpoint_dir}/r{i}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
