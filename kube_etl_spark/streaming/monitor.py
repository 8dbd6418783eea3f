"""Continuous distribution-drift monitoring (EXT; the streaming twin of
queries/timeseries.py's q_drift_psi).

A reference profile — value-bucket shares per event type, frozen from a
trusted window — is compared against every arriving micro-batch; each
batch appends one PSI row per event type into a keyed StateTable. The
observability loop a production feed runs continuously: the batch
variant answers "did the corpus drift between snapshots", this one
answers "is the feed drifting RIGHT NOW" with micro-batch latency.

Scale shape: the profile is |types|·|buckets| rows (broadcast); each
micro-batch does one map-side bucket tag + a (type, bucket) aggregate;
state grows by |types| rows per batch — bounded by time, not volume.
Replaying a micro-batch rewrites the same (batch_id, event_type) keys
with identical values, so the monitor is restart-idempotent (the same
MERGE convergence argument as streaming/rollup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cdc import StateTable

N_BUCKETS = 10


def _bucket_expr() -> F.Column:
    """Bucket of `value` under the profile's [mn, mx] edges — ONE
    implementation for the reference build and every batch compare.

    Degenerate range (mx == mn — a constant reference window, e.g. a
    stuck sensor or a flat fee column) is handled explicitly (review
    r9): the linear form divides by zero → NULL, and greatest() skips
    NULLs, silently coercing EVERY value (reference and batch alike)
    to bucket 0 — PSI stays ~0 under arbitrarily large drift. Instead
    the constant maps to the middle bucket and any departure maps to
    an edge bucket by direction, so mass leaving the constant IS
    drift."""
    span = F.col("mx") - F.col("mn")
    linear = F.least(
        F.greatest(
            F.floor(
                (F.col("value") - F.col("mn")) * F.lit(float(N_BUCKETS)) / span
            ).cast("bigint"),
            F.lit(0).cast("bigint"),
        ),
        F.lit(N_BUCKETS - 1).cast("bigint"),
    )
    degenerate = (
        F.when(F.col("value") < F.col("mn"), F.lit(0))
        .when(F.col("value") > F.col("mn"), F.lit(N_BUCKETS - 1))
        .otherwise(F.lit(N_BUCKETS // 2))
        .cast("bigint")
    )
    return F.when(span == 0, degenerate).otherwise(linear)


def reference_profile(ref_events: DataFrame) -> DataFrame:
    """Freeze a drift reference from a trusted event window: DENSE
    (event_type × bucket) counts — zero-count buckets included, so
    batch-side lookups never lose a bucket — plus the global [mn, mx]
    value range that defines the bucket edges for every future batch.

    Small by construction (|types|·N_BUCKETS rows); callers broadcast
    it into each micro-batch compare."""
    bounds = ref_events.agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    bucket = _bucket_expr()
    counts = (
        ref_events.join(F.broadcast(bounds))
        .select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )
    dense = (
        counts.select("event_type")
        .distinct()
        .crossJoin(
            ref_events.sparkSession.range(N_BUCKETS).select(
                F.col("id").alias("bucket")
            )
        )
    )
    totals = counts.groupBy("event_type").agg(F.sum("c_ref").alias("n_ref"))
    return (
        dense.join(counts, ["event_type", "bucket"], "left")
        .join(totals, "event_type")
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            "bucket",
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            "n_ref",
            "mn",
            "mx",
        )
    )


def batch_psi(batch: DataFrame, profile: DataFrame) -> DataFrame:
    """PSI of one batch against the frozen profile, per event type.

    Buckets use the PROFILE's edges (values beyond the reference range
    clamp into the edge buckets — out-of-range mass is drift, and the
    clamp makes it count as such); shares are Laplace-smoothed
    (c+0.5)/(n+buckets/2) so empty buckets stay finite. Output:
    (event_type, n_ref, n_batch, psi)."""
    edges = profile.select("mn", "mx").limit(1)
    bucket = _bucket_expr()
    counts = (
        batch.join(F.broadcast(edges))
        .select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("c_new"))
    )
    totals = counts.groupBy("event_type").agg(F.sum("c_new").alias("n_new"))
    # event types the reference has never seen still get a row — a NEW
    # type IS drift (n_ref = 0 marks the novelty; the Laplace-smoothed
    # reference becomes uniform, so any concentrated batch shape
    # scores). A left join from the profile would silently drop them.
    novel = (
        counts.select("event_type")
        .distinct()
        .join(profile.select("event_type").distinct(), "event_type", "left_anti")
        .crossJoin(
            batch.sparkSession.range(N_BUCKETS).select(F.col("id").alias("bucket"))
        )
        .select(
            "event_type",
            "bucket",
            F.lit(0).cast("bigint").alias("c_ref"),
            F.lit(0).cast("bigint").alias("n_ref"),
        )
    )
    dense = profile.select("event_type", "bucket", "c_ref", "n_ref").unionByName(novel)
    joined = (
        dense.join(counts, ["event_type", "bucket"], "left")
        .join(F.broadcast(totals), "event_type", "left")
        .select(
            "event_type",
            "bucket",
            "c_ref",
            "n_ref",
            F.coalesce("c_new", F.lit(0)).alias("c_new"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )
    smooth = float(N_BUCKETS) / 2.0
    p = (F.col("c_ref") + 0.5) / (F.col("n_ref") + smooth)
    q = (F.col("c_new") + 0.5) / (F.col("n_new") + smooth)
    term = (p - q) * F.log(p / q)
    return (
        joined.groupBy("event_type", "n_ref", "n_new")
        .agg(F.round(F.sum(term), 6).alias("psi"))
        .select(
            "event_type",
            F.col("n_ref").cast("bigint").alias("n_ref"),
            F.col("n_new").cast("bigint").alias("n_batch"),
            "psi",
        )
    )


def run_drift_monitor(
    stream: DataFrame,
    profile: DataFrame,
    state: StateTable,
    checkpoint_dir: str,
) -> None:
    """Attach the monitor to an event stream: one PSI row per
    (micro-batch, event_type) appended into `state` (keyed on those two
    columns — replay rewrites identical rows). Blocks until the
    available data is processed (processingTime=0 + availableNow
    semantics are the caller's trigger choice; tests use the default
    micro-batch loop with awaitTermination on a bounded file stream)."""
    prof = profile.cache()
    prof.count()  # materialize once; every batch reuses it

    def _each(batch: DataFrame, batch_id: int) -> None:
        rows = (
            batch_psi(batch, prof)
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            .withColumn("op", F.lit("upsert"))
        )
        state.merge_batch(rows)

    q = (
        stream.writeStream.foreachBatch(_each)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
