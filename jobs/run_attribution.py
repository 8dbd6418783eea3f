#!/usr/bin/env python
"""spark-submit entrypoint for CONTINUOUS click→purchase attribution:
a Structured Streaming job that watches a directory for new event
batches (json rows: event_id, user_id, event_type, ts) and maintains
the attributed-pairs table through a watermarked stream-stream
interval join (kube_etl_spark/streaming/attribution.py — the managed
form of the driver-verified batch query q_stream_stream_join).

    run_attribution.py --watch <dir> --state <dir> --checkpoint <dir>
                       [--window "10 minutes"] [--watermark "1 hour"]
                       [--once] [--lease]

--once drains what is currently in the directory (availableNow) and
exits — the test/cron mode; without it the query runs until killed.
--lease acquires a WriterLease beside the state dir and fences every
pairs-table merge with it — required whenever more than one replica
could point at the same state dir. The join's own cross-batch state
lives in the stream checkpoint; restart = resume, and the batch-id-
keyed merge makes at-least-once redelivery converge.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--watch", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--window", default=None)
    ap.add_argument("--watermark", default=None)
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--lease", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from kube_etl_spark.session import configure
    from kube_etl_spark.streaming.attribution import (
        DEFAULT_WATERMARK,
        DEFAULT_WINDOW,
        AttributionTable,
        interval_join,
        run_attribution_stream,
        split_sides,
    )

    owned = SparkSession.getActiveSession() is None
    spark = configure(
        SparkSession.builder.appName("kube-etl-attribution").getOrCreate()
    )
    # observability: health.json + metrics.jsonl per micro-batch, read
    # by the k8s liveness probe (deploy/k8s/attribution-stream.yaml)
    from kube_etl_spark.streaming.health import attach_health

    health = attach_health(spark, args.checkpoint + ".health")
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    lease = None
    renew_cm = None
    if args.lease:
        from kube_etl_spark.streaming.lease import WriterLease, renewal

        lease = WriterLease(args.state.rstrip("/") + ".lease")
        if not lease.acquire():
            raise SystemExit(f"state {args.state} is leased by another writer")
        # shared renew-at-ttl/3 helper (review r9); a fenced writer's
        # streams are stopped — it must halt, not retry
        renew_cm = renewal(
            lease,
            on_lost=lambda: [q.stop() for q in spark.streams.active],
        )
        renew_cm.__enter__()
    try:
        # everything after lease acquisition sits inside the try: an
        # AttributionTable ctor error or a readStream setup error must
        # release the lease just like a failed drain (self-review r6 —
        # the first cut started the try after these and leaked on them)
        table = AttributionTable(spark, args.state, lease=lease)
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).json(args.watch)
        window = args.window or DEFAULT_WINDOW
        watermark = args.watermark or DEFAULT_WATERMARK

        if args.once:
            run_attribution_stream(
                stream, table, args.checkpoint, window=window, watermark=watermark
            )
            pairs = table.pairs()
            print(
                json.dumps(
                    {"state": args.state, "pairs": pairs.count() if pairs is not None else 0}
                )
            )
        else:  # pragma: no cover - production mode runs until killed
            clicks, purchases = split_sides(stream, watermark)
            (
                interval_join(clicks, purchases, window)
                .writeStream.foreachBatch(
                    lambda batch, bid: table.merge_matches(batch, bid)
                )
                .option("checkpointLocation", args.checkpoint)
                .start()
                .awaitTermination()
            )
    finally:
        # A failed drain (e.g. LeaseLost fencing a merge mid-batch) must
        # still detach the health listener, stop the renewal thread, and
        # release the lease — otherwise the lease only frees via TTL and
        # the listener leaks into any session reuse (ADVICE r5). Each
        # step is guarded so a dead JVM (removeListener raising) cannot
        # skip the lease release (self-review r6); release() is
        # fenced-safe: releasing a lease another writer already took
        # over is a no-op.
        try:
            spark.streams.removeListener(health)
        except Exception:
            pass
        if renew_cm is not None:
            renew_cm.__exit__(None, None, None)
        if lease is not None:
            lease.release()
        if owned:
            try:
                spark.stop()
            except Exception:
                pass


if __name__ == "__main__":
    main(sys.argv[1:])
