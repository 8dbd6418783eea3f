#!/usr/bin/env python
"""spark-submit entrypoint for CONTINUOUS frequency estimation: a
Structured Streaming job that watches a directory for new event batches
(json rows: event_id, user_id) and maintains the Count-Min matrix
incrementally (see kube_etl_spark/streaming/freq.py). Deletion requests
land in a second watched directory (json rows: user_id plus the user's
original event rows) and are applied as negative deltas — the turnstile
path, so compliance removal never rebuilds the index.

    run_freq.py --watch <dir> --state <dir> --checkpoint <dir>
                [--deletes <dir>] [--once] [--compact] [--lease]

--once drains what is currently in the directories (availableNow) and
exits — the test/cron mode; without it the query runs until killed.
--compact folds the per-batch delta history into a single baseline
after the drain (only valid with --once: the fold horizon must be
behind the committed checkpoint).
--lease acquires a WriterLease beside the state dir and fences every
state publish with it — required whenever more than one replica could
point at the same state dir (the k8s manifest's single-replica
Deployment can still race with itself across a forced reschedule).
In-process, the ingest and delete streams are already serialized by
the index's merge lock; the lease is the cross-process half.
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
    ap.add_argument("--deletes", default=None)
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--compact", action="store_true")
    ap.add_argument("--lease", action="store_true")
    args = ap.parse_args(argv)
    if args.compact and not args.once:
        ap.error("--compact requires --once (fold horizon must be committed)")

    from pyspark.sql import SparkSession
    from pyspark.sql.types import LongType, StructField, StructType

    from kube_etl_spark.session import configure
    from kube_etl_spark.streaming.freq import CountMinIndex

    owned = SparkSession.getActiveSession() is None
    spark = configure(SparkSession.builder.appName("kube-etl-freq").getOrCreate())
    # observability: health.json + metrics.jsonl per micro-batch, read
    # by the k8s liveness probe (deploy/k8s/freq-stream.yaml)
    from kube_etl_spark.streaming.health import attach_health

    health = attach_health(spark, args.checkpoint + ".health")
    schema = StructType(
        [StructField("event_id", LongType()), StructField("user_id", LongType())]
    )
    lease = None
    renew_cm = None
    lease_lost = None
    if args.lease:
        import threading

        from kube_etl_spark.streaming.lease import WriterLease, renewal

        lease = WriterLease(args.state.rstrip("/") + ".lease")
        if not lease.acquire():
            raise SystemExit(f"state {args.state} is leased by another writer")
        # shared renew-at-ttl/3 helper (review r9 — three hand-rolled
        # copies of this block had diverged; run_freq's leaked the
        # renewer + lease on a failed drain). On LeaseLost the hook
        # stops the streams AND flags the main thread so it skips
        # compaction — a stale writer folding history would overwrite
        # the new owner's state (freq.compact also asserts the lease;
        # the flag makes the skip graceful instead of a late raise).
        lease_lost = threading.Event()

        def _on_lost() -> None:  # pragma: no cover - timing path
            lease_lost.set()
            for q in spark.streams.active:
                q.stop()

        renew_cm = renewal(lease, on_lost=_on_lost)
        renew_cm.__enter__()
    try:
        index = CountMinIndex(spark, args.state, key_col="user_id", lease=lease)

        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).json(args.watch)
        writer = stream.writeStream.foreachBatch(
            lambda batch, bid: index.ingest_batch(batch, bid)
        ).option("checkpointLocation", args.checkpoint)

        # deletes ride their own stream + checkpoint; batch ids are
        # offset into a disjoint namespace so ingest and delete deltas
        # never collide on the (batch_id, i, bucket) state key
        del_writer = None
        if args.deletes:
            del_stream = spark.readStream.schema(schema).option(
                "maxFilesPerTrigger", 1
            ).json(args.deletes)
            del_writer = del_stream.writeStream.foreachBatch(
                lambda batch, bid: index.delete_keys(batch, -(bid + 2))
            ).option("checkpointLocation", args.checkpoint + ".deletes")

        if args.once:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
            q.stop()
            if del_writer is not None:
                dq = del_writer.trigger(availableNow=True).start()
                dq.awaitTermination()
                dq.stop()
            if args.compact:
                if lease_lost is not None and lease_lost.is_set():
                    print(
                        "lease lost during drain; skipping compaction",
                        file=sys.stderr,
                    )
                else:
                    index.compact()
            print(
                json.dumps(
                    {
                        "state": args.state,
                        "cells": index.matrix().filter("n != 0").count(),
                    }
                )
            )
        else:  # pragma: no cover - production mode runs until killed
            qs = [writer.start()]
            if del_writer is not None:
                qs.append(del_writer.start())
            for q in qs:
                q.awaitTermination()
    finally:
        # a failed drain must still detach the listener, stop the
        # renewal thread, and release the lease — otherwise the daemon
        # renewer keeps the lease alive FOREVER (not just until ttl)
        # and a replacement replica can never acquire (review r9; the
        # run_attribution discipline)
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
