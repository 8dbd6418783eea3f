#!/usr/bin/env python
"""spark-submit entrypoint for CONTINUOUS repeated-substring detection:
a Structured Streaming job that watches a directory for new document
batches (json rows: doc_id, text) and maintains the repeated-span index
incrementally (see kube_etl_spark/streaming/substrdup.py) — new
arrivals retroactively update old documents' spans.

    run_substrdup.py --watch <dir> --state <dir> --checkpoint <dir> [--once]

--once drains what is currently in the directory (availableNow) and
exits — the test/cron mode; without it the query runs until killed, the
production mode.
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
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from kube_etl_spark.session import configure
    from kube_etl_spark.streaming.substrdup import SubstringDupIndex

    owned = SparkSession.getActiveSession() is None
    spark = configure(SparkSession.builder.appName("kube-etl-substrdup").getOrCreate())
    # per-batch health/metrics artifacts beside the checkpoint —
    # read by the k8s liveness probe (streaming/health.py)
    from kube_etl_spark.streaming.health import attach_health

    attach_health(spark, args.checkpoint + ".health")
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(
        args.watch
    )
    index = SubstringDupIndex(spark, args.state)
    writer = stream.writeStream.foreachBatch(
        lambda batch, bid: index.ingest_batch(batch, bid)
    ).option("checkpointLocation", args.checkpoint)
    if args.once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        q.stop()
        pos = index.positions.read()
        print(
            json.dumps(
                {
                    "state": args.state,
                    "grams_indexed": pos.count() if pos is not None else 0,
                    "spans": index.spans_df().count(),
                }
            )
        )
    else:  # pragma: no cover - production mode runs until killed
        q = writer.start()
        q.awaitTermination()
    if owned:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
