#!/usr/bin/env python
"""spark-submit entrypoint for CONTINUOUS retrieval-index maintenance:
a Structured Streaming job that watches a directory for new document
batches (json rows: doc_id, text, embedding) and appends each
micro-batch into an existing index (see
kube_etl_spark/plans/retrieval_index.py::append_to_index).

    run_index_stream.py --watch <dir> --index <dir> [--checkpoint <dir>] [--once]

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
    ap.add_argument("--index", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from kube_etl_spark.plans.retrieval_index import append_to_index
    from kube_etl_spark.session import configure

    owned = SparkSession.getActiveSession() is None
    spark = configure(
        SparkSession.builder.appName("kube-etl-index-stream").getOrCreate()
    )
    # per-batch health/metrics artifacts beside the checkpoint —
    # read by the k8s liveness probe (streaming/health.py)
    from kube_etl_spark.streaming.health import attach_health

    attach_health(spark, args.checkpoint + ".health")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(
        args.watch
    )
    ingested = {"batches": 0, "rows": 0}

    def _ingest(batch, _bid):
        n = batch.count()
        if n:
            append_to_index(
                spark,
                args.index,
                batch.select("doc_id", "text"),
                batch.select(F.col("doc_id").alias("vec_id"), "embedding"),
            )
            ingested["batches"] += 1
            ingested["rows"] += n

    writer = (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", args.checkpoint)
    )
    if args.once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        q.stop()
        print(json.dumps({"index": args.index, **ingested}))
    else:  # pragma: no cover - production mode runs until killed
        q = writer.start()
        q.awaitTermination()
    if owned:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
