#!/usr/bin/env python
"""spark-submit entrypoint for CONTINUOUS near-duplicate detection: a
Structured Streaming job that watches a directory for new document
batches (json rows: doc_id, text) and maintains the MinHash-LSH index
incrementally (see kube_etl_spark/streaming/neardup.py) — every new
document is checked against everything already ingested, and detected
pairs (exact Jaccard ≥ 0.5) accumulate in the index's pairs table.

    run_neardup.py --watch <dir> --state <dir> --checkpoint <dir>
                   [--once] [--media]

--once drains what is currently in the directory (availableNow) and
exits — the test/cron mode; without it the query runs until killed, the
production mode.
--media switches to the BINARY payload index (json rows: media_id,
payload_b64 — base64 because json carries no bytes): the incremental
byte-shingle SimHash screen (kube_etl_spark/streaming/simdup.py),
detected pairs at Hamming ≤ 4 of the 32-bit signature.
--semantic switches to the EMBEDDING index (json rows: vec_id, v — a
float array): incremental cosine near-dup over frozen IVF cells
(kube_etl_spark/streaming/semdedup.py); requires --centroids, a
parquet of (centroid_id, cv) produced by the index build (the frozen
set — reopening with different centroids is a re-train and warrants a
rebuild).
--buckets N (any mode) turns on the scale layout. Text/media: the
signature table in N id-hash buckets (pruned changed-detection /
verify reads) and the band index in 4N value-derived buckets so the
candidate probe reads only the batch's band-key dirs — probe IO ∝
batch, not corpus (the executed point-lookup swap; size N so 4N well
exceeds the band rows per batch; measured curve in
docs/architecture.md §round-8). Semantic: members bucket BY CELL
(probe reads only the batch's touched cells — the file-state analog
of the IVF partitionBy(centroid_id) disk pruning; bucket count = the
centroid count, carried by the centroids artifact, NOT by N) and the
vec_id-keyed vectors table in N id-hash buckets (pruned
changed-detection); measured curve in docs/architecture.md §round-9.
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
    ap.add_argument("--media", action="store_true")
    ap.add_argument("--semantic", action="store_true")
    ap.add_argument(
        "--centroids",
        default=None,
        help="(--semantic) parquet of the frozen (centroid_id, cv) set",
    )
    ap.add_argument("--buckets", type=int, default=None)
    args = ap.parse_args(argv)
    if args.media and args.semantic:
        raise SystemExit("--media and --semantic are mutually exclusive")
    if args.semantic and not args.centroids:
        raise SystemExit("--semantic requires --centroids")

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

    from kube_etl_spark.session import configure
    from kube_etl_spark.streaming.neardup import NearDupIndex, run_neardup_stream
    from kube_etl_spark.streaming.semdedup import (
        SemanticDedupIndex,
        run_semdedup_stream,
    )
    from kube_etl_spark.streaming.simdup import SimDupIndex, run_simdup_stream

    owned = SparkSession.getActiveSession() is None
    spark = configure(SparkSession.builder.appName("kube-etl-neardup").getOrCreate())
    # per-batch health/metrics artifacts beside the checkpoint —
    # read by the k8s liveness probe (streaming/health.py)
    from kube_etl_spark.streaming.health import attach_health

    attach_health(spark, args.checkpoint + ".health")
    if args.semantic:
        schema = StructType(
            [
                StructField("vec_id", LongType()),
                StructField("v", ArrayType(DoubleType())),
            ]
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(args.watch)
        )
        centroids = spark.read.parquet(args.centroids)
        if args.buckets:
            index = SemanticDedupIndex(
                spark,
                args.state,
                centroids,
                cell_buckets=True,
                bucket_col=F.pmod(F.xxhash64("vec_id"), F.lit(args.buckets)),
                n_buckets=args.buckets,
            )
        else:
            index = SemanticDedupIndex(spark, args.state, centroids)
        runner = run_semdedup_stream
    elif args.media:
        schema = StructType(
            [StructField("media_id", LongType()), StructField("payload_b64", StringType())]
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(args.watch)
            .select("media_id", F.unbase64("payload_b64").alias("payload"))
        )
        if args.buckets:
            index = SimDupIndex(
                spark,
                args.state,
                bucket_col=F.pmod(F.xxhash64("media_id"), F.lit(args.buckets)),
                n_buckets=args.buckets,
                band_buckets=4 * args.buckets,
            )
        else:
            index = SimDupIndex(spark, args.state)
        runner = run_simdup_stream
    else:
        schema = StructType(
            [StructField("doc_id", LongType()), StructField("text", StringType())]
        )
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(
            args.watch
        )
        if args.buckets:
            index = NearDupIndex(
                spark,
                args.state,
                bucket_col=F.pmod(F.xxhash64("doc_id"), F.lit(args.buckets)),
                n_buckets=args.buckets,
                band_buckets=4 * args.buckets,
            )
        else:
            index = NearDupIndex(spark, args.state)
        runner = run_neardup_stream
    if args.once:
        # the library wiring (foreachBatch + checkpoint + availableNow)
        runner(stream, index, args.checkpoint)
        if args.semantic:
            members = index.members.read()
            out = {
                "state": args.state,
                # members holds top-2 cells per vector — count OBJECTS
                "vectors_indexed": (
                    members.select("vec_id").distinct().count()
                    if members is not None
                    else 0
                ),
                "pairs": index.pairs_df().count(),
            }
        else:
            sigs = index.sigs.read()
            out = {
                "state": args.state,
                "docs_indexed": sigs.count() if sigs is not None else 0,
                "pairs": index.pairs_df().count(),
            }
        print(json.dumps(out))
    else:  # pragma: no cover - production mode runs until killed
        (
            stream.writeStream.foreachBatch(
                lambda batch, bid: index.ingest_batch(batch, bid)
            )
            .option("checkpointLocation", args.checkpoint)
            .start()
            .awaitTermination()
        )
    if owned:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
