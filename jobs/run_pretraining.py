#!/usr/bin/env python
"""spark-submit entrypoint for the composed pretraining-data pipeline
(quality gates → exact dedup → leakage-safe split → sequence packing →
partitioned corpus write; see kube_etl_spark/plans/pretraining.py).

    spark-submit ... run_pretraining.py --input <tables-dir> --output <dir>

On a cluster, --input/--output are object-store URIs (s3a://, gs://);
locally they default to the test fixtures.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.001")
    ap.add_argument("--output", required=True)
    ap.add_argument("--cap", type=int, default=512, help="tokens per training sequence")
    ap.add_argument(
        "--epochs",
        type=int,
        default=0,
        help="if >0, also write per-epoch sampling/order manifests under <output>-manifests",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from kube_etl_spark.plans.pretraining import run_pretraining
    from kube_etl_spark.session import configure

    owned = SparkSession.getActiveSession() is None
    spark = configure(
        SparkSession.builder.appName("kube-etl-pretraining").getOrCreate()
    )
    stats = run_pretraining(spark, args.input, args.output, cap=args.cap)
    if args.epochs > 0:
        from pyspark.sql import functions as F

        from kube_etl_spark.plans.epochs import build_manifests

        corpus = spark.read.parquet(args.output).withColumn(
            "n_chars", F.length("text")
        )
        stats["manifests"] = build_manifests(
            spark, corpus, args.output + "-manifests", n_epochs=args.epochs
        )
    print(json.dumps({"output": args.output, **stats}))
    if owned:  # don't tear down a session we joined (tests)
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
