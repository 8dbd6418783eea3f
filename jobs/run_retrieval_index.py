#!/usr/bin/env python
"""spark-submit entrypoint for the retrieval index build (IVF cells +
BM25 postings; see kube_etl_spark/plans/retrieval_index.py). Optionally
runs one hybrid probe after building, as a smoke check.

    spark-submit ... run_retrieval_index.py --input <tables-dir> \
        --index <dir> [--k 16] [--probe-terms dup,key,window]
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.001")
    ap.add_argument("--index", required=True)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--probe-terms", default="")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from kube_etl_spark.plans.retrieval_index import build_index, query_index
    from kube_etl_spark.session import configure

    owned = SparkSession.getActiveSession() is None
    spark = configure(
        SparkSession.builder.appName("kube-etl-retrieval-index").getOrCreate()
    )
    stats = build_index(spark, args.input, args.index, k=args.k)
    out = {"index": args.index, **stats}
    if args.probe_terms:
        from kube_etl_spark.catalog import load_table
        from pyspark.sql import functions as F

        probe_v = (
            load_table(spark, args.input, "embeddings")
            .filter(F.col("vec_id") == 0)
            .select(F.col("embedding").cast("array<double>").alias("v"))
            .head()["v"]
        )
        hits = query_index(
            spark, args.index, args.probe_terms.split(","), list(probe_v)
        ).limit(5)
        out["probe_top5"] = [r["doc_id"] for r in hits.collect()]
    print(json.dumps(out))
    if owned:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
