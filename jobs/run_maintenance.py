#!/usr/bin/env python
"""spark-submit entrypoint for table-layout maintenance (see
kube_etl_spark/plans/layout.py):

    run_maintenance.py compact --input <dir> --output <dir> [--target-rows N]
    run_maintenance.py zorder  --input <dir> --output <dir> --by colA,colB [--files N]

compact bin-packs a small-file-exploded directory; zorder rewrites a
table clustered by the Morton value of two key columns so parquet
min/max stats prune 2-d predicates.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("compact")
    c.add_argument("--input", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--target-rows", type=int, default=1_000_000)
    z = sub.add_parser("zorder")
    z.add_argument("--input", required=True)
    z.add_argument("--output", required=True)
    z.add_argument("--by", required=True, help="two comma-separated columns")
    z.add_argument("--files", type=int, default=8)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from kube_etl_spark.plans.layout import compact, zorder_write
    from kube_etl_spark.session import configure

    owned = SparkSession.getActiveSession() is None
    spark = configure(
        SparkSession.builder.appName("kube-etl-maintenance").getOrCreate()
    )
    if args.cmd == "compact":
        out = compact(spark, args.input, args.output, target_rows=args.target_rows)
    else:
        col_a, col_b = args.by.split(",")
        df = spark.read.parquet(args.input)
        zorder_write(df, args.output, col_a, col_b, n_files=args.files)
        out = {"zordered": df.count(), "by": [col_a, col_b], "files": args.files}
    print(json.dumps({"cmd": args.cmd, **out}))
    if owned:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
