#!/usr/bin/env python
"""spark-submit entrypoint for the warehouse data-quality audit (see
kube_etl_spark/plans/audit.py):

    run_audit.py --input /data/sf_dir [--output /reports/audit]

Prints the report as one JSON line; with --output also writes it as
parquet (tiny — one row per check) for run-over-run diffing.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="fixture/table dir")
    ap.add_argument("--output", default=None, help="optional parquet report dir")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from kube_etl_spark.plans.audit import audit_report, evaluate_alerts
    from kube_etl_spark.session import configure

    owned = SparkSession.getActiveSession() is None
    spark = configure(SparkSession.builder.appName("kube-etl-audit").getOrCreate())
    report = evaluate_alerts(audit_report(spark, args.input))
    if args.output:
        # persist so the write and the collect below materialize the
        # battery once, not twice (every contributing scan — row
        # counts, FK probes, Benford, PSI — would otherwise re-run)
        report = report.persist()
        report.coalesce(1).write.mode("overwrite").parquet(args.output)
    rows = [
        {
            "check": r["check"],
            "subject": r["subject"],
            "value": r["value"],
            "alert": r["alert"],
        }
        for r in report.collect()
    ]
    n_alerts = sum(1 for r in rows if r["alert"])
    print(json.dumps({"checks": len(rows), "alerts": n_alerts, "report": rows}))
    if owned:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
