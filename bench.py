#!/usr/bin/env python
"""Headline-query benchmark. Prints ONE JSON line per the driver contract:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Runs every registry spec flagged bench=True at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; per-query
time is the median of 3 runs of a full action (count of the result) —
see BASELINE.md measurement rules.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from kube_etl_spark.registry import bench_specs
    from kube_etl_spark.session import get_spark

    spark = get_spark("kube-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name, spec in sorted(bench_specs().items()):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
