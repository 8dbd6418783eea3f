#!/usr/bin/env python
"""spark-submit entrypoint for the LIVE-CLUSTER export job — the
`kube-etl export` CLI against a real apiserver (main.go:25-37 +
pkg/export/export.go:64-168), over the engine's own HTTP client
(streaming/kubeapi.py: discovery, PAGINATED list — the scalability
cliff export.go:130 has, removed — and the reference's
`<ns>/<group>/<kind>/<name>` one-file-per-object layout, optionally
zipped like pkg/sink/zip.go).

    spark-submit ... run_cluster_export.py \
        --kubeconfig /path/to/kubeconfig --output /data/export --zip

The kubeconfig is parsed by streaming/kubeconfig.py (token / basic /
client-cert auth, inline CA); --context overrides current-context.
Tested end-to-end against an in-process fake apiserver
(tests/test_kubeapi.py); pointing it at a real cluster is a URL away.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kubeconfig", required=True, help="kubeconfig file path")
    ap.add_argument("--context", default=None, help="kubeconfig context override")
    ap.add_argument("--output", required=True, help="export tree root")
    ap.add_argument("--zip", action="store_true", help="also write <output>.zip")
    ap.add_argument(
        "--serialization", choices=("json", "yaml"), default="json",
        help="per-object payload format; yaml matches the reference's sigs.Marshal",
    )
    ap.add_argument("--page-size", type=int, default=500)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from kube_etl_spark.session import configure
    from kube_etl_spark.streaming.kubeapi import KubeApiClient, cluster_export
    from kube_etl_spark.streaming.kubeconfig import rest_config_from_kubeconfig

    with open(args.kubeconfig, "rb") as f:
        rc = rest_config_from_kubeconfig(f.read(), context=args.context)
    spark = configure(
        SparkSession.builder.appName("kube-etl-cluster-export").getOrCreate()
    )
    result = cluster_export(
        spark,
        KubeApiClient(rc),
        args.output,
        archive=args.zip,
        serialization=args.serialization,
        page_size=args.page_size,
    )
    print(json.dumps(result))
    if result["discovery_errors"]:
        print(
            f"partial discovery: {len(result['discovery_errors'])} group(s) failed "
            f"(tolerated, as export.go:100-109 does)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main(sys.argv[1:])
