#!/usr/bin/env python
"""OPT-IN live-cluster smoke harness (`make live-smoke`) — the analog
of the reference's tier-2 envtest suite (pkg/export/export_test.go:
41-135 and krmsyncer_controller_test.go:58-149, which run against REAL
apiservers). This sandbox has no cluster, so the harness is NOT part
of the pytest suite (the zero-skip policy stands); it runs the moment
an environment with a cluster exists:

    KUBECONFIG=~/.kube/config make live-smoke

Read-only against the cluster. Three stages, mirroring export_test.go:
  1. kubeconfig resolution (streaming/kubeconfig.py — including exec
     credential plugins, the common real-cluster auth path);
  2. cluster-export: discovery → paginated list → the reference layout,
     asserting the golden `_cluster/core/Namespace/default.yaml` (or
     kube-system) path inside the zip exactly like export_test.go:
     118-135;
  3. watch-bridge --once against core/v1 namespaces: bookmark file
     written with a real resourceVersion; then a deliberately ancient
     bookmark (rv=1) to PROBE the 410/relist path — apiservers compact
     at their own cadence, so both outcomes (relist fired, or the
     server tolerated the old rv) are reported, neither fails.

Without KUBECONFIG (or with an unreadable file) the harness degrades
to a clear "no cluster" message and exit 0 — opt-in means absence is
not a failure. With KUBECONFIG set, any stage failure is a hard
non-zero exit.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import zipfile


def main(argv: list[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        prog="kube-etl live-smoke",
        description="opt-in real-cluster smoke; reads KUBECONFIG from the "
        "environment and degrades to a clear skip without it",
    )
    ap.parse_args(argv or [])
    kc_path = os.environ.get("KUBECONFIG", "")
    if not kc_path or not os.path.exists(kc_path):
        print(
            "live-smoke: no cluster available (set KUBECONFIG to a reachable "
            "cluster's kubeconfig to run the live smoke) — skipping, exit 0"
        )
        return 0

    from pyspark.sql import SparkSession

    from kube_etl_spark.session import configure
    from kube_etl_spark.streaming.kubeapi import (
        KubeApiClient,
        cluster_export,
    )
    from kube_etl_spark.streaming.kubeconfig import rest_config_from_kubeconfig

    report: dict = {"kubeconfig": kc_path}

    # -- 1. kubeconfig resolution (exec plugins included) ----------------
    with open(kc_path, "rb") as f:
        rc = rest_config_from_kubeconfig(f.read())
    report["context"] = rc.context
    report["server"] = rc.server
    report["auth"] = (
        "exec-plugin" if rc.exec_plugin is not None
        else "token" if rc.token
        else "client-cert" if rc.client_cert_pem
        else "basic" if rc.username
        else "none"
    )
    client = KubeApiClient(rc)

    spark = configure(
        SparkSession.builder.master("local[4]")
        .appName("kube-etl-live-smoke")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory(prefix="live-smoke-") as tmp:
        # -- 2. cluster export: the export_test.go golden assertion ------
        out = os.path.join(tmp, "export")
        result = cluster_export(
            spark, client, out, archive=True, serialization="yaml"
        )
        report["types_discovered"] = result["types_discovered"]
        report["objects_exported"] = result["objects"]
        report["discovery_errors"] = len(result["discovery_errors"])
        with zipfile.ZipFile(out + ".zip") as zf:
            names = set(zf.namelist())
        golden = {
            "_cluster/core/Namespace/default.yaml",
            "_cluster/core/Namespace/kube-system.yaml",
        }
        if not (golden & names):
            print(
                f"live-smoke FAIL: neither golden namespace path in the "
                f"export zip ({len(names)} files); sample: "
                f"{sorted(names)[:10]}",
                file=sys.stderr,
            )
            return 1
        report["golden_namespace_path"] = sorted(golden & names)[0]

        # -- 3. watch bridge --once against core/v1 namespaces -----------
        import run_watch_bridge

        targets = [{"group": "", "version": "v1",
                    "kind": "Namespace", "plural": "namespaces"}]
        tpath = os.path.join(tmp, "targets.json")
        with open(tpath, "w") as f:
            json.dump(targets, f)
        bm_path = os.path.join(tmp, "bm.json")
        bridge_args = [
            "--kubeconfig", kc_path,
            "--targets", tpath,
            "--landing", os.path.join(tmp, "oplog"),
            "--snapshots", os.path.join(tmp, "snaps"),
            "--bookmark", bm_path,
            "--interval", "5",
            "--once",
        ]
        run_watch_bridge.main(bridge_args)
        with open(bm_path) as f:
            bm = json.load(f)
        entry = bm.get("/v1/namespaces") or {}
        if entry.get("errors"):
            print(f"live-smoke FAIL: watch drain errored: {bm}", file=sys.stderr)
            return 1
        report["watch_events_first_pass"] = entry.get("events", 0)
        report["watch_bookmark_rv"] = entry.get("rv")

        # probe the 410 path with an ancient bookmark; compaction cadence
        # is the server's business, so both outcomes pass and are reported
        entry["rv"] = "1"
        bm["/v1/namespaces"] = entry
        with open(bm_path, "w") as f:
            json.dump(bm, f)
        run_watch_bridge.main(bridge_args)
        with open(bm_path) as f:
            bm2 = json.load(f)
        report["relist_path_fired"] = bool(
            (bm2.get("/v1/namespaces") or {}).get("relists")
        )

    print("live-smoke OK " + json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.exit(main())
