#!/usr/bin/env python
"""spark-submit entrypoint for the continuous sync pipeline (the
KRMSyncer controller analog — see deploy/k8s/syncer-stream.yaml).

    spark-submit ... run_syncer.py --rules rules.yaml --oplog <stream-dir> \
        --state <state-root> --checkpoint <ckpt-dir>

The rules file holds a list of rule dicts with the KRMSyncer CRD's
fields (see deploy/k8s/syncer-rules.yaml). The op-log is a file stream
of JSON change rows (schema: tests/test_sync.py OBJ_SCHEMA); in a real
deployment this is the Kafka/object-store landing zone of a watch
exporter. Each micro-batch is compiled through the rule engine and
MERGEd idempotently into one StateTable per syncer.
"""

from __future__ import annotations

import argparse
import json
import sys


OBJ_SCHEMA = (
    "seq long, op string, group string, version string, kind string, "
    "namespace string, name string, labels map<string,string>, "
    "annotations map<string,string>, "
    "spec struct<foo:string,resourceID:string>, status struct<bar:string>"
)


def load_rules(spark, path: str):
    """Rules from YAML (if available) or JSON — config-as-data."""
    with open(path) as f:
        text = f.read()
    try:
        import yaml  # optional dependency

        rows = yaml.safe_load(text)
    except ImportError:
        rows = json.loads(text)
    cols = (
        "syncer_name syncer_namespace suspend mode rule_group rule_version "
        "rule_kind namespaces sync_fields remote_secret".split()
    )
    data = [tuple(r.get(c) for c in cols) for r in rows]
    schema = (
        "syncer_name string, syncer_namespace string, suspend boolean, "
        "mode string, rule_group string, rule_version string, "
        "rule_kind string, namespaces array<string>, "
        "sync_fields array<string>, remote_secret string"
    )
    return spark.createDataFrame(data, schema)


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rules", required=True)
    ap.add_argument("--oplog", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument(
        "--secrets",
        default=None,
        help="JSON file mapping '<ns>/<name>' -> credential for push-mode "
        "kubeconfig Secret resolution; omitted = resolve everything "
        "(local demo). Unresolvable secrets skip the syncer, as the "
        "reference does (krmsyncer_controller.go:479-484)",
    )
    ap.add_argument("--once", action="store_true", help="availableNow instead of continuous")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from kube_etl_spark.session import configure
    from kube_etl_spark.streaming.cdc import StateTable
    from kube_etl_spark.streaming.sync import (
        DestinationRegistry,
        compile_sync,
        sync_to_destinations,
    )

    spark = configure(SparkSession.builder.appName("kube-etl-syncer").getOrCreate())
    # per-batch health/metrics artifacts beside the checkpoint —
    # read by the k8s liveness probe (streaming/health.py)
    from kube_etl_spark.streaming.health import attach_health

    attach_health(spark, args.checkpoint + ".health")
    rules = load_rules(spark, args.rules)
    stream = spark.readStream.schema(OBJ_SCHEMA).json(args.oplog)

    key_cols = ["group", "version", "kind", "namespace", "name"]

    # Mode-aware destinations (krmsyncer_controller.go:477-487): every
    # pull syncer lands in the LOCAL state table; each push syncer lands
    # in the remote destination named by its kubeconfig Secret, built
    # lazily once per (namespace, secret) — here a per-remote StateTable
    # under state/remote/, in a real deployment the remote catalog the
    # resolved credential points at.
    local_dest = StateTable(spark, f"{args.state}/local", key_cols, "seq")
    secrets = {}
    if args.secrets:
        with open(args.secrets) as f:
            secrets = json.load(f)
    registry = DestinationRegistry(
        factory=lambda cred: StateTable(
            spark,
            f"{args.state}/remote/{cred['namespace']}~{cred['secret']}",
            key_cols,
            "seq",
        ),
        resolve_credential=(
            (lambda ns, name: {"namespace": ns, "secret": name}
             if f"{ns}/{name}" in secrets else None)
            if args.secrets else None
        ),
    )

    def _merge(batch, _bid):
        changes = compile_sync(batch, rules)
        _written, skipped = sync_to_destinations(changes, rules, local_dest, registry)
        for name, why in skipped.items():
            print(f"skipped syncer {name}: {why}", file=sys.stderr)

    writer = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", args.checkpoint)
    )
    if args.once:
        writer.trigger(availableNow=True).start().awaitTermination()
    else:
        writer.start().awaitTermination()


if __name__ == "__main__":
    main(sys.argv[1:])
