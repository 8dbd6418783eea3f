#!/usr/bin/env python
"""spark-submit entrypoint for the WATCH BRIDGE — the continuous job
that turns a live cluster's watch streams into the landing zones the
rest of the engine already consumes. The reference's watch loop
(controller-runtime sources, krmsyncer_controller.go:283-325) becomes:

  watch events  → --landing   (JSON op-log files; run_syncer's source)
  410 Gone      → --snapshots (a full PAGINATED relist written as a
                  parquet snapshot dir; run_snapshot_sync's source,
                  whose diff recovers the deletes the missed window
                  contained — plain re-upserts could not)
                → --syncer-state (when given): the relist is ALSO
                  diffed against the syncer's believed-live keys
                  (state table ∪ landed op-log) and the delta —
                  re-upserts plus DELETE rows at the relist's list
                  resourceVersion — lands in --landing, so the
                  SYNCER's own state converges too (ADVICE r10: a
                  relist routed only to a separate snapshot-sync state
                  leaves the syncer holding gap-deleted keys forever).

    run_watch_bridge.py --kubeconfig kc.yaml --targets targets.json \
        --landing /data/oplog --snapshots /data/snaps --bookmark bm.json \
        [--syncer-state /warehouse/syncer] [--interval 30] [--once]

--targets is a JSON list of {group, version, kind, plural}. Per-target
resourceVersion bookmarks persist in --bookmark — written after EVERY
target, not per pass, so a crash mid-pass never loses the targets
already drained. A bookmark older than the server's retained window
takes the 410 path above (the exact contract q_watch_gap_relist audits
offline). Relists and per-target errors are counted in the bookmark
file — the operator's watch-health signal; a failing target logs and
is retried next pass rather than crash-looping the whole bridge (the
reference's per-watch backoff, controller-runtime source semantics).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _load_bookmarks(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def _save_bookmarks(path: str, bm: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(bm, f)
    os.replace(tmp, path)


def _target_key(t: dict) -> str:
    return f"{t['group']}/{t['version']}/{t['plural']}"


def _relist(client, target: dict) -> tuple[list[dict], str]:
    """One full paginated list → (objects, the list resourceVersion —
    the new watch bookmark; page one's rv, the snapshot point)."""
    objs: list[dict] = []
    rv = ""
    for items, page_rv in client.list_all(
        target["group"], target["version"], target["plural"]
    ):
        rv = rv or page_rv
        objs.extend(items)
    return objs, rv


def relist_to_snapshot(
    spark, target: dict, snap_root: str, n: int,
    objs: list[dict], rv: str,
) -> str:
    """The 410 recovery: a full paginated list written as ONE parquet
    snapshot dir (name-ordered for run_snapshot_sync), whose
    snapshot-diff downstream recovers the deletes the compacted watch
    window contained. Returns the new resourceVersion bookmark."""
    from kube_etl_spark.streaming.kubeapi import rv_to_seq

    rows = []
    for obj in objs:
        meta = obj.get("metadata") or {}
        rows.append(
            (
                target["group"],
                target["version"],
                target["kind"],
                meta.get("namespace") or "",
                meta.get("name") or "",
                rv_to_seq(
                    meta.get("resourceVersion"),
                    what=f"relisted {target['kind']} {meta.get('name')!r}",
                ),
                json.dumps(obj, sort_keys=True),
            )
        )
    out = os.path.join(
        snap_root, _target_key(target).replace("/", "~"), f"snap-{n}"
    )
    df = spark.createDataFrame(
        rows,
        "group string, version string, kind string, namespace string,"
        " name string, seq long, payload string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return rv


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kubeconfig", required=True)
    ap.add_argument("--context", default=None)
    ap.add_argument("--targets", required=True, help="JSON list of {group,version,kind,plural}")
    ap.add_argument("--landing", required=True, help="op-log landing zone (run_syncer --oplog)")
    ap.add_argument("--snapshots", required=True, help="relist snapshot root (run_snapshot_sync --watch)")
    ap.add_argument("--bookmark", required=True, help="resourceVersion bookmark file")
    ap.add_argument(
        "--syncer-state",
        default=None,
        help="run_syncer's --state root; when given, a 410 relist also "
        "emits its delta (re-upserts + deletes at the list rv) into "
        "--landing so the syncer's own state converges",
    )
    ap.add_argument("--interval", type=int, default=30, help="watch timeoutSeconds per poll")
    ap.add_argument("--max-events", type=int, default=None)
    ap.add_argument("--once", action="store_true", help="one drain pass per target, then exit")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from kube_etl_spark.session import configure
    from kube_etl_spark.streaming.kubeapi import (
        KubeApiClient,
        KubeApiError,
        WatchExpired,
        _land_rows,
        drain_watch,
        relist_delta_rows,
    )
    from kube_etl_spark.streaming.kubeconfig import rest_config_from_kubeconfig

    with open(args.kubeconfig, "rb") as f:
        rc = rest_config_from_kubeconfig(f.read(), context=args.context)
    client = KubeApiClient(rc)
    with open(args.targets) as f:
        targets = json.load(f)
    spark = None  # lazy: only the relist path needs a SparkSession

    while True:
        bm = _load_bookmarks(args.bookmark)
        for t in targets:
            key = _target_key(t)
            entry = bm.get(key) or {}
            try:
                n, last_rv = drain_watch(
                    client,
                    t,
                    args.landing,
                    resource_version=entry.get("rv"),
                    timeout_seconds=args.interval,
                    max_events=args.max_events,
                )
                if last_rv:
                    entry["rv"] = last_rv
                entry["events"] = entry.get("events", 0) + n
            except WatchExpired as ex:
                # the compacted-window path: full relist into the
                # snapshot zone; snapshot-diff downstream recovers the
                # missed deletes (streaming/snapdiff.py), and with
                # --syncer-state the delta ALSO lands as op-log rows so
                # the syncer's state drops gap-deleted keys. A relist
                # that itself fails (transient apiserver error) keeps
                # the OLD bookmark: the next pass 410s again and
                # retries — never a crash-loop, never a skipped relist
                if spark is None:
                    spark = configure(
                        SparkSession.builder.appName("kube-etl-watch-bridge").getOrCreate()
                    )
                try:
                    objs, list_rv = _relist(client, t)
                    n_relist = entry.get("relists", 0) + 1
                    new_rv = relist_to_snapshot(
                        spark, t, args.snapshots, n_relist, objs, list_rv
                    )
                    n_deletes = 0
                    if args.syncer_state:
                        rows, n_deletes = relist_delta_rows(
                            spark, t, objs, list_rv, args.syncer_state,
                            landing_dir=args.landing,
                        )
                        if rows:
                            _land_rows(rows, args.landing)
                    # bookmark advances only after the WHOLE recovery
                    # block lands: advancing it on relist_to_snapshot
                    # alone meant a delta failure below left rv past
                    # the gap — the next pass would not 410 again and
                    # the gap-deletes were silently lost (ADVICE r11
                    # follow-on, pinned in test_kubeapi.py)
                    entry["rv"] = new_rv
                    entry["relists"] = n_relist
                    print(
                        f"watch expired for {key} ({ex}); relisted "
                        f"{len(objs)} objects into {args.snapshots} "
                        f"(relist #{n_relist}, {n_deletes} gap-deletes landed)",
                        file=sys.stderr,
                    )
                except Exception as rex:  # noqa: BLE001 — see below
                    # KubeApiError (transient apiserver) AND Spark-side
                    # failures (Py4J/AnalysisException while scanning
                    # the landing zone or syncer state in
                    # relist_delta_rows) — either escaping would crash
                    # the whole bridge, contradicting the per-target
                    # never-crash-loop design (ADVICE r11). Bookmark
                    # kept either way: the next pass 410s and retries.
                    entry["errors"] = entry.get("errors", 0) + 1
                    print(
                        f"relist failed for {key}: "
                        f"{type(rex).__name__}: {rex}; bookmark kept, "
                        f"retrying next pass",
                        file=sys.stderr,
                    )
            except KubeApiError as ex:
                # a failing target must not crash-loop the bridge (nor
                # lose the other targets' bookmarks — persisted below
                # per TARGET): log, count, retry next pass
                entry["errors"] = entry.get("errors", 0) + 1
                print(f"watch drain failed for {key}: {ex}", file=sys.stderr)
            bm[key] = entry
            _save_bookmarks(args.bookmark, bm)  # per target, not per pass
        if args.once:
            print(json.dumps(bm))
            return
        time.sleep(args.interval)


if __name__ == "__main__":
    main(sys.argv[1:])
