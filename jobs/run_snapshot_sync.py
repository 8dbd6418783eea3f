#!/usr/bin/env python
"""spark-submit entrypoint for POLL-BASED CDC: sync keyed state from an
upstream that only publishes complete snapshots (the reference's export
path is a full, unpaginated List per resource type —
/root/reference/pkg/export/export.go:111-163). Each snapshot directory
under --watch is diffed against current state via
kube_etl_spark/streaming/snapdiff.py, producing a delta-sized op-log
merge (upserts for added/changed keys, deletes for vanished keys);
downstream consumers see the same CDC contract a real watch stream
gives, and the per-snapshot work is |changed keys|, not |snapshot|.

    run_snapshot_sync.py --watch <dir> --state <dir> --keys k1[,k2...]
                         [--once] [--lease] [--health <path>]

--watch holds one subdirectory per snapshot (any parquet dataset);
subdirectory NAMES order the snapshots NATURALLY — digit runs compare
numerically (snap-2 before snap-10), so both zero-padded and unpadded
exporter naming schemes apply in the intended order. Processed names are
remembered in <state>.applied.json, so restarts resume. Losing the
marker (crash between merge and marker write) is safe twice over: the
LATEST snapshot re-diffs empty against its own resulting state, and
OLDER snapshots — whose re-diff is non-empty because it describes
rolling state BACK — merge at stale seqs that the StateTable's max-seq
winner rule discards, so a full replay preserves state bit-for-bit
(tested); the only cost is the wasted diff work.
--once applies what is currently in the directory and exits — the
test/cron mode; without it the job polls every 30 s until killed.
--lease acquires a WriterLease beside the state dir and fences every
merge (required whenever two replicas could point at one state dir).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time


def _applied_path(state: str) -> str:
    return state.rstrip("/") + ".applied.json"


def _load_marker(state: str) -> tuple[list[str], int]:
    """(applied names, skips since the last successful apply). The skip
    counter is persisted so a cron-driven --once cadence (one poll per
    process) still accumulates evidence of a numbering reset."""
    try:
        with open(_applied_path(state)) as f:
            m = json.load(f)
            return m["applied"], int(m.get("skips_since_apply", 0))
    except (OSError, json.JSONDecodeError, KeyError, ValueError):
        return [], 0


def _snap_order(name: str) -> list:
    """Natural-sort key: digit runs compare numerically, so snap-2
    orders before snap-10 even when an exporter emits unpadded names
    (ADVICE r6 — lexicographic ordering would diff snapshots out of
    order and merge newer data at lower seqs). Zero-padded names sort
    identically to before."""
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", name)]


def _pending(watch: str, applied: list[str]) -> tuple[list[str], list[str]]:
    """(to_apply, stale): complete, unapplied snapshot dirs in natural
    order — EXCLUDING any that order below the newest applied name.
    A lower-numbered snapshot whose _SUCCESS lands only after a higher
    one was applied (exporter still writing snap-9 when snap-10
    commits) must never be applied late: its diff would describe
    rolling state BACK and would win the max-seq merge, regressing
    state until the next poll (review r7). Such stragglers are
    returned separately so the caller can mark them consumed and warn."""
    done = set(applied)
    fresh = sorted(
        (
            d
            for d in os.listdir(watch)
            if os.path.isdir(os.path.join(watch, d))
            and d not in done
            # only complete datasets: the exporter's _SUCCESS is the commit
            and os.path.exists(os.path.join(watch, d, "_SUCCESS"))
        ),
        key=_snap_order,
    )
    if not applied:
        return fresh, []
    horizon = max(_snap_order(a) for a in applied)
    return (
        [d for d in fresh if _snap_order(d) > horizon],
        [d for d in fresh if _snap_order(d) <= horizon],
    )


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--watch", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--keys", required=True, help="comma-separated key columns")
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--lease", action="store_true")
    ap.add_argument("--poll-s", type=float, default=30.0)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from kube_etl_spark.session import configure
    from kube_etl_spark.streaming.cdc import StateTable, atomic_write_json
    from kube_etl_spark.streaming.snapdiff import SnapshotDiffSource

    owned = SparkSession.getActiveSession() is None
    spark = configure(
        SparkSession.builder.appName("kube-etl-snapshot-sync").getOrCreate()
    )
    lease = None
    renew_cm = None
    if args.lease:
        from kube_etl_spark.streaming.lease import WriterLease, renewal

        lease = WriterLease(args.state.rstrip("/") + ".lease")
        if not lease.acquire():
            raise SystemExit(f"state {args.state} is leased by another writer")
        # shared renew-at-ttl/3 helper (review r9): without renewal the
        # lease expires after ttl and every later merge self-fences
        # with LeaseLost — even --once, if one snapshot's diff outlives
        # the ttl. No on_lost hook: this job has no streams to stop;
        # the state table's own assert_held makes the next merge raise
        # rather than clobber the new owner.
        renew_cm = renewal(lease)
        renew_cm.__enter__()
    try:
        applied, skips_since_apply = _load_marker(args.state)
        src = SnapshotDiffSource(
            StateTable(
                spark, args.state, args.keys.split(","), "seq", lease=lease
            ),
            seq=len(applied),
        )
        while True:
            to_apply, stale = _pending(args.watch, applied)
            # a RUN of below-horizon snapshots with nothing applicable
            # is not stragglers — it is the exporter's numbering having
            # RESET (redeploy / counter reset / new naming scheme).
            # Silently consuming them would freeze the sync forever
            # while polling healthily. The counter is CUMULATIVE skips
            # since the last successful apply (ADVICE r7): a reset
            # exporter emitting at poll cadence yields only one stale
            # snapshot per poll, so a per-poll count would never fire —
            # each poll's skips accumulate until an apply resets it.
            if not to_apply and skips_since_apply + len(stale) > 3:
                raise SystemExit(
                    f"snapshot numbering regression: "
                    f"{skips_since_apply + len(stale)} consecutive pending "
                    f"snapshots order below the newest applied "
                    f"({max(applied, key=_snap_order)}) with nothing "
                    "applicable — exporter numbering reset? Start a fresh "
                    "--state (or clear the .applied.json marker) to resync"
                )
            for name in stale:
                # superseded by an already-applied newer snapshot:
                # consume WITHOUT applying (its diff would roll state
                # back at a winning seq) and say so
                applied.append(name)
                skips_since_apply += 1
                atomic_write_json(
                    _applied_path(args.state),
                    {"applied": applied, "skips_since_apply": skips_since_apply},
                )
                print(
                    json.dumps(
                        {"snapshot": name, "skipped": "superseded"}
                    ),
                    flush=True,
                )
            for name in to_apply:
                snap = spark.read.parquet(os.path.join(args.watch, name))
                delta = src.apply(snap)
                # marker written AFTER the merge: a crash in between
                # replays the snapshot, whose re-diff is empty — the
                # idempotence the module tests pin
                applied.append(name)
                skips_since_apply = 0
                atomic_write_json(
                    _applied_path(args.state),
                    {"applied": applied, "skips_since_apply": 0},
                )
                print(
                    json.dumps(
                        {
                            "snapshot": name,
                            "delta_rows": delta.count(),
                            "applied_total": len(applied),
                        }
                    ),
                    flush=True,
                )
            if args.once:
                break
            time.sleep(args.poll_s)  # pragma: no cover - service loop
    finally:
        if renew_cm is not None:
            renew_cm.__exit__(None, None, None)
        if lease is not None:
            lease.release()
        if owned:
            try:
                spark.stop()
            except Exception:
                pass


if __name__ == "__main__":
    main(sys.argv[1:])
