"""Streaming-job health and metrics — the observable-process half of
the reference syncer's operational shell (its manager exposes a
metrics endpoint and liveness/readiness probes;
/root/reference/syncer/config/manager/manager.yaml wires them). A
Spark Structured Streaming job's equivalent surface is the
StreamingQueryListener: every micro-batch emits a progress event, and
this module folds those into two small JSON artifacts a Kubernetes
probe (or a human) can read without touching the Spark UI:

  * ``metrics.jsonl`` — one line per micro-batch progress (append-only
    history: batch id, input rows, processed rows/sec, batch duration,
    state-store rows, watermark);
  * ``health.json`` — the current snapshot, atomically replaced each
    batch: last-progress wall-clock, per-query status, cumulative
    totals. ``is_healthy`` evaluates it with a staleness budget — the
    exec-probe analog of an HTTP liveness endpoint (the deploy/k8s
    manifests can point a probe at ``python -m
    kube_etl_spark.streaming.health <dir> --max-staleness 300``).

Scale note: listener callbacks run on the driver and touch O(1) data
per batch — no executor involvement; the artifacts are bytes-sized, so
this adds zero load to the data path.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


from .cdc import atomic_write_json as _atomic_write_json


class HealthListener(StreamingQueryListener):
    """Fold progress events into metrics.jsonl + health.json under
    ``out_dir``. One listener can serve every query in the session;
    health.json keys queries by name (falling back to id)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self._totals: dict[str, dict] = {}
        # id -> name so EVERY event keys the same health entry: progress
        # events carry the name but terminated/idle events carry only the
        # id — without the map, a named query's failure landed under a
        # fresh id key that a successful restart (keyed by name) never
        # cleared, wedging the probe red forever.
        self._names: dict[str, str] = {}

    def _key(self, event_id, name=None) -> str:
        if name:
            self._names[str(event_id)] = str(name)
            return str(name)
        return self._names.get(str(event_id), str(event_id))

    # -- listener protocol --------------------------------------------------
    def onQueryStarted(self, event) -> None:
        # A new query start SUPERSEDES prior failed entries under other
        # keys (review r9): production jobs don't set queryName, so a
        # failure is keyed by the run's UUID — a healthy restart runs
        # under a NEW UUID and could never clear the old entry, wedging
        # is_healthy red forever (the same wedge the _names map fixed
        # for named queries). One query per job process, so the restart
        # IS the supersession; the exception is kept for forensics.
        key = self._key(event.id, event.name)
        path = os.path.join(self.out_dir, "health.json")
        try:
            with open(path) as f:
                cur = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            cur = None
        if cur is not None:
            demoted = False
            for k, q in cur.get("queries", {}).items():
                if k != key and q.get("status") == "failed":
                    q["status"] = "failed_superseded"
                    demoted = True
            if demoted:
                _atomic_write_json(path, cur)
        self._snapshot(key, {"status": "started"})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        key = self._key(p.id, p.name)
        row = {
            "query": key,
            "batch_id": p.batchId,
            "timestamp": p.timestamp,
            "num_input_rows": p.numInputRows,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "batch_duration_ms": (p.durationMs or {}).get("triggerExecution"),
            "state_rows": sum(
                (s.numRowsTotal or 0) for s in (p.stateOperators or [])
            ),
            "watermark": (p.eventTime or {}).get("watermark"),
        }
        with open(os.path.join(self.out_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")
        tot = self._totals.setdefault(
            key, {"batches": 0, "input_rows": 0}
        )
        tot["batches"] += 1
        tot["input_rows"] += p.numInputRows or 0
        self._snapshot(
            key,
            {
                "status": "running",
                "last_batch_id": p.batchId,
                "last_batch_duration_ms": row["batch_duration_ms"],
                **tot,
            },
        )

    def onQueryTerminated(self, event) -> None:
        self._snapshot(
            self._key(event.id),
            {"status": "failed" if event.exception else "terminated",
             "exception": str(event.exception) if event.exception else None},
        )

    def onQueryIdle(self, event) -> None:
        # idle is HEALTHY: Spark emits no progress events without data,
        # so without this refresh a quiet-source job goes "stale" and a
        # liveness probe crash-loops a perfectly healthy pod. The idle
        # tick proves the driver is alive — refresh its freshness stamp.
        self._snapshot(self._key(event.id), {"status": "idle"})

    # -- snapshot -----------------------------------------------------------
    def _snapshot(self, key: str, fields: dict) -> None:
        path = os.path.join(self.out_dir, "health.json")
        try:
            with open(path) as f:
                cur = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            cur = {"queries": {}}
        q = cur["queries"].setdefault(key, {})
        q.update(fields)
        # per-query freshness: one hung sibling must not hide behind a
        # progressing query's global timestamp
        q["last_seen_unix"] = time.time()
        cur["last_progress_unix"] = time.time()
        _atomic_write_json(path, cur)


# One live HealthListener per Spark application (keyed by appId): every
# Python streaming listener costs a py4j round-trip PER EVENT on the
# context's single streams dispatch queue, so listeners that are
# attached and never removed accumulate into minutes of event-delivery
# lag (observed r9: a shared test session with dozens of leaked --once
# job listeners drip-fed terminated events 10-15 s apart, starving a
# freshly-attached listener for >3 min). Production runs one job per
# process, so the replacement is a no-op there; in a shared session the
# newest job's listener wins — exactly the monitoring that pod is for.
_ATTACHED: dict[str, HealthListener] = {}


def attach_health(spark: SparkSession, out_dir: str) -> HealthListener:
    """Register a HealthListener on the session, replacing any listener
    this function previously attached in the same application; returns
    it (remove early via spark.streams.removeListener if needed)."""
    listener = HealthListener(out_dir)
    key = spark.sparkContext.applicationId
    prev = _ATTACHED.pop(key, None)
    if prev is not None:
        try:
            spark.streams.removeListener(prev)
        except Exception:
            pass  # already removed by the caller — harmless
    spark.streams.addListener(listener)
    _ATTACHED[key] = listener
    return listener


def is_healthy(out_dir: str, max_staleness_s: float = 300.0) -> tuple[bool, str]:
    """Probe verdict over health.json: healthy iff the file exists, no
    query reports 'failed', and the last progress is fresher than the
    staleness budget. Returns (ok, reason)."""
    path = os.path.join(out_dir, "health.json")
    try:
        with open(path) as f:
            h = json.load(f)
    except FileNotFoundError:
        return False, "no health.json (job never progressed)"
    except json.JSONDecodeError:
        return False, "torn health.json"
    failed = [k for k, q in h.get("queries", {}).items() if q.get("status") == "failed"]
    if failed:
        return False, f"failed queries: {failed}"
    now = time.time()
    # staleness is judged PER LIVE QUERY (started/running/idle): a hung
    # sibling must not hide behind a progressing query's heartbeat, and
    # cleanly-terminated queries don't count against the budget. Idle
    # ticks refresh last_seen_unix, so quiet-but-alive jobs stay green.
    stale = []
    live = {
        k: q
        for k, q in h.get("queries", {}).items()
        if q.get("status") in ("started", "running", "idle")
    }
    for k, q in live.items():
        age = now - q.get("last_seen_unix", h.get("last_progress_unix", 0))
        if age > max_staleness_s:
            stale.append(f"{k} ({age:.0f}s)")
    if stale:
        return False, f"stale queries (budget {max_staleness_s:.0f}s): {stale}"
    if not live:
        age = now - h.get("last_progress_unix", 0)
        if age > max_staleness_s:
            return False, f"stale: last event {age:.0f}s ago (budget {max_staleness_s:.0f}s)"
    return True, "ok"


def main(argv: list[str] | None = None) -> int:  # pragma: no cover - probe shell
    import argparse
    import sys

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--max-staleness", type=float, default=300.0)
    args = ap.parse_args(argv)
    ok, reason = is_healthy(args.out_dir, args.max_staleness)
    print(reason)
    return 0 if ok else 1


if __name__ == "__main__":  # pragma: no cover
    import sys

    sys.exit(main(sys.argv[1:]))
