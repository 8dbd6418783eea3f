#!/usr/bin/env python
"""`kube-etl` — the single-binary CLI front door.

The reference ships ONE binary whose subcommands dispatch to the
pipelines (cobra root command, main.go:25-37: `kube-etl export ...`;
the syncer controller is its own manager binary, syncer/main.go). This
repo's 13 spark-submit job entrypoints under jobs/ each kept their own
argparse surface; this shim restores the reference's UX without
changing any of them:

    spark-submit ... jobs/kube_etl.py export --output /data/out --zip
    spark-submit ... jobs/kube_etl.py syncer --rules rules.json ...
    python jobs/kube_etl.py --help          # list every subcommand

Dispatch is purely mechanical — `kube-etl <sub> [args...]` forwards
argv verbatim to the matching jobs/run_<sub>.py:main(), so every flag,
default, and error message is the per-job module's own (and the
manifest↔argparse cross-check tests keep covering them). No behavior
lives here; tests/test_jobs.py pins the subcommand table against the
jobs/ directory listing so a new job cannot ship without a front-door
entry.
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
for p in (_REPO, _HERE):
    if p not in sys.path:
        sys.path.insert(0, p)

# subcommand -> module name under jobs/ (import deferred to dispatch:
# each job module pulls in pyspark, and `--help` must stay instant)
SUBCOMMANDS: dict[str, str] = {
    "export": "run_export",
    "cluster-export": "run_cluster_export",
    "watch-bridge": "run_watch_bridge",
    "syncer": "run_syncer",
    "snapshot-sync": "run_snapshot_sync",
    "neardup": "run_neardup",
    "substrdup": "run_substrdup",
    "index-stream": "run_index_stream",
    "retrieval-index": "run_retrieval_index",
    "pretraining": "run_pretraining",
    "attribution": "run_attribution",
    "audit": "run_audit",
    "freq": "run_freq",
    "maintenance": "run_maintenance",
    "scale-truth": "scale_truth",
    "live-smoke": "live_smoke",
    "plan-audit": "plan_audit",
}


def _usage() -> str:
    width = max(map(len, SUBCOMMANDS))
    lines = "\n".join(
        f"  {sub.ljust(width)}  jobs/{mod}.py" for sub, mod in sorted(SUBCOMMANDS.items())
    )
    return (
        "usage: kube-etl <subcommand> [args...]\n\n"
        "subcommands (args forward verbatim to the job's own argparse;\n"
        "run `kube-etl <subcommand> --help` for its flags):\n" + lines + "\n"
    )


def main(argv: list[str]) -> None:
    if not argv or argv[0] in ("-h", "--help"):
        print(_usage(), end="")
        if not argv:
            raise SystemExit(2)
        return
    sub, rest = argv[0], argv[1:]
    mod_name = SUBCOMMANDS.get(sub)
    if mod_name is None:
        print(f"kube-etl: unknown subcommand {sub!r}\n\n" + _usage(), file=sys.stderr, end="")
        raise SystemExit(2)
    import importlib

    mod = importlib.import_module(mod_name)
    mod.main(rest)


if __name__ == "__main__":
    main(sys.argv[1:])
