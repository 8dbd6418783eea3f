"""Generate docs/operators.md from the registry (`make catalog`).

The catalog is the switch-over index: one row per registered query with
its §2 family tags, oracle status, and docstring headline — regenerated
whenever the registry changes so the doc can never drift from the code.
"""

from __future__ import annotations

import os

from .registry import PRIORITY, all_specs

_DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "docs", "operators.md")


def render() -> str:
    specs = all_specs()
    lines = [
        "# Operator catalog",
        "",
        "Generated from `kube_etl_spark/registry.py` (`make catalog`). One row per",
        "registered query: SURVEY.md §2 family tags, whether the driver-comparable",
        "DuckDB oracle exists (`rows-only` = sketch/sampling/hash paths whose exact",
        "twin is a separate row), and the first line of the implementation's",
        "docstring. All of these run as `queries()[name](spark, sf_dir)`.",
        "",
        "Fresh-context orientation — current registry counts, gate battery,",
        "rotation queue, and the evidence map — lives in SURVEY.md §0",
        "(“Current state”), one page, ahead of the round appendices.",
        "",
        f"**{len(specs)} queries** — {sum(1 for s in specs.values() if s.oracle)} oracle-checked, "
        f"{sum(1 for s in specs.values() if not s.oracle)} rows-only; "
        f"the first {len(PRIORITY)} form the driver's correctness window.",
        "",
        "| query | tags | oracle | what it does |",
        "|---|---|---|---|",
    ]
    for name in sorted(specs):
        s = specs[name]
        doc = (s.doc or "").strip().splitlines()
        first = (doc[0].strip() if doc else "").rstrip(" .")
        tags = " ".join(s.tags)
        lines.append(
            f"| `{name}` | {tags} | {'yes' if s.oracle else 'rows-only'} | {first} |"
        )
    return "\n".join(lines) + "\n"


def main() -> None:
    with open(_DOC, "w") as f:
        f.write(render())
    print(f"wrote {_DOC}")


if __name__ == "__main__":
    main()
