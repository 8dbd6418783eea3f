"""Global plan lint — every registered query, one sweep of scale rules.

test_planshape.py pins specific queries' plans in depth; this sweep is
the broad guard that FUTURE queries can't silently ship the classic
scale killers: a cartesian product, a row-at-a-time Python UDF outside
the declared UDF operators, or an unbounded lineage/plan blowup (the
pagerank/triangle bug class: a frame consumed N times whose subtree
re-executes N times and whose plan text grows exponentially).
"""

from __future__ import annotations

import re

import pytest

from kube_etl_spark.registry import all_specs
from .conftest import SMOKE_SF

# A window frame that ENDS at UNBOUNDED FOLLOWING but does not START at
# UNBOUNDED PRECEDING (e.g. rowsBetween(0, unboundedFollowing)) is
# evaluated by Spark's UnboundedFollowingWindowFunctionFrame, which
# re-scans the partition tail for EVERY row — O(n²) per partition
# (measured: 24 s vs 2.76 s on the 1 M-row gapfill grid). The whole-
# partition frame (unboundedpreceding, unboundedfollowing) is a single
# O(n) aggregate buffer and is allowed. Express forward carries as
# backward carries over the reversed order instead.
_QUADRATIC_FRAME = re.compile(
    r"specifiedwindowframe\((?:Row|Range)Frame,"
    r" (?!unboundedpreceding\$\(\))[^,]*(?:\$\(\))?, unboundedfollowing\$\(\)\)"
)

# Row-at-a-time Python UDFs are the declared slow-path surface of
# exactly these operators (U1 scalar UDF, U4 UDTF) — anywhere else a
# BatchEvalPython node is a hot-path bug.
ROW_UDF_ALLOWED = {"q_udf_scalar", "q_udtf_explode"}
# Arrow-batched Python (pandas UDF / applyInPandas / mapInPandas) is
# the declared surface of the U2/U3 operators and the media family
# (binary decode can't be a JVM expression).
ARROW_ALLOWED_PREFIXES = ("q_udf_pandas", "q_udaf_grouped_map", "q_media_")
# One plan may hold at most this many exchange nodes / characters:
# generous for real multi-stage analytics (max today: q_market_basket
# at 17 exchanges, ~30 KB), far below the exponential-unroll regime
# (pre-fix pagerank: 1909 exchanges, 1.4 MB; triangle: 284, 220 KB).
MAX_EXCHANGES = 24
MAX_PLAN_CHARS = 120_000


def _fails(name, plan: str) -> list[str]:
    out = []
    if "CartesianProduct" in plan:
        out.append("CartesianProduct")
    if "BatchEvalPython" in plan and name not in ROW_UDF_ALLOWED:
        out.append("row-Python UDF outside the declared UDF operators")
    if (
        ("ArrowEvalPython" in plan or "MapInPandas" in plan or "FlatMapGroupsInPandas" in plan)
        and not name.startswith(ARROW_ALLOWED_PREFIXES)
    ):
        out.append("Arrow/pandas exec outside the declared surfaces")
    if _QUADRATIC_FRAME.search(plan):
        out.append(
            "O(n²) window frame: ends at UNBOUNDED FOLLOWING without "
            "starting at UNBOUNDED PRECEDING — mirror it as a backward "
            "carry over the reversed order"
        )
    n_exch = plan.count("Exchange")
    if n_exch > MAX_EXCHANGES:
        out.append(f"{n_exch} exchanges (lineage blowup?)")
    if len(plan) > MAX_PLAN_CHARS:
        out.append(f"plan text {len(plan)} chars (lineage blowup?)")
    return out


def test_all_plans_pass_lint(spark):
    violations = {}
    for name, spec in all_specs().items():
        df = spec.fn(spark, SMOKE_SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        bad = _fails(name, plan)
        if bad:
            violations[name] = bad
    assert not violations, f"plan lint violations: {violations}"
