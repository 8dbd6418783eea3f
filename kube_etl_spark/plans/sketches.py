"""Mergeable distinct-count sketches (EXT; the pre-aggregation layer a
100 TB deployment runs so "distinct users last N days" never rescans
raw events).

One pass builds a compact HLL sketch per (day, segment) cell — the
Apache DataSketches HllSketch under Spark's `hll_sketch_agg` — and any
later rollup (arbitrary date range, segment union, grand total) merges
the register arrays with `hll_union_agg`: register merge is a
pointwise MAX, so union-of-cell-sketches is EXACTLY the sketch of the
unioned data — estimates agree bit-for-bit with a direct sketch, and
re-aggregation needs only |cells| rows, not the corpus.

The registered query twin lives in queries/aggregates.py
(q_agg_approx_distinct, rows-only by driver contract); this module is
the materialized-layer version with the merge algebra, its exactness
bounds pinned by tests/test_jobs.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_daily_sketches(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """One corpus pass → (day, event_type, user sketch, n_rows). The
    sketch column is a few KB regardless of cell cardinality; lgK=12
    gives ~1.6% standard error. Map-side partial aggregation applies
    (sketch-agg is commutative/associative), so the shuffle carries
    sketches, not user ids."""
    return (
        events.groupBy(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
            "event_type",
        )
        .agg(
            F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("users_hll"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def estimate_distinct(sketches: DataFrame, *group_cols: str) -> DataFrame:
    """Roll the cell sketches up to any coarser grain and estimate
    distinct users there. No raw data touched: input is |cells| rows."""
    gb = sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    out = gb.agg(
        F.hll_sketch_estimate(F.hll_union_agg("users_hll")).alias("distinct_users_est"),
        F.sum("n_rows").alias("n_rows"),
    )
    return out.orderBy(*group_cols) if group_cols else out
