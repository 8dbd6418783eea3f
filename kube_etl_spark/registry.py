"""The declared query registry — SURVEY.md §2's inventory, executable.

Every operator the engine claims is registered here as a QuerySpec:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) a DuckDB oracle SQL string the
driver runs side-by-side for a row-count + schema + value-hash match.
Specs with ``oracle=None`` get the contract's weaker rows-only check.

The registry is the single source of truth for:
  * ``__spark_entry__.queries()`` / ``oracle_sql()`` (driver contract)
  * the pytest parity suite (tests/test_parity.py)
  * bench.py's headline set (specs flagged ``bench=True``)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py's headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}

# The driver's per-round correctness check covers only the FIRST 50
# entries of __spark_entry__.queries() (CORRECTNESS_r01.json was exactly
# the first 50 registrations in module-import order, which starved whole
# operator families of a driver-green row). This list pins the window:
# a curated, all-oracle-backed spread.
#
# ROTATION POLICY (mechanical from r5 on — VERDICT r4 #6). Each round
# the 50 slots are filled in strict priority order:
#   1. ANCHORS (8): one per load-bearing §2 family — the flagship agg,
#      the reference rule engine, the round-1 hard-fail, the upsert and
#      delete-propagation sinks, a pandas UDF, a subquery, a status
#      write-back. Pinned EVERY round so regressions in the paths
#      everything else composes with surface immediately.
#   2. NEWEST-UNPROVEN: every name in ROTATE_NEXT (oracle-backed
#      queries registered after the previous window filled — the only
#      queries with NO driver evidence). All of them, every round; the
#      cap in tests/test_entry.py guarantees they fit.
#   3. OLDEST-EVIDENCE RE-PINS: remaining slots go to the queries whose
#      newest driver hash row is the OLDEST (ties broken toward bench
#      headliners and families named by the current VERDICT), so
#      shared-helper churn between a query's last external check and
#      today's code keeps getting re-proven. The re-pin queue lives in
#      ROTATE_NEXT once the unproven backlog is drained (see below).
# Constraints (enforced by tests/test_entry.py): every slot
# oracle-backed; all ten §2 family letters represented; ≥3 streaming-
# family names. Queries rotated OUT remain covered by the local
# oracle-parity suite (tests/test_parity.py runs all 193) and keep
# their prior rounds' driver evidence. Rows-only sketches
# (approx/sampling/LSH scale paths) never occupy a window slot.
#
# Round-11 window (VERDICT r10 #1): 8 anchors + the 4 round-10 widening
# queries (the ONLY oracle-backed names with zero driver evidence — the
# r10 ROTATE_NEXT head, each locally parity-green and independently
# verified by the r10 judge) + 2 rows-only execution slots (the
# documented r11 re-execution queue: q_sample +
# q_agg_percentile_approx — with these, every rows-only query has a
# post-r01 driver execution row) + the 15 remaining r05-evidence
# re-pins (r10 ROTATE_NEXT body) + the first 16 r06-evidence re-pins +
# 5 pulled from the r12 queue head in r06 window order
# (q_stream_watermark promoted over q_agg_conditional for the ≥3
# streaming quota, the same promotion move r10 made with
# q_stream_tumbling). 8+4+2+15+16+5 = 50.
PRIORITY: tuple[str, ...] = (
    # 1. pinned anchors — one per §2 family
    "q_agg_groupby",        # A1 flagship
    "q_validate_rules",     # P8 — reference rule engine
    "q_array_funcs2",       # F4 — the round-1 hard fail, keep pinned
    "q_scalar_subquery",    # SQ — r02's vacuous slot, non-vacuous since r3
    "q_syncer_status",      # S3/P8 status write-back (keeps S covered)
    "q_udf_pandas",         # U2
    "q_cdc_upsert",         # ST6 — reference upsert sink semantics
    "q_cdc_apply_oplog",    # ST7 — reference delete propagation
    # 2. newest-unproven: the 4 round-10 widening queries (r10
    # ROTATE_NEXT head — zero driver evidence until this window runs)
    "q_discovery_expansion_diff",
    "q_fanout_amplification",
    "q_oplog_compaction_ratio",
    "q_sync_conflict_audit",
    # 2b. rows-only execution slots (see ROWS_ONLY_WINDOW below)
    "q_sample",
    "q_agg_percentile_approx",
    # 3a. oldest-evidence re-pins: the 15 remaining r05-evidence names
    # (r10 ROTATE_NEXT re-pin queue head)
    "q_key_skew_audit",
    "q_knn_classify",
    "q_mode_per_group",
    "q_ngram_novelty",
    "q_pareto_concentration",
    "q_percent_of_parent",
    "q_recursive_cte",
    "q_rolling_active_users",
    "q_sample_weighted",
    "q_seasonality_index",
    "q_time_to_convert",
    "q_tpch_q3_shipping_priority",
    "q_triangle_count",
    "q_weighted_median",
    "q_window_running_distinct",
    # 3b. oldest-evidence re-pins: the first 16 r06-evidence names in
    # r06 window order (r10 ROTATE_NEXT re-pin queue body)
    "q_user_trend_slope",
    "q_yoy_growth",
    "q_reactivation",
    "q_attribution_linear",
    "q_window_ntile_cume",
    "q_partition_pruned_scan",
    "q_schema_evolution_read",
    "q_dedup_incremental",
    "q_sample_user_consistent",
    "q_gapfill_interpolate",
    "q_cohort_ltv",
    "q_join_nearest_event",
    "q_dedup_savings",
    "q_knn_quantized",
    "q_embedding_drift",
    "q_quantile_bucket_join",
    # 3c. pulled forward from the r12 queue head (r06 window order,
    # q_stream_watermark promoted for the streaming quota)
    "q_agg_global",
    "q_agg_count_distinct",
    "q_agg_percentile",
    "q_agg_collect",
    "q_stream_watermark",
)

# Rows-only queries legally occupying window slots THIS round (cap 2,
# enforced in tests/test_entry.py). The driver records err=no_oracle
# with spark_rows>0 — weaker than a hash row but the only external
# execution evidence the rows-only contract allows (VERDICT r7 #4).
# Executed so far: q_knn_ivf + q_dedup_semantic (r8, 30/10 rows);
# q_knn_lsh + q_dedup_incremental_capped (r9, 30/56 rows);
# q_quantile_bucket_join_approx + q_profile_columns_approx (r10, the
# last two ZERO-execution rows-only names — from here on every slot is
# a RE-execution; every name below already has r01 evidence). Queue:
# q_sample + q_agg_percentile_approx (r11, this window),
# q_agg_approx_distinct + q_dedup_fuzzy (r12), q_knn_ivf +
# q_dedup_semantic (r13, oldest-execution order resumes).
ROWS_ONLY_WINDOW: tuple[str, ...] = (
    "q_sample",
    "q_agg_percentile_approx",
)

# Two roles, in order (see ROTATION POLICY above):
#   a. Oracle-backed queries registered AFTER the current window
#      filled (no driver evidence yet) — guaranteed a slot next round;
#      tests/test_entry.py enforces they cannot be parked here once a
#      newer CORRECTNESS file exists.
#   b. Once (a) is empty — as it is after the r5 drain — the
#      OLDEST-EVIDENCE re-pin queue: the names whose newest driver
#      hash row is the oldest, pre-curated for the next round's step-3
#      slots so future rotations are a mechanical copy.
ROTATE_NEXT: tuple[str, ...] = (
    # round-11 widening batch FIRST (no driver evidence yet — step-2
    # names for the r12 window): the 410-recovery delta audit, the
    # per-field merge divergence audit (the offline twins of the r11
    # engine work: relist_delta_rows / StateTable field_merge), and the
    # purge-horizon audit (session 2 — the purge_tombstones operator
    # input, block-keyed so both branches materialize at every SF)
    "q_relist_delta",
    "q_field_merge_divergence",
    "q_purge_horizon_audit",
    # r12 re-pin queue: the 21 remaining r06-evidence names in their
    # r06 window order (the 26 left after the r11 window took 16, plus
    # q_agg_conditional — displaced from the r11 pull-forward by
    # q_stream_watermark's streaming-quota promotion — minus the other
    # 4 pulled forward). Round-11 widening queries, when registered,
    # are PREPENDED above this block (step-2 names for the r12 window)
    # — the ≤35 cap leaves 14 slots of headroom for them.
    # r12 window math: 8 anchors + 2 rows-only (q_agg_approx_distinct +
    # q_dedup_fuzzy per the ROWS_ONLY_WINDOW queue) + any r11 widening
    # + these 21 = 31+; remaining slots come from the r13 queue head
    # (the r07-evidence names, oldest first).
    "q_agg_conditional",
    "q_agg_argmax",
    "q_project_nested",
    "q_drop_normalize",
    "q_case_coalesce_concat",
    "q_string_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_array_funcs",
    "q_map_funcs",
    "q_hash_funcs",
    "q_string_funcs2",
    "q_date_funcs2",
    "q_conditional_funcs",
    "q_regex_funcs",
    "q_orderby_multi",
    "q_tpch_q7_nation_volume",
    "q_join_star",
    "q_knn_cosine",
    "q_text_stats",
    "q_window_topk_group",
)


def query(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query implementation under its SURVEY §2 ID."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle.strip() if isinstance(oracle, str) else None,
            doc=(fn.__doc__ or "").strip(),
            bench=bench,
            tags=tuple(tags),
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import for side effect: each queries/* module registers its specs.
    from . import queries  # noqa: F401


def all_specs() -> dict[str, QuerySpec]:
    """Registry in driver-visible order: PRIORITY window first, then the
    remaining specs in registration order.

    A PRIORITY name that failed to register (renamed, import error in
    its module) is WARNED about and dropped rather than raised (ADVICE
    r2): one bad name must not take down every entrypoint — the next
    registration-order query slides into the window instead."""
    _ensure_loaded()
    missing = [n for n in PRIORITY if n not in _REGISTRY]
    if missing:
        import warnings

        warnings.warn(
            f"PRIORITY names not registered (dropped from the window): {missing}",
            stacklevel=2,
        )
    head = [n for n in PRIORITY if n in _REGISTRY]
    rest = [n for n in _REGISTRY if n not in set(PRIORITY)]
    return {n: _REGISTRY[n] for n in (*head, *rest)}


def all_queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_specs().items()}


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}


def bench_specs() -> dict[str, QuerySpec]:
    return {n: s for n, s in all_specs().items() if s.bench}
