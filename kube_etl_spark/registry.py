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
# Round-10 window (VERDICT r9 #1): 8 anchors + the 6 round-9 widening
# queries (the ONLY oracle-backed names with zero driver evidence — the
# r9 ROTATE_NEXT head) + 2 rows-only execution slots (the documented
# r10 sketch queue: q_quantile_bucket_join_approx +
# q_profile_columns_approx, the last two rows-only queries with zero
# driver execution evidence — VERDICT r9 #5's done-by-r11 criterion is
# met this round) + the 8 r04-evidence re-pins + 26 of the 41
# r05-evidence re-pins (the 21 queued in r9's ROTATE_NEXT plus 5 pulled
# forward from the r11 queue: q_stream_tumbling for the streaming quota
# — also a bench headliner — then q_join_left/q_join_range/
# q_join_right/q_join_semi in queue order). 8+6+2+8+26 = 50.
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
    # 2. newest-unproven: the 6 round-9 widening queries (r9 ROTATE_NEXT
    # head — zero driver evidence until this window runs)
    "q_syncer_replay",
    "q_export_diff",
    "q_interval_merge",
    "q_skyline_orders",
    "q_ks_drift",
    "q_watch_gap_relist",
    # 2b. rows-only execution slots (see ROWS_ONLY_WINDOW below)
    "q_quantile_bucket_join_approx",
    "q_profile_columns_approx",
    # 3a. oldest-evidence re-pins: the 8 r04-evidence names (r9
    # ROTATE_NEXT re-pin queue head)
    "q_winsorize",
    "q_time_weighted_avg",
    "q_attribution_last_touch",
    "q_tpch_q17_small_quantity",
    "q_tpch_q22_idle_balance",
    "q_tpch_q4_order_priority",
    "q_concurrency_profile",
    "q_histogram_value",
    # 3b. oldest-evidence re-pins: 26 of the 41 r05-evidence names —
    # the 21 from r9's ROTATE_NEXT body plus the 5 pulled forward
    # (q_stream_tumbling promoted for the streaming quota)
    "q_agg_cube",
    "q_agg_grouping_sets",
    "q_agg_having",
    "q_agg_rollup",
    "q_agg_stats",
    "q_audit_constraints",
    "q_bfs_hops",
    "q_bitmap_distinct_rollup",
    "q_bucketed_point_lookup",
    "q_cms_heavy_hitters",
    "q_dedup_normalized",
    "q_filter_array_contains",
    "q_filter_conjunction",
    "q_filter_isin",
    "q_filter_like_suffix",
    "q_filter_not_contains",
    "q_hapax_ratio",
    "q_join_broadcast",
    "q_join_bucketed",
    "q_join_cross",
    "q_join_full",
    "q_join_left",
    "q_join_range",
    "q_join_right",
    "q_join_semi",
    "q_stream_tumbling",
)

# Rows-only queries legally occupying window slots THIS round (cap 2,
# enforced in tests/test_entry.py). The driver records err=no_oracle
# with spark_rows>0 — weaker than a hash row but the only external
# execution evidence the rows-only contract allows (VERDICT r7 #4).
# Executed so far: q_knn_ivf + q_dedup_semantic (r8, 30/10 rows);
# q_knn_lsh + q_dedup_incremental_capped (r9, 30/56 rows). This round
# drains the last two ZERO-execution rows-only names; with it, every
# registered query carries at least one driver row of some kind
# (VERDICT r9 #5, met a round early). Queue for r11+ (2 per round —
# these are re-executions, every name below already has r01 evidence):
# q_sample + q_agg_percentile_approx (r11), q_agg_approx_distinct +
# q_dedup_fuzzy (r12).
ROWS_ONLY_WINDOW: tuple[str, ...] = (
    "q_quantile_bucket_join_approx",
    "q_profile_columns_approx",
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
    # round-10 widening batch FIRST (no driver evidence yet — step-2
    # names for the r11 window): the discovery-expansion diff (the
    # catalog-growth dual of q_rule_change_audit), the write-
    # amplification audit over the data-sized op-log, the informer-
    # cache compaction economics, and the multi-writer conflict audit
    "q_discovery_expansion_diff",
    "q_fanout_amplification",
    "q_oplog_compaction_ratio",
    "q_sync_conflict_audit",
    # r11 re-pin queue head: the 15 remaining r05-evidence names (the
    # r9 comment queue minus the 5 pulled forward into the r10 window;
    # q_key_skew_audit was the one displaced by q_stream_tumbling's
    # streaming-quota promotion). Round-10 widening queries, when
    # registered, are PREPENDED above this block (step-2 names for the
    # r11 window) — the ≤35 cap leaves 4 slots of headroom for them.
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
    # r11 re-pin queue body: the first 16 r06-evidence names in their
    # r06 window order (the remaining 26 r06 names are the r12 queue;
    # every deferred query stays locally parity-proven every run).
    # r11 window math: 8 anchors + 2 rows-only (q_sample +
    # q_agg_percentile_approx per the ROWS_ONLY_WINDOW queue) + up to
    # 4 r10 widening queries + these 31 = 45..49; any remaining slots
    # come from the r12 queue head.
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
