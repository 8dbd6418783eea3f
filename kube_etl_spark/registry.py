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
# Round-9 window (VERDICT r8 #1): 8 anchors + the 2 round-8 widening
# queries (the ONLY oracle-backed names with zero driver evidence) +
# 2 rows-only execution slots (queue: q_knn_lsh +
# q_dedup_incremental_capped this round) + the 4 r03-evidence TPC-H
# names the r8 family-quota fills deferred + 34 of the 42 r04-evidence
# re-pins (the 29 queued in r8's ROTATE_NEXT plus 5 pulled forward from
# the r10 queue: q_scd2_intervals for the streaming quota, then
# q_drift_psi/q_ewma_smoothing/q_rolling_median/q_anomaly_mad in r04
# window order to fill the count). 8+2+2+4+34 = 50.
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
    # 2. newest-unproven: the 2 round-8 widening queries (r8 ROTATE_NEXT
    # head — zero driver evidence until this window runs)
    "q_export_manifest",
    "q_rule_change_audit",
    # 2b. rows-only execution slots (see ROWS_ONLY_WINDOW below)
    "q_knn_lsh",
    "q_dedup_incremental_capped",
    # 3a. oldest-evidence re-pins: the 4 r03-evidence TPC-H names
    "q_tpch_q14_promo_share",
    "q_tpch_q15_top_supplier",
    "q_tpch_q18_large_orders",
    "q_tpch_q19_bracket_predicates",
    # 3b. oldest-evidence re-pins: 34 of the 42 r04-evidence names in
    # their r04 window order (q_scd2_intervals promoted for the
    # streaming quota; drift/ewma/rolling/mad fill the count)
    "q_rfm_segments",
    "q_copurchase_pairs",
    "q_revenue_gini",
    "q_order_gap_stats",
    "q_pagerank_copurchase",
    "q_market_basket",
    "q_decile_lift",
    "q_join_anti",
    "q_null_safe_join",
    "q_bm25_topk",
    "q_hybrid_rrf",
    "q_dedup_containment",
    "q_skipgram_cooccur",
    "q_embedding_cohesion",
    "q_oov_rate",
    "q_dup_rate_by_source",
    "q_bigram_lm_score",
    "q_dedup_substring",
    "q_dedup_simhash_pairs",
    "q_benford_digits",
    "q_fk_orphans",
    "q_profile_columns",
    "q_event_transitions",
    "q_user_entropy",
    "q_collapse_runs",
    "q_cusum_changepoint",
    "q_session_stats",
    "q_retention_cohort",
    "q_zscore_outliers",
    "q_scd2_intervals",
    "q_drift_psi",
    "q_ewma_smoothing",
    "q_rolling_median",
    "q_anomaly_mad",
)

# Rows-only queries legally occupying window slots THIS round (cap 2,
# enforced in tests/test_entry.py). The driver records err=no_oracle
# with spark_rows>0 — weaker than a hash row but the only external
# execution evidence the rows-only contract allows (VERDICT r7 #4).
# Executed so far: q_knn_ivf + q_dedup_semantic (r8, 30/10 rows).
# Queue for r10+ (2 per round until drained):
# q_quantile_bucket_join_approx + q_profile_columns_approx (r10),
# q_sample + the r01-only trio (q_agg_approx_distinct,
# q_agg_percentile_approx, q_dedup_fuzzy) after that.
ROWS_ONLY_WINDOW: tuple[str, ...] = (
    "q_knn_lsh",
    "q_dedup_incremental_capped",
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
    # round-9 widening batch FIRST (no driver evidence yet — step-2
    # names for the r10 window): the syncer replay/backfill audit and
    # the export manifest diff (VERDICT r8 #7), then the session-3
    # widening four (global interval coalescing, the skyline operator,
    # exact two-sample KS drift, the watch-gap/relist audit)
    "q_syncer_replay",
    "q_export_diff",
    "q_interval_merge",
    "q_skyline_orders",
    "q_ks_drift",
    "q_watch_gap_relist",
    # r10 re-pin queue head: the 8 r04-evidence names the r9 window
    # could not fit (oldest evidence in the registry after this
    # window runs)
    "q_winsorize",
    "q_time_weighted_avg",
    "q_attribution_last_touch",
    "q_tpch_q17_small_quantity",
    "q_tpch_q22_idle_balance",
    "q_tpch_q4_order_priority",
    "q_concurrency_profile",
    "q_histogram_value",
    # r10 re-pin queue body: 21 of the 41 r05-evidence names (sorted;
    # the remaining 20 — q_join_left, q_join_range, q_join_right,
    # q_join_semi (displaced by the session-3 widening: the ≤35 cap
    # keeps this list from becoming a parking lot, and re-pins, unlike
    # the unproven head, already carry driver evidence), plus
    # q_key_skew_audit, q_knn_classify,
    # q_mode_per_group, q_ngram_novelty, q_pareto_concentration,
    # q_percent_of_parent, q_recursive_cte, q_rolling_active_users,
    # q_sample_weighted, q_seasonality_index, q_stream_tumbling,
    # q_time_to_convert, q_tpch_q3_shipping_priority, q_triangle_count,
    # q_weighted_median, q_window_running_distinct — are the r11 queue;
    # every deferred query stays locally parity-proven every run).
    # r10 window math: 8 anchors + 2 rows-only (the r10 sketch queue)
    # + these 35 = 45; the remaining 5 slots come from the r11 queue
    # head in the comment above.
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
