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
# Round-12 window (VERDICT r11 #1): 8 anchors + the 3 round-11 widening
# queries (the ONLY oracle-backed names with zero driver evidence — the
# r11 ROTATE_NEXT head, each locally parity-green and independently
# verified by the r11 judge at sf0.01) + 2 rows-only RE-execution slots
# (the documented queue: q_agg_approx_distinct + q_dedup_fuzzy) + the
# 21 remaining r06-evidence re-pins (r11 ROTATE_NEXT body, r06 window
# order) + the first 16 r07-evidence re-pins in r07 window order
# (q_snapshot_diff … q_stream_stream_join — includes 4 q_stream_*
# names, so the streaming quota holds without promotion).
# 8+3+2+21+16 = 50.
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
    # 2. newest-unproven: the 3 round-11 widening queries (r11
    # ROTATE_NEXT head — zero driver evidence until this window runs)
    "q_relist_delta",
    "q_field_merge_divergence",
    "q_purge_horizon_audit",
    # 2b. rows-only execution slots (see ROWS_ONLY_WINDOW below)
    "q_agg_approx_distinct",
    "q_dedup_fuzzy",
    # 3a. oldest-evidence re-pins: the 21 remaining r06-evidence names
    # (r11 ROTATE_NEXT re-pin queue, r06 window order)
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
    # 3b. oldest-evidence re-pins: the first 16 r07-evidence names in
    # r07 window order (r12 queue head — see ROTATE_NEXT for the rest)
    "q_snapshot_diff",
    "q_profile_incremental",
    "q_dedup_keep_best",
    "q_mixture_rebalance",
    "q_dedup_prefix_cluster",
    "q_dedup_events_window",
    "q_catalog_scan",
    "q_scan_project",
    "q_sink_partitioned",
    "q_split_spec_status",
    "q_rules_fanout",
    "q_join_asof",
    "q_stream_dedup",
    "q_stream_session",
    "q_stream_sliding",
    "q_stream_stream_join",
)

# Rows-only queries legally occupying window slots THIS round (cap 2,
# enforced in tests/test_entry.py). The driver records err=no_oracle
# with spark_rows>0 — weaker than a hash row but the only external
# execution evidence the rows-only contract allows (VERDICT r7 #4).
# Executed so far: q_knn_ivf + q_dedup_semantic (r8, 30/10 rows);
# q_knn_lsh + q_dedup_incremental_capped (r9, 30/56 rows);
# q_quantile_bucket_join_approx + q_profile_columns_approx (r10);
# q_sample + q_agg_percentile_approx (r11). Every slot from r11 on is
# a RE-execution in oldest-execution order. Queue: q_agg_approx_distinct
# + q_dedup_fuzzy (r12, this window), q_knn_ivf + q_dedup_semantic
# (r13), q_knn_lsh + q_dedup_incremental_capped (r14).
ROWS_ONLY_WINDOW: tuple[str, ...] = (
    "q_agg_approx_distinct",
    "q_dedup_fuzzy",
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
    # round-12 widening batch FIRST (no driver evidence yet — step-2
    # names for the r13 window): the ownership audit + the forced-mode
    # churn timeline, the offline twins of the r12 engine work
    # (cdc.owned_field_merge_winners — the SSA managedFields analog,
    # VERDICT r11 #3)
    "q_field_ownership_audit",
    "q_ownership_takeover_timeline",
    # + the landing-zone backlog audit (the dashboard twin of the r12
    # retention valve, kubeapi.prune_committed_landing)
    "q_landing_backlog_audit",
    # r13 re-pin queue: the 26 remaining r07-evidence names in their
    # r07 window order (the 42-name r07 cohort minus the 16 the r12
    # window took). Round-12 widening queries, when registered, are
    # PREPENDED above this block (step-2 names for the r13 window) —
    # the ≤35 cap leaves 9 slots of headroom for them.
    # r13 window math: 8 anchors + 2 rows-only (q_knn_ivf +
    # q_dedup_semantic per the ROWS_ONLY_WINDOW queue) + any r12
    # widening + these 26 = 36+; remaining slots come from the r14
    # queue head (the r07 stragglers below, then r08-evidence names,
    # oldest first).
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash",
    "q_fingerprint",
    "q_multimodal_join",
    "q_text_tf",
    "q_token_count",
    "q_udaf_grouped_map",
    "q_udf_scalar",
    "q_udtf_explode",
    "q_union_all",
    "q_intersect",
    "q_except",
    "q_topk",
    "q_pivot",
    "q_json_funcs",
    "q_from_json_explode",
    "q_to_json",
    "q_window_last_state",
    "q_window_running_sum",
    "q_window_rank",
    "q_window_range_frame",
    "q_window_lag_lead",
    "q_tpch_q5_local_volume",
    "q_join_skew_salted",
    "q_media_frames",
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
