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
# Round-7 window (VERDICT r6 #2: the queue already in ROTATE_NEXT):
# 8 anchors + all 35 r6 ROTATE_NEXT (the 6 round-6 widening queries
# with no driver evidence yet + the 29 r02-evidence re-pins) + 7
# oldest-evidence fills: the 4 r8-deferred window-family names (the
# only r02-or-older evidence left) and 3 of the r03 cohort chosen for
# quotas and VERDICT-named families (q_tpch_q5 for the T quota,
# q_join_skew_salted for the scale story, q_media_frames for the
# multimodal mandate). After this round every oracle-backed query's
# newest driver evidence is r03+ and the unproven backlog is zero
# again (8+35+7 = 50).
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
    # 2. newest-unproven: the 6 round-6 widening queries (r6 ROTATE_NEXT
    # step-2 cohort — zero driver evidence until this window runs)
    "q_snapshot_diff",
    "q_profile_incremental",
    "q_dedup_keep_best",
    "q_mixture_rebalance",
    "q_dedup_prefix_cluster",
    "q_dedup_events_window",
    # 3a. oldest-evidence re-pins: the 29 names whose newest driver
    # evidence is r02 (queued in the r6 ROTATE_NEXT)
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
    # 3b. oldest-evidence fills: the four r02 window-family names the
    # r6 cap deferred, then the r03 quota/mandate picks
    "q_window_running_sum",         # W4
    "q_window_rank",                # W1
    "q_window_range_frame",         # W5
    "q_window_lag_lead",            # W3
    "q_tpch_q5_local_volume",       # TPCH — T-family quota
    "q_join_skew_salted",           # J1/skew — the scale story's join
    "q_media_frames",               # L6 — multimodal mandate
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
    # round-7 widening batch FIRST (no driver evidence yet — step-2
    # names for the r8 window; the cap trims re-pins, never unproven
    # queries)
    "q_schema_drift_report",
    "q_media_neardup",
    "q_media_dedup_exact",
    "q_snapshot_survivorship",
    # r8 re-pin queue: the r03-evidence cohort (newest driver hash row
    # is round 3), minus the three promoted into the r7 window, trimmed
    # to the 35-name cap. The eight remaining TPC-H r03 names
    # (q_tpch_q6/q8/q10/q13/q14/q15/q18/q19) plus the four re-pins the
    # widening batch displaced (q_union_distinct, q_unpivot,
    # q_window_distribution, q_unigram_rarity) are deferred to the r9
    # queue — the T family carries r06 greens via q3 and r07 via q5/q7,
    # and every deferred query stays locally parity-proven every run.
    "q_agg_two_phase",
    "q_bigram_pmi",
    "q_boilerplate_ngrams",
    "q_contamination",
    "q_correlated_scalar",
    "q_dedup_clusters",
    "q_dedup_embedding",
    "q_domain_mixture",
    "q_embedding_quantize",
    "q_exists_subquery",
    "q_funnel_stages",
    "q_gapfill_locf",
    "q_lang_id",
    "q_lateral",
    "q_media_features",
    "q_not_in_subquery",
    "q_pack_sequences",
    "q_pii_scrub",
    "q_quality_filter_pipeline",
    "q_quality_score",
    "q_repetition_ratio",
    "q_rollup_multires",
    "q_sample_stratified",
    "q_shuffle_order",
    "q_split_train_test",
    "q_string_similarity",
    "q_text_chunk",
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
