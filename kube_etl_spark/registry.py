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
# a curated, all-oracle-backed spread. ROTATION POLICY (ADVICE r2): the
# window is re-curated each round so queries without a driver hash-green
# row in ANY prior CORRECTNESS_r*.json get a slot, while a core of
# family anchors (flagship, reference rule engine, one per §2 family)
# stays pinned every round so regressions in the load-bearing paths
# surface immediately. Queries rotated OUT remain covered by the local
# oracle-parity suite (tests/test_parity.py runs all of them) and keep
# their prior rounds' driver evidence. Rows-only sketches
# (approx/sampling/LSH scale paths) never occupy a window slot.
#
# Round-3 window: 8 pinned anchors (r01∪r02 driver-green) + 28
# oracle-backed queries with no driver row in r01/r02 + 14 queries
# new this round (8+28+14 = 50). With this rotation, every oracle-backed registered
# query has a driver hash row across r01∪r02∪r03. Anchors dropped to
# make room for new queries (q_window_rank, q_topk, q_join_asof,
# q_multimodal_join, q_join_star, q_stream_tumbling, q_tpch_q3) each
# carry r01 AND r02 driver-green rows and their §2 family stays
# covered by another window entry (W: q_window_distribution,
# O: q_union_distinct, J: q_join_skew_salted, T: seven TPC-H slots,
# ST: q_cdc_* + q_rollup_multires, L: ten other L slots).
PRIORITY: tuple[str, ...] = (
    # pinned anchors — one per §2 family, all r01/r02 driver-green
    "q_agg_groupby",        # A1 flagship
    "q_validate_rules",     # P8 — reference rule engine
    "q_array_funcs2",       # F4 — the round-1 hard fail, keep pinned
    "q_scalar_subquery",    # SQ — r02's vacuous slot, now non-vacuous (r3)
    "q_syncer_status",      # S3/P8 status write-back (keeps S covered)
    "q_udf_pandas",         # U2
    "q_cdc_upsert",         # ST6 — reference upsert sink semantics
    "q_cdc_apply_oplog",    # ST7 — reference delete propagation
    # rotated IN: no driver correctness row in r01 or r02
    "q_exists_subquery",
    "q_not_in_subquery",
    "q_correlated_scalar",
    "q_lateral",
    "q_unpivot",
    "q_union_distinct",
    "q_window_distribution",
    "q_join_skew_salted",
    "q_agg_two_phase",
    "q_dedup_clusters",
    "q_string_similarity",
    "q_dedup_embedding",
    "q_lang_id",
    "q_quality_score",
    "q_text_chunk",
    "q_pii_scrub",
    "q_repetition_ratio",
    "q_contamination",
    "q_split_train_test",
    "q_quality_filter_pipeline",
    "q_media_features",
    "q_media_frames",
    "q_rollup_multires",
    "q_tpch_q19_bracket_predicates",
    "q_tpch_q10_returned_items",
    "q_tpch_q18_large_orders",
    "q_tpch_q14_promo_share",
    "q_tpch_q5_local_volume",
    # new this round
    "q_tpch_q6_forecast_revenue",
    "q_tpch_q8_market_share",
    "q_domain_mixture",
    "q_pack_sequences",
    "q_shuffle_order",
    "q_sample_stratified",
    "q_embedding_quantize",
    "q_gapfill_locf",
    "q_funnel_stages",
    "q_unigram_rarity",
    "q_tpch_q13_custdist",
    "q_tpch_q15_top_supplier",
    "q_bigram_pmi",
    "q_boilerplate_ngrams",
)

# Oracle-backed queries registered too late in the round to claim one of
# the 50 driver slots (the window was already fully committed to queries
# with no prior driver evidence). They are locally parity-tested now and
# hold a GUARANTEED slot in the next round's window — the rotation test
# in tests/test_entry.py enforces that nothing stays here across rounds
# once a CORRECTNESS file newer than its registration exists. Mid-round
# drops that freed their slots: q_rules_fanout, q_dedup_exact,
# q_knn_cosine, q_text_stats — each carries BOTH an r01 and an r02
# driver hash-green row, its §2 family keeps window coverage
# (J: q_join_skew_salted; L: ten other slots), and its semantics stay
# pinned by the local oracle-parity suite every run.
ROTATE_NEXT: tuple[str, ...] = (
    "q_retention_cohort",
    "q_histogram_value",
    "q_zscore_outliers",
    "q_bm25_topk",
    "q_hybrid_rrf",
    "q_profile_columns",
    "q_event_transitions",
    "q_user_entropy",
    "q_collapse_runs",
    "q_cusum_changepoint",
    "q_rolling_median",
    "q_anomaly_mad",
    "q_winsorize",
    "q_tpch_q17_small_quantity",
    "q_tpch_q22_idle_balance",
    "q_dedup_containment",
    "q_skipgram_cooccur",
    "q_rfm_segments",
    "q_copurchase_pairs",
    "q_revenue_gini",
    "q_benford_digits",
    "q_fk_orphans",
    # early-r3 rows-only-by-capacity ops, oracles attached late-r3
    "q_concurrency_profile",
    "q_drift_psi",
    "q_ewma_smoothing",
    "q_embedding_cohesion",
    "q_oov_rate",
    "q_session_stats",
    "q_order_gap_stats",
    "q_dup_rate_by_source",
    "q_tpch_q4_order_priority",
    "q_pagerank_copurchase",
    "q_bigram_lm_score",
    "q_dedup_substring",
    "q_dedup_simhash_pairs",
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
