"""Driver-contract smoke: entry() runs, queries()/oracle_sql() agree."""


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns and "count_order" in df.columns


def test_contract_shape(spark):
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_correctness_window_is_curated():
    """The driver hash-checks only the FIRST 50 queries() entries
    (CORRECTNESS_r01.json proved it). Pin the invariants: the window is
    exactly the PRIORITY list, every entry is oracle-backed, every
    SURVEY §2 family has at least one slot, and the window ROTATES: any
    oracle-backed query with no driver hash row in any prior
    CORRECTNESS_r*.json must hold a slot this round (ADVICE r2 — no
    query stays permanently driver-unchecked)."""
    import glob
    import json
    import os

    from kube_etl_spark.registry import PRIORITY, ROWS_ONLY_WINDOW, all_specs

    specs = all_specs()
    first50 = list(specs)[:50]
    assert first50 == list(PRIORITY[:50])
    # VERDICT r7 #4: up to TWO declared rows-only slots per round so the
    # driver logs spark_rows (err=no_oracle) for queries that can never
    # earn a hash row; everything else in the window must be hash-checked.
    assert len(ROWS_ONLY_WINDOW) <= 2
    assert set(ROWS_ONLY_WINDOW) <= set(first50)
    assert all(specs[n].oracle is None for n in ROWS_ONLY_WINDOW)
    assert all(
        specs[n].oracle is not None
        for n in first50
        if n not in set(ROWS_ONLY_WINDOW)
    )
    families = {t[0] for n in first50 for t in specs[n].tags if t and t[0].isupper()}
    assert {"A", "P", "F", "J", "W", "O", "S", "U", "L", "T"} <= families
    st = [
        n
        for n in first50
        if n.startswith(("q_stream", "q_cdc", "q_rollup", "q_scd2"))
    ]
    assert len(st) >= 3, f"streaming underrepresented in window: {st}"

    # rotation: nothing oracle-backed may remain permanently unchecked
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(p) as f:
            seen |= set(json.load(f))
    # ROTATE_NEXT is the only legal exemption: queries registered after
    # the window filled, guaranteed a slot next round. It must stay
    # small (less than an anchor's worth of slack) so it cannot become
    # a parking lot for permanently-unchecked queries.
    from kube_etl_spark.registry import ROTATE_NEXT

    # cap: next round's window frees ~42 slots (8 pinned anchors; after
    # r03 only ROTATE_NEXT lacks driver evidence), so a parking-lot
    # guard under that margin still absorbs everything in one rotation
    assert len(ROTATE_NEXT) <= 35
    assert all(specs[n].oracle is not None for n in ROTATE_NEXT)
    never = [
        n for n, s in specs.items()
        if s.oracle is not None
        and n not in seen
        and n not in set(first50)
        and n not in set(ROTATE_NEXT)
    ]
    assert not never, f"oracle-backed queries never driver-checked and not in window: {never}"


def test_priority_degrades_gracefully(monkeypatch):
    """A renamed/failed-to-import PRIORITY name must WARN and drop, not
    raise (ADVICE r2: one bad name used to hard-fail every entrypoint —
    bench, export, tests)."""
    import warnings

    from kube_etl_spark import registry

    bad = (*registry.PRIORITY[:5], "q_definitely_not_registered")
    monkeypatch.setattr(registry, "PRIORITY", bad)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        specs = registry.all_specs()
    assert any("q_definitely_not_registered" in str(w.message) for w in caught)
    assert "q_definitely_not_registered" not in specs
    assert list(specs)[:5] == list(bad[:5])  # survivors keep window order
    assert len(specs) == len(registry._REGISTRY)


def test_operator_catalog_in_sync():
    """docs/operators.md must match the registry exactly — the catalog
    is generated (`make catalog`), and a stale committed copy would
    advertise operators that don't exist (or hide ones that do)."""
    from kube_etl_spark.catalog_doc import _DOC, render

    with open(_DOC) as f:
        assert f.read() == render(), "docs/operators.md is stale — run `make catalog`"


def test_bench_query_baselines_cover_headliners():
    """Every post-r1 headliner must carry a first-measured baseline in
    bench.py's _QUERY_BASELINE (else its vs_baseline_queries ratio
    silently vanishes and a regression hides), and every baseline key
    must still BE a registered headliner (else the row is stale)."""
    import bench

    from kube_etl_spark.registry import bench_specs

    headliners = set(bench_specs())
    r01_covered = {
        "q_agg_groupby", "q_dedup_exact", "q_join_inner", "q_join_star",
        "q_knn_cosine", "q_stream_tumbling", "q_text_stats",
        "q_window_topk_group", "q_tpch_q3_shipping_priority",
    }
    baselined = set(bench._QUERY_BASELINE)
    missing = headliners - r01_covered - baselined
    assert not missing, f"headliners with no first-measured baseline: {missing}"
    stale = baselined - headliners
    assert not stale, f"baseline rows for non-headliners: {stale}"


def test_bench_final_line_fits_driver_tail():
    """The driver records only the LAST 2,000 chars of bench stdout and
    json.loads the final line; BENCH_r06 went `parsed: null` because
    the payload line outgrew that capture (VERDICT r6 #1). Pin the
    compact contract line — built with the REAL headliner set and
    worst-case-width values — under bench._FINAL_LINE_MAX so adding a
    headliner (or a baseline row) re-breaks this test, not the gate."""
    import bench

    from kube_etl_spark.registry import bench_specs

    names = sorted(bench_specs())
    # worst realistic widths: 4dp timings in the hundreds of seconds,
    # 3dp ratios ≥ 10×
    timings = {n: 123.4567 for n in names}
    ratios = {n: 12.345 for n in bench._QUERY_BASELINE}
    line = bench.compact_payload(9999.9999, timings, 0.1, ratios)
    assert len(line) <= bench._FINAL_LINE_MAX, (
        f"compact contract line is {len(line)} chars; driver tail capture "
        f"is 2,000 — trim keys or shrink the headliner set"
    )
    # and it must still BE the contract: the five required keys present
    import json as _json

    parsed = _json.loads(line)
    assert {"metric", "value", "unit", "queries", "sf"} <= set(parsed)
