"""Crafted-fixture semantics for the round-5 growth/join widening —
edge cases the fixture parity suite can't isolate: nearest-event
tie-breaks, zero-touch attribution, and win-back boundary gaps."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kube_etl_spark.queries.growth import q_attribution_linear  # noqa: F401
from kube_etl_spark.registry import all_specs


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string"
    )


def _with_events(spark, tmp_path, rows):
    """Materialize a tiny events fixture in the sf_dir layout."""
    d = tmp_path / "sf_custom"
    d.mkdir()
    _events_df(spark, rows).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_nearest_event_tie_prefers_before(spark, tmp_path):
    """A click exactly D µs before and another exactly D µs after: the
    earlier (before) click must win; same-instant clicks match at
    dt_us = 0 as 'before'."""
    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: equidistant clicks (±5 s) around the error
        (10, t0 - 5 * s, 1, "click", 1.0, '{"k": 1}'),
        (11, t0 + 5 * s, 1, "click", 1.0, '{"k": 2}'),
        (12, t0, 1, "error", 0.0, "{}"),
        # user 2: only a later click
        (20, t0 + 3 * s, 2, "click", 1.0, '{"k": 3}'),
        (21, t0, 2, "error", 0.0, "{}"),
        # user 3: same-instant click
        (30, t0, 3, "click", 1.0, '{"k": 0}'),
        (31, t0, 3, "error", 0.0, "{}"),
        # user 4: no clicks at all
        (41, t0, 4, "error", 0.0, "{}"),
    ]
    sf = _with_events(spark, tmp_path, rows)
    out = {
        r["event_id"]: r
        for r in all_specs()["q_join_nearest_event"].fn(spark, sf).collect()
    }
    assert out[12]["nearest_click"] == 10 and out[12]["direction"] == "before"
    assert out[12]["dt_us"] == 5_000_000
    assert out[21]["nearest_click"] == 20 and out[21]["direction"] == "after"
    assert out[31]["nearest_click"] == 30 and out[31]["direction"] == "before"
    assert out[31]["dt_us"] == 0
    assert out[41]["nearest_click"] == -1 and out[41]["direction"] == "none"
    assert out[41]["dt_us"] == -1


def test_attribution_linear_splits_exactly(spark, tmp_path):
    """A $3.00 purchase with 3 in-window clicks credits each channel
    exactly 1e8 micro-cents; an out-of-window click gets nothing; a
    touchless purchase credits organic in full."""
    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    day = dt.timedelta(days=1)
    rows = [
        # user 1: three clicks inside the 7-day window (distinct channels
        # via k % 4), one click 8 days out (excluded)
        (1, t0 - 8 * day, 1, "click", 0.0, '{"k": 3}'),
        (2, t0 - 3 * day, 1, "click", 0.0, '{"k": 0}'),
        (3, t0 - 2 * day, 1, "click", 0.0, '{"k": 1}'),
        (4, t0 - 1 * day, 1, "click", 0.0, '{"k": 2}'),
        (5, t0, 1, "purchase", 3.0, "{}"),
        # user 2: no clicks → organic
        (6, t0, 2, "purchase", 2.5, "{}"),
        # user 3: one in-window click with NO parseable k — must be a
        # ch_unknown TOUCH (full credit), never a NULL that both drops
        # from n_touch and double-credits organic (review find)
        (7, t0 - 1 * day, 3, "click", 0.0, "{}"),
        (8, t0, 3, "purchase", 1.0, "{}"),
    ]
    sf = _with_events(spark, tmp_path, rows)
    out = {
        r["channel"]: r
        for r in all_specs()["q_attribution_linear"].fn(spark, sf).collect()
    }
    # 300 cents * 1e6 / 3 touches = 1e8 micro-cents per channel
    for ch in ("ch_0", "ch_1", "ch_2"):
        assert out[ch]["credit_microcents"] == 100_000_000, out[ch]
        assert out[ch]["n_purchases"] == 1
    assert "ch_3" not in out, "8-day-old click must be outside the window"
    assert out["organic"]["credit_microcents"] == 250 * 1_000_000
    assert out["ch_unknown"]["credit_microcents"] == 100 * 1_000_000
    assert out["ch_unknown"]["n_purchases"] == 1
    # conservation: total credited micro-cents == total purchase value
    total = sum(r["credit_microcents"] for r in out.values())
    assert total == (300 + 250 + 100) * 1_000_000, total


def test_purge_horizon_audit_matches_purge_execution(spark, tmp_path):
    """VERDICT r11 #6: the purge-horizon audit's EXECUTION twin — drive
    cdc.StateTable.purge_tombstones with q_purge_horizon_audit's floor
    on REAL state built from the same op lattice, and assert the
    tombstones the state retains ≡ the audit's n_retained per GVK (and
    live rows ≡ n_keys - n_tombstones). The audit is the dashboard; this
    pins that the dashboard predicts exactly what the operator does."""
    from pyspark.sql import functions as F

    from kube_etl_spark.catalog import load_table
    from kube_etl_spark.registry import all_specs
    from kube_etl_spark.streaming.cdc import StateTable

    sf_dir = "/root/testdata/sf0.001"
    audit = {
        (r["group"], r["version"], r["kind"]): r
        for r in all_specs()["q_purge_horizon_audit"].fn(spark, sf_dir).collect()
    }

    # the audit's exact op lattice (filters.py q_purge_horizon_audit):
    # block keys = seq div 37, GVK by block mod 7, delete at seq%11==0
    cat_rows = sorted({(g, v, k) for (g, v, k) in audit})
    from kube_etl_spark.queries.filters import _SYNCER_CATALOG_ROWS

    cat = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(_SYNCER_CATALOG_ROWS)],
        "idx long, group string, version string, kind string",
    )
    block = F.expr("event_id div 37")
    ops = (
        load_table(spark, sf_dir, "events")
        .select("event_id")
        .join(F.broadcast(cat), F.pmod(block, F.lit(7)) == F.col("idx"))
        .select(
            "group", "version", "kind",
            F.when(F.pmod(block, F.lit(3)) == 0, F.lit("prod"))
            .otherwise(F.lit("dev")).alias("namespace"),
            F.concat(F.lit("obj-"), block.cast("string")).alias("name"),
            F.when(F.col("event_id") % 11 == 0, "delete")
            .otherwise("upsert").alias("op"),
            F.col("event_id").alias("seq"),
        )
    )
    floor_seq = ops.agg(F.expr("MAX(seq) * 4 DIV 5").alias("f")).collect()[0]["f"]

    keys = ["group", "version", "kind", "namespace", "name"]
    st = StateTable(spark, str(tmp_path / "state"), keys, "seq")
    st.merge_batch(ops)
    st.purge_tombstones(before_seq=floor_seq)

    raw = st._read_raw()
    got = {
        (r["group"], r["version"], r["kind"]): r
        for r in raw.groupBy("group", "version", "kind")
        .agg(
            F.sum((F.col("__op") == "delete").cast("long")).alias("tombs"),
            F.sum((F.col("__op") != "delete").cast("long")).alias("live"),
        )
        .collect()
    }
    assert set(got) == set(audit) == set(cat_rows)
    for gvk, a in audit.items():
        assert got[gvk]["tombs"] == a["n_retained"], gvk
        assert got[gvk]["live"] == a["n_keys"] - a["n_tombstones"], gvk
    # vacuity guard: the purge actually dropped rows somewhere (at
    # sf0.001 the audit reads 2 purgeable / 1 retained ACROSS GVKs —
    # individual GVKs may legitimately have 0)
    assert sum(a["n_purgeable"] for a in audit.values()) > 0
    assert sum(a["n_retained"] for a in audit.values()) > 0
