"""Accuracy anchors for the rows-only approx/sketch queries.

Every rows-only sketch query's docstring claims "the exact twin anchors
correctness" — these tests make that claim MACHINE-CHECKED instead of
narrative: each sketch result is held inside its algorithm's published
error envelope around the exact twin's values, on the same fixture the
driver executes. (The driver's rows-only check proves execution only;
these prove the values mean what the docstrings say.)

Envelopes are deliberately generous multiples of the configured error
(HLL rsd, t-digest/GK rank accuracy) — they fence silent substitution
of a broken sketch or a wrong column, not statistical tail events.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kube_etl_spark.catalog import load_table
from kube_etl_spark.registry import all_specs

from .conftest import SMOKE_SF


def _rows(spark, name: str):
    return all_specs()[name].fn(spark, SMOKE_SF).collect()


def test_approx_distinct_within_hll_envelope(spark):
    """q_agg_approx_distinct (HLL++, rsd 0.02) vs exact countDistinct:
    every group's estimate within 4×rsd (+2 absolute slack for tiny
    groups), and the non-sketch column (n_rows) exactly equal."""
    approx = {r["l_returnflag"]: r for r in _rows(spark, "q_agg_approx_distinct")}
    exact = {
        r["l_returnflag"]: r
        for r in load_table(spark, SMOKE_SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        assert a["n_rows"] == e["n_rows"], flag
        tol = max(4 * 0.02 * e["n_parts"], 2)
        assert abs(a["approx_parts"] - e["n_parts"]) <= tol, (
            flag,
            a["approx_parts"],
            e["n_parts"],
        )


def test_percentile_approx_within_rank_envelope(spark):
    """q_agg_percentile_approx (accuracy 10000 ⇒ rank error ~1e-4) vs
    the exact quantile function: each group's approx median must lie
    between the exact 0.49 and 0.51 quantiles — two orders of magnitude
    looser than the sketch's bound, tight enough to catch a wrong
    column or quantile."""
    approx = {
        r["o_orderpriority"]: r["p50_approx"]
        for r in _rows(spark, "q_agg_percentile_approx")
    }
    band = {
        r["o_orderpriority"]: (r["lo"], r["hi"])
        for r in load_table(spark, SMOKE_SF, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.49)).alias("lo"),
            F.percentile("o_totalprice", F.lit(0.51)).alias("hi"),
        )
        .collect()
    }
    assert set(approx) == set(band)
    for prio, p50 in approx.items():
        lo, hi = band[prio]
        assert lo <= p50 <= hi, (prio, p50, lo, hi)


def test_profile_approx_matches_exact_twin(spark):
    """q_profile_columns_approx vs q_profile_columns: the NON-sketch
    statistics (n, n_null, min_num, max_num) must agree EXACTLY — they
    are plain aggregates, not estimates — and the HLL distinct (rsd
    0.05) stays within 4×rsd (+2)."""
    approx = {r["column_name"]: r for r in _rows(spark, "q_profile_columns_approx")}
    exact = {r["column_name"]: r for r in _rows(spark, "q_profile_columns")}
    assert set(approx) == set(exact)
    for col, a in approx.items():
        e = exact[col]
        assert a["n"] == e["n"], col
        assert a["n_null"] == e["n_null"], col
        assert a["min_num"] == e["min_num"], col
        assert a["max_num"] == e["max_num"], col
        tol = max(4 * 0.05 * e["n_distinct"], 2)
        assert abs(a["n_distinct_approx"] - e["n_distinct"]) <= tol, (
            col,
            a["n_distinct_approx"],
            e["n_distinct"],
        )


def test_quantile_bucket_approx_matches_exact_twin(spark):
    """q_quantile_bucket_join_approx vs q_quantile_bucket_join: the two
    bucketings partition the SAME rows, so totals must agree exactly
    (Σn_orders, Σrevenue_cents — boundary rows move between buckets,
    they never vanish), buckets must be 0..9, and each approx bucket's
    population stays within 5% + 3 rows of the exact decile (vastly
    looser than percentile_approx's 1e-4 rank error; catches a broken
    edge list, not sketch noise)."""
    approx = {r["bucket"]: r for r in _rows(spark, "q_quantile_bucket_join_approx")}
    exact = {r["bucket"]: r for r in _rows(spark, "q_quantile_bucket_join")}
    assert set(approx) == set(exact) == set(range(10))
    n_a = sum(r["n_orders"] for r in approx.values())
    n_e = sum(r["n_orders"] for r in exact.values())
    assert n_a == n_e
    assert sum(r["revenue_cents"] for r in approx.values()) == sum(
        r["revenue_cents"] for r in exact.values()
    )
    for b in range(10):
        tol = 0.05 * exact[b]["n_orders"] + 3
        assert abs(approx[b]["n_orders"] - exact[b]["n_orders"]) <= tol, (
            b,
            approx[b]["n_orders"],
            exact[b]["n_orders"],
        )


def test_sample_within_binomial_envelope(spark):
    """q_sample (seeded Bernoulli 10%) vs the population: the sampled
    count stays within 6σ of 0.1·N (binomial σ=√(N·0.1·0.9)) and the
    sampled mean within 10% of the population mean — fences a broken
    fraction or a wrong column, not RNG noise (the seed makes reruns
    identical; the envelope covers partitioning-dependent draws)."""
    import math

    row = _rows(spark, "q_sample")[0]
    pop = (
        load_table(spark, SMOKE_SF, "lineitem")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("l_quantity").alias("avg_qty"))
        .collect()[0]
    )
    expect = 0.1 * pop["n"]
    sigma = math.sqrt(pop["n"] * 0.1 * 0.9)
    assert abs(row["n_sampled"] - expect) <= 6 * sigma, (row["n_sampled"], expect)
    assert abs(row["avg_qty"] - pop["avg_qty"]) <= 0.1 * pop["avg_qty"]
