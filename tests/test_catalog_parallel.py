"""Scan-parallelism floor (catalog._read_parquet, optimization r12).

The fixture parquet is written as ONE row group per file, so a scan —
and with it everything below the first exchange — runs as one task no
matter the core count. Callers whose first stage does heavy per-row
work opt in via load_table(..., parallel=True); catalog appends a
round-robin repartition when the atomic split count is below the
session's parallelism and the file clears a size floor. These tests pin
the behaviors the change must keep: (a) opt-in only — the default read
is untouched, (b) the floor fires only above the byte threshold,
(c) the floored read is row-identical to the raw read, (d) the split
probe is metadata-only and cached (no Spark job, one footer read)."""

from __future__ import annotations

import pytest

import kube_etl_spark.catalog as cat

from .conftest import SMOKE_SF


@pytest.fixture
def fresh_caches():
    """Isolate the module-level caches; restore tunables after."""
    saved = (
        dict(cat._SPLITS_CACHE),
        cat._PARALLEL_READ,
        cat._PARALLEL_READ_MIN_BYTES,
    )
    cat._SPLITS_CACHE.clear()
    cat._DF_CACHE.clear()
    yield
    cat._SPLITS_CACHE.clear()
    cat._SPLITS_CACHE.update(saved[0])
    cat._PARALLEL_READ = saved[1]
    cat._PARALLEL_READ_MIN_BYTES = saved[2]
    cat._DF_CACHE.clear()


def test_default_read_is_untouched(spark, fresh_caches):
    cat._PARALLEL_READ_MIN_BYTES = 0
    df = cat.load_table(spark, SMOKE_SF, "lineitem")
    assert df.rdd.getNumPartitions() == 1


def test_floor_fires_for_opted_in_reader(spark, fresh_caches):
    cat._PARALLEL_READ_MIN_BYTES = 0
    df = cat.load_table(spark, SMOKE_SF, "lineitem", parallel=True)
    assert df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_floor_respects_threshold(spark, fresh_caches):
    cat._PARALLEL_READ_MIN_BYTES = 1 << 40  # nothing qualifies
    df = cat.load_table(spark, SMOKE_SF, "lineitem", parallel=True)
    assert df.rdd.getNumPartitions() == 1


def test_kill_switch_disables_floor(spark, fresh_caches):
    cat._PARALLEL_READ = False
    cat._PARALLEL_READ_MIN_BYTES = 0
    df = cat.load_table(spark, SMOKE_SF, "lineitem", parallel=True)
    assert df.rdd.getNumPartitions() == 1


def test_floored_read_is_row_identical(spark, fresh_caches):
    cat._PARALLEL_READ_MIN_BYTES = 0
    base = cat.load_table(spark, SMOKE_SF, "orders")
    par = cat.load_table(spark, SMOKE_SF, "orders", parallel=True)
    assert par.schema == base.schema
    assert sorted(par.collect()) == sorted(base.collect())


def test_keyed_floor_hash_partitions_without_presort(spark, fresh_caches):
    """parallel=<column> must floor via a HASH repartition on that
    column (deterministic without round-robin's partition-local
    pre-sort — the large-table form), stay row-identical to the raw
    read, and cache under its own key so bool and keyed floors of the
    same table do not collide."""
    cat._PARALLEL_READ_MIN_BYTES = 0
    df = cat.load_table(spark, SMOKE_SF, "lineitem", parallel="l_extendedprice")
    assert df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "hashpartitioning(l_extendedprice" in plan
    assert "RoundRobinPartitioning" not in plan
    base = cat.load_table(spark, SMOKE_SF, "lineitem")
    assert df.schema == base.schema
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, base.collect()))
    rr = cat.load_table(spark, SMOKE_SF, "lineitem", parallel=True)
    assert rr is not df  # distinct cache entries per floor form


def test_split_probe_is_cached_metadata(spark, fresh_caches):
    import os

    path = os.path.join(SMOKE_SF, "lineitem.parquet")
    first = cat._atomic_splits(path, 8)
    assert first[0] >= 1 and first[1] == os.path.getsize(path)
    # cached: a second call must not re-read the footer
    cat._SPLITS_CACHE[path] = (999, 999, False)
    assert cat._atomic_splits(path, 8) == (999, 999)
    # an early-exited (lower-bound) entry is reused only while the
    # target stays within the bound; a LARGER target must recompute
    # (ADVICE r12: the bound depends on the first caller's target)
    cat._SPLITS_CACHE[path] = (4, 999, True)
    assert cat._atomic_splits(path, 4) == (4, 999)  # bound covers target
    assert cat._atomic_splits(path, 8) == first  # recomputed for real
