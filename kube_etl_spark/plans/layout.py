"""Table-layout maintenance — the write-side half of the 100 TB story.

Scan performance at scale is decided before any query runs, by how the
data was written: file sizes (small-file explosions drown the driver in
metadata and the scheduler in tasks) and row-group clustering (parquet
min/max stats can only skip data that was physically clustered). Two
maintenance operations cover it:

  compact(...)    — OPTIMIZE-style bin packing: rewrite a directory of
                    many small files into ~target-size files. Uses a
                    count-based repartition (bytes/row estimated from
                    the source), one shuffle, no data change.
  zorder_write(...) — multi-dimensional clustering: sort by the Morton
                    (bit-interleaved) value of two key columns before
                    writing, so parquet row-group min/max stats prune
                    2-d predicates. A linear sort clusters ONE column
                    perfectly and the other not at all; Z-order gives
                    both columns locality at once — the standard
                    layout for fact tables probed on two keys.

The Morton value is a pure JVM expression (40 shift/and/or terms,
whole-stage-codegen-able) — no UDF.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

BITS = 20  # 2^20 per dimension; enough for fixture key ranges


def morton_value(a: Column, b: Column, bits: int = BITS) -> Column:
    """Interleave the low `bits` bits of two non-negative long columns:
    a's bit i lands at 2i, b's at 2i+1. Monotone locality: nearby
    (a, b) pairs get nearby Morton values.

    CALLER CONTRACT: both inputs must already be normalized to the same
    [0, 2^bits) range. Interleaving RAW keys of different magnitudes is
    the classic Z-order bug — the wider key's high bits dominate every
    top z-bit and the narrow key contributes no clustering at all
    (measured on the fixtures: unnormalized z-order pruned exactly as
    badly as a linear sort). zorder_write does the normalization."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftleft(
            F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        bbit = F.shiftleft(
            F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        z = z.bitwiseOR(abit).bitwiseOR(bbit)
    return z


def zorder_write(
    df: DataFrame,
    out_dir: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 10,
) -> None:
    """Write df clustered by the Morton value of (col_a, col_b):
    each dimension is first scaled to its own observed [min, max] range
    mapped onto `bits` bits (equal weight per dimension — see
    morton_value's contract), then range-partitioned on z so files
    cover disjoint z-ranges and sorted within partitions so row groups
    are tight. One extra 4-value stats lookup + one shuffle, like any
    sort. 2^10 buckets per dimension is plenty: finer granularity than
    the row-group count can't improve skipping."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    if lo_a is None or lo_b is None:
        # empty input (or an all-NULL key column): min/max come back as
        # Python None and norm()'s `hi - lo` would raise an opaque
        # TypeError deep in the job (review r9) — name the problem
        raise ValueError(
            f"zorder_write: input is empty or {col_a!r}/{col_b!r} is "
            "entirely NULL — nothing to cluster"
        )
    top = (1 << bits) - 1

    def norm(c: Column, lo: int, hi: int) -> Column:
        span = max(1, hi - lo)
        return ((c.cast("long") - lo) * top / span).cast("long")

    z = morton_value(
        norm(F.col(col_a), lo_a, hi_a), norm(F.col(col_b), lo_b, hi_b), bits
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def compact(
    spark: SparkSession, in_dir: str, out_dir: str, target_rows: int = 1_000_000
) -> dict:
    """Bin-pack a (possibly small-file-exploded) parquet directory into
    ceil(n/target_rows) files. Row-count-based sizing: at production
    scale pass target_rows derived from target_bytes / avg row width
    (observable from the source footers). Returns before/after file
    counts."""
    # in-place invocation would destroy the source: mode("overwrite")
    # clears out_dir before the job lazily re-reads in_dir. Refuse
    # loudly rather than truncate the table (true in-place compaction
    # needs the version-dir publish of streaming/cdc.atomic_overwrite).
    if os.path.realpath(in_dir) == os.path.realpath(out_dir):
        raise ValueError(
            "compact: in_dir and out_dir must differ (an in-place "
            "overwrite deletes the source before it is re-read)"
        )
    df = spark.read.parquet(in_dir)
    n = df.count()
    n_files = max(1, -(-n // target_rows))
    before = len(
        [f for f in os.listdir(in_dir) if f.endswith(".parquet")]
    )
    # repartition(n_files) without keys = round-robin: even file sizes
    df.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    after = len([f for f in os.listdir(out_dir) if f.endswith(".parquet")])
    return {"rows": n, "files_before": before, "files_after": after}


def files_possibly_matching(
    path: str, predicates: dict[str, tuple[int, int]]
) -> int:
    """Count parquet files whose row-group min/max stats overlap ALL
    [lo, hi] predicates — the files a stats-pruning reader must open.
    Footer-only inspection (pyarrow), no data read: this is the same
    decision a parquet reader/Delta data-skipping layer makes."""
    import pyarrow.parquet as pq

    n = 0
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        overlaps_file = False
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            cols = {
                row_group.column(ci).path_in_schema: row_group.column(ci).statistics
                for ci in range(row_group.num_columns)
            }
            ok = True
            for col, (lo, hi) in predicates.items():
                st = cols.get(col)
                if st is None or st.min is None:
                    continue  # no stats => cannot skip
                if st.max < lo or st.min > hi:
                    ok = False
                    break
            if ok:
                overlaps_file = True
                break
        if overlaps_file:
            n += 1
    return n
