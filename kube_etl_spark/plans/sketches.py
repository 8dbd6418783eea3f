"""Mergeable distinct-count sketches (EXT; the pre-aggregation layer a
100 TB deployment runs so "distinct users last N days" never rescans
raw events).

One pass builds a compact HLL sketch per (day, segment) cell — the
Apache DataSketches HllSketch under Spark's `hll_sketch_agg` — and any
later rollup (arbitrary date range, segment union, grand total) merges
the register arrays with `hll_union_agg`: register merge is a
pointwise MAX, so union-of-cell-sketches is EXACTLY the sketch of the
unioned data — estimates agree bit-for-bit with a direct sketch, and
re-aggregation needs only |cells| rows, not the corpus.

The registered query twin lives in queries/aggregates.py
(q_agg_approx_distinct, rows-only by driver contract); this module is
the materialized-layer version with the merge algebra, its exactness
bounds pinned by tests/test_jobs.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_daily_sketches(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """One corpus pass → (day, event_type, user sketch, n_rows). The
    sketch column is a few KB regardless of cell cardinality; lgK=12
    gives ~1.6% standard error. Map-side partial aggregation applies
    (sketch-agg is commutative/associative), so the shuffle carries
    sketches, not user ids."""
    return (
        events.groupBy(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
            "event_type",
        )
        .agg(
            F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("users_hll"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def estimate_distinct(sketches: DataFrame, *group_cols: str) -> DataFrame:
    """Roll the cell sketches up to any coarser grain and estimate
    distinct users there. No raw data touched: input is |cells| rows."""
    gb = sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    out = gb.agg(
        F.hll_sketch_estimate(F.hll_union_agg("users_hll")).alias("distinct_users_est"),
        F.sum("n_rows").alias("n_rows"),
    )
    return out.orderBy(*group_cols) if group_cols else out


def build_daily_value_sketches(events: DataFrame, k: int = 200) -> DataFrame:
    """Quantile counterpart of build_daily_sketches: one corpus pass →
    (day, event_type, KLL sketch of `value`, n_rows). The DataSketches
    KLL sketch is a few KB per cell regardless of cardinality; k=200
    bounds single-sketch rank error at ~1.65% (99% confidence).
    Map-side partial aggregation applies, so the shuffle carries
    sketches, not values."""
    return (
        events.groupBy(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
            "event_type",
        )
        .agg(
            F.kll_sketch_agg_double(F.col("value").cast("double"), F.lit(k)).alias(
                "value_kll"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def estimate_quantiles(
    sketches: DataFrame, probs: list[float], *group_cols: str
) -> DataFrame:
    """Roll the cell sketches up to any coarser grain and read quantile
    estimates there — arbitrary date ranges / type unions without ever
    rescanning raw events (input is |cells| rows). Unlike HLL register
    merge, KLL merge is neither bit-identical to a direct sketch NOR
    deterministic run-to-run (DataSketches KLL compaction is
    randomized, and Spark's partial-merge order varies) — what it DOES
    guarantee, and what tests/test_jobs.py pins, is the rank-error
    bound: every estimate's true rank stays within the k-determined
    envelope of the target. Do not hash or diff rollup outputs. One
    merged sketch per group serves every requested quantile."""
    gb = sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    merged = gb.agg(
        F.kll_merge_agg_double("value_kll").alias("kll"),
        F.sum("n_rows").alias("n_rows"),
    )
    out = merged.select(
        *group_cols,
        "n_rows",
        *[
            # full-precision label: p99_9 / p100 / p00_1 — rounding to
            # an integer percent collides nearby probs (0.999 and 1.0
            # both became p100) into duplicate, ambiguous column names
            F.kll_sketch_get_quantile_double(F.col("kll"), F.lit(p)).alias(
                "p" + f"{p * 100:g}".replace(".", "_").zfill(2)
            )
            for p in probs
        ],
    )
    return out.orderBy(*group_cols) if group_cols else out


def build_type_theta_sketches(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """Theta sketches per event type over user_id. Theta supports the
    SET ALGEBRA HLL cannot: besides union (rollup), INTERSECTION and
    DIFFERENCE — so "users who did A and B" / "A but never B" come from
    the |types| sketch rows, never a corpus self-join. At 100 TB this
    is the difference between an audience-overlap matrix in
    milliseconds and |types|² semi-joins over raw events."""
    return events.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id", F.lit(lg_k)).alias("users_theta"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def estimate_overlap(sketches: DataFrame) -> DataFrame:
    """All-pairs audience overlap from the per-type theta sketches:
    for each (type_a < type_b) pair, estimated |A|, |B|, |A ∩ B| and
    |A \\ B|. Input and output are |types|-sized — the raw corpus is
    never touched."""
    a = sketches.select(
        F.col("event_type").alias("type_a"),
        F.col("users_theta").alias("ta"),
    )
    b = sketches.select(
        F.col("event_type").alias("type_b"),
        F.col("users_theta").alias("tb"),
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    return pairs.select(
        "type_a",
        "type_b",
        F.theta_sketch_estimate(F.col("ta")).alias("n_a"),
        F.theta_sketch_estimate(F.col("tb")).alias("n_b"),
        F.theta_sketch_estimate(F.theta_intersection(F.col("ta"), F.col("tb"))).alias(
            "n_both"
        ),
        F.theta_sketch_estimate(F.theta_difference(F.col("ta"), F.col("tb"))).alias(
            "n_only_a"
        ),
    ).orderBy("type_a", "type_b")


# ---------------------------------------------------------------------------
# Count-Min sketch — DataFrame-native, cross-engine deterministic.
#
# Unlike the DataSketches HLL/KLL/theta aggregates above (opaque binary
# registers merged by dedicated functions), CMS is a LINEAR sketch: the
# state is a d×w integer matrix and merge is cell-wise addition — plain
# groupBy arithmetic, no binary payloads. That buys three things the
# other sketches can't offer here: (a) turnstile updates (weighted /
# negative increments compose), (b) trivially exact mergeability
# (pinned by test: sum of per-day matrices ≡ whole-corpus matrix), and
# (c) full cross-engine determinism — the row hashes are explicit
# integer polynomials, so a DuckDB oracle can rebuild the identical
# matrix and the driver hash gate covers an approximate structure
# end-to-end (the HLL/KLL layers are pinned by error-bound tests only).
#
# Estimate guarantee (Cormode–Muthukrishnan): n̂ ≥ n, and
# P[n̂ > n + εN] ≤ δ with w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. d=4, w=512 →
# ε ≈ 0.5% of stream length at δ ≈ 2%.
# ---------------------------------------------------------------------------

CMS_P = 2_147_483_647  # 2³¹−1 (Mersenne prime)
CMS_W = 512
# (row, a, b): fixed odd multipliers — any pairwise-distinct constants
CMS_PARAMS: tuple[tuple[int, int, int], ...] = (
    (0, 1_103_515_245, 12_345),
    (1, 1_140_671_485, 12_820_163),
    (2, 214_013, 2_531_011),
    (3, 69_069, 362_437),
)


def _cms_bucket(key: Column, a: int, b: int, w: int = CMS_W) -> Column:
    # (a·(key mod P) + b) mod P mod w — key mod P ≤ 2³¹ and a < 2³¹
    # keep the product under 2⁶² (no int64 overflow on either engine)
    return ((F.lit(a) * (key % CMS_P) + F.lit(b)) % CMS_P) % w


def cms_bucket_sql(key_expr: str, a: int, b: int, w: int = CMS_W) -> str:
    """The DuckDB twin of _cms_bucket — identical integer algebra."""
    return f"(({a} * ({key_expr} % {CMS_P}) + {b}) % {CMS_P}) % {w}"


def cms_cells(df: DataFrame, key_col: str, w: int = CMS_W) -> DataFrame:
    """Build the d×w count matrix over one scan: each row explodes to
    its d (row, bucket) coordinates and the matrix is a map-side-
    combinable aggregate — the shuffle carries ≤ d·w rows regardless
    of input size. Returns (i, bucket, n)."""
    coords = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                _cms_bucket(F.col(key_col), a, b, w).alias("bucket"),
            )
            for i, a, b in CMS_PARAMS
        ]
    )
    return (
        df.select(F.explode(coords).alias("c"))
        .groupBy(F.col("c.i").alias("i"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_merge(*cell_frames: DataFrame) -> DataFrame:
    """Union-merge CMS matrices: cell-wise addition (linearity)."""
    out = cell_frames[0]
    for f in cell_frames[1:]:
        out = out.unionByName(f)
    return out.groupBy("i", "bucket").agg(F.sum("n").alias("n"))


def cms_estimate(cells: DataFrame, keys: DataFrame, key_col: str, w: int = CMS_W) -> DataFrame:
    """Point estimates for a key frame: n̂(k) = min over rows of the
    key's cell. The key frame broadcasts (callers pass candidate sets,
    not the corpus); returns (key_col, n_est)."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cms_bucket(F.col(key_col), a, b, w).alias("bucket"),
                    )
                    for i, a, b in CMS_PARAMS
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.i").alias("i"), F.col("c.bucket").alias("bucket"))
    return (
        cells.join(F.broadcast(probes), ["i", "bucket"])
        .groupBy(key_col)
        .agg(F.min("n").alias("n_est"))
    )


# ---------------------------------------------------------------------------
# Bitmap layer — EXACT mergeable distinct counts (the non-approximate
# counterpart of the HLL layer above). Spark's bitmap aggregates split
# the key space into 32k-bit buckets (bitmap_bucket_number /
# bitmap_bit_position); a (grain..., bucket) cell stores one bitmap,
# coarser rollups OR the bitmaps PER BUCKET (bit positions collide
# across buckets — the bucket column must survive every merge), and
# the final count is Σ bitmap_count over the group's buckets. Union of
# cells is EXACTLY the bitmap of the unioned data — no estimate, no
# error bound; the trade vs HLL is size: bitmaps grow with the live
# key range (≤ 4 KB per 32k-key bucket) instead of fixed registers.
# The right tool when keys are dense integers (user ids) and the
# answer must be exact (billing, compliance).
# ---------------------------------------------------------------------------


def build_daily_user_bitmaps(events: DataFrame) -> DataFrame:
    """One corpus pass → (day, event_type, bucket, users_bm): exact
    per-cell user bitmaps. Map-side partial aggregation applies
    (bitmap_construct_agg is commutative/associative), so the shuffle
    carries bitmaps, not user ids."""
    return (
        events.select(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
            "event_type",
            F.bitmap_bucket_number("user_id").alias("bucket"),
            F.bitmap_bit_position("user_id").alias("pos"),
        )
        .groupBy("day", "event_type", "bucket")
        .agg(F.bitmap_construct_agg("pos").alias("users_bm"))
    )


def exact_distinct(bitmaps: DataFrame, *group_cols: str) -> DataFrame:
    """Roll bitmap cells up to any coarser grain: OR per (group,
    bucket), then Σ bitmap_count across the group's buckets — an EXACT
    distinct count from |cells| rows, the corpus never rescanned."""
    per_bucket = bitmaps.groupBy(*group_cols, "bucket").agg(
        F.bitmap_or_agg("users_bm").alias("bm")
    )
    gb = per_bucket.groupBy(*group_cols) if group_cols else per_bucket.groupBy()
    out = gb.agg(
        F.sum(F.bitmap_count("bm")).cast("bigint").alias("distinct_users")
    )
    return out.orderBy(*group_cols) if group_cols else out
