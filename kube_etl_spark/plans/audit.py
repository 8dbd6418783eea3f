"""Composed warehouse-audit job — the data-quality battery as one run.

The operator layer exposes each audit as a standalone query
(queries/quality.py, q_drift_psi, q_profile_columns); this plan strings
them into the report a pipeline operator schedules after every load:
row counts, referential integrity over the RAW tables (no injected
orphans here — production data is what it is), Benford first-digit
deviation, value-distribution drift, and null-rate checks, all in one
narrow (check, subject, value) frame a dashboard can diff across runs.

Everything stays an aggregate: each check contributes a frame of at
most a few dozen rows regardless of corpus size, so the unioned report
is driver-trivial at 100 TB while every scan underneath is distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..queries.quality import orphan_check


def _row(check: str, subject: str, value: F.Column) -> list[F.Column]:
    return [
        F.lit(check).alias("check"),
        F.lit(subject).alias("subject"),
        value.cast("double").alias("value"),
    ]


def audit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the full audit as one unioned (check, subject, value)
    DataFrame. Nothing is collected; the caller writes or shows it."""
    frames: list[DataFrame] = []

    # 1. row counts per table
    for t in ("customer", "orders", "lineitem", "part", "supplier",
              "events", "documents", "embeddings"):
        frames.append(
            load_table(spark, sf_dir, t).agg(
                *_row("row_count", t, F.count(F.lit(1)))
            )
        )

    # 2. referential integrity on the raw star (0.0 == intact)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    checks = [
        (li, orders.select("o_orderkey"), "lineitem->orders", "l_orderkey", "o_orderkey", False),
        (li, load_table(spark, sf_dir, "part").select("p_partkey"),
         "lineitem->part", "l_partkey", "p_partkey", True),
        (li, load_table(spark, sf_dir, "supplier").select("s_suppkey"),
         "lineitem->supplier", "l_suppkey", "s_suppkey", True),
        (orders, load_table(spark, sf_dir, "customer").select("c_custkey"),
         "orders->customer", "o_custkey", "c_custkey", True),
    ]
    for fact, dim, fk, fkey, dkey, bcast in checks:
        frames.append(
            orphan_check(fact, dim, fk, fkey, dkey, bcast).select(
                F.lit("fk_orphans").alias("check"),
                F.col("fk").alias("subject"),
                F.col("n_orphans").cast("double").alias("value"),
            )
        )

    # 3. Benford max deviation of o_totalprice first digits (a shape
    # alarm: uniform synthetic feeds score high, organic money low)
    from ..queries.quality import q_benford_digits

    frames.append(
        q_benford_digits(spark, sf_dir).agg(
            *_row(
                "benford_max_deviation",
                "orders.o_totalprice",
                F.max(F.abs(F.col("observed") - F.col("benford"))),
            )
        )
    )

    # 4. distribution drift (PSI) of events.value, first vs second half
    from ..queries.timeseries import q_drift_psi

    frames.append(
        q_drift_psi(spark, sf_dir).agg(
            *_row("drift_psi_max", "events.value", F.max("psi"))
        )
    )

    # 5. null rates on the columns the pipelines key on
    null_checks = [
        ("documents", "text"),
        ("events", "value"),
        ("orders", "o_custkey"),
    ]
    for t, c in null_checks:
        frames.append(
            load_table(spark, sf_dir, t).agg(
                *_row(
                    "null_fraction",
                    f"{t}.{c}",
                    F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    / F.count(F.lit(1)),
                )
            )
        )

    report = frames[0]
    for f in frames[1:]:
        report = report.unionByName(f)
    return report.orderBy("check", "subject")


# Alert thresholds the operators act on (docs/pipelines.md's table,
# executable). Keyed by check name; subjects within a check share the
# threshold. Benford is advisory-only and deliberately absent.
ALERT_THRESHOLDS: dict[str, float] = {
    "fk_orphans": 0.0,       # any orphan = a delete-propagation leak
    "drift_psi_max": 0.25,   # the standard PSI investigate threshold
    "null_fraction": 0.0,    # keyed columns must be fully populated
}


def evaluate_alerts(report: DataFrame) -> DataFrame:
    """Attach the alert verdicts to an audit_report frame: one boolean
    per row (value > its check's threshold; checks without a threshold
    never alert). The caller gates deploys / pages on
    `evaluate_alerts(r).filter('alert').count() == 0`."""
    thr = F.create_map(
        *[F.lit(x) for kv in ALERT_THRESHOLDS.items() for x in kv]
    )
    return report.select(
        "check",
        "subject",
        "value",
        F.when(
            thr.getItem(F.col("check")).isNotNull(),
            F.col("value") > thr.getItem(F.col("check")),
        )
        .otherwise(F.lit(False))
        .alias("alert"),
    )
