"""Deterministic float aggregation, identical in Spark and DuckDB.

Problem 1: SUM over doubles is order-dependent; Spark (partial
aggregates per partition) and DuckDB (its own chunking) sum in different
orders → ~1e-9 relative divergence that a value-hash comparison flags.

Problem 2: post-hoc ROUND(double, n) is itself divergent. Spark rounds
the double's exact decimal expansion (BigDecimal HALF_UP); DuckDB rounds
in float arithmetic (x*10^n → nearbyint → /10^n). For expressions whose
true values systematically land on .00005 ties — e.g. money(2dp) ×
rate(2dp) × rate(2dp) has exactly 6 decimals — the engines break ties
differently and sums diverge by ±1e-4 (observed on the flagship's
sum_charge before this fix).

Fix: never round doubles. Cast each *factor* to decimal first — the
fixture doubles are quantized (money: 2dp, rates: 2dp), so their nearest
double is ≫ float-error away from any cast boundary and both engines
recover the identical exact decimal — then multiply/add/SUM entirely in
decimal (exact, associative, order-independent), casting the single
final value to DOUBLE (nearest-double of the same rational → identical
bits in both engines).

Precisions are chosen so DuckDB's width-additive multiply stays ≤ 38:
MONEY(14,2) × RATE(4,2) × RATE(4,2) → width 22, scale 6. Exact.

Scale note: decimal sums keep map-side partial aggregation and
whole-stage codegen; this removes result-nondeterminism across cluster
sizes/partitionings at no plan cost — the right default for 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(14,2)"  # prices, balances (2 decimal places in fixtures)
RATE = "decimal(4,2)"  # discount/tax-like small 2dp factors
QTY = "decimal(14,2)"  # quantities, generic small numerics


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def money(c: Column | str) -> Column:
    return _c(c).cast(MONEY)


def rate(c: Column | str) -> Column:
    return _c(c).cast(RATE)


def qty(c: Column | str) -> Column:
    return _c(c).cast(QTY)


def money_sql(e: str) -> str:
    return f"CAST({e} AS DECIMAL(14,2))"


def rate_sql(e: str) -> str:
    return f"CAST({e} AS DECIMAL(4,2))"


def dsum(dec_col: Column | str) -> Column:
    """Exact decimal SUM of an (already-decimal) expression, as double."""
    return F.sum(_c(dec_col)).cast("double")


def dsum_sql(dec_expr: str) -> str:
    return f"CAST(SUM({dec_expr}) AS DOUBLE)"


def davg(dec_col: Column | str) -> Column:
    """Deterministic AVG: exact decimal sum / non-null count, rounded to 4.

    Both engines divide bit-identical doubles by identical counts; the
    quotient is an unstructured real, so the final ROUND(double,4) tie
    risk is negligible (ties at scale 4 are unrepresentable in binary).
    """
    c = _c(dec_col)
    return F.round(dsum(c) / F.count(c), 4)


def davg_sql(dec_expr: str) -> str:
    return f"ROUND({dsum_sql(dec_expr)} / COUNT({dec_expr}), 4)"


def revenue() -> Column:
    """The TPC-H revenue term l_extendedprice * (1 - l_discount), in
    exact decimal — THE precision-critical recipe; defined once so
    every query (and its oracle twin below) shares identical casts."""
    return money("l_extendedprice") * (F.lit(1).cast("decimal(3,0)") - rate("l_discount"))


REVENUE_SQL = (
    f"{money_sql('l_extendedprice')} * "
    f"(CAST(1 AS DECIMAL(3,0)) - {rate_sql('l_discount')})"
)


def r4(c: Column) -> Column:
    """Round a derived double to 4dp (use only on unstructured reals)."""
    return F.round(c, 4)
