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
    _ensure_loaded()
    return dict(_REGISTRY)


def all_queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_specs().items()}


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}


def bench_specs() -> dict[str, QuerySpec]:
    return {n: s for n, s in all_specs().items() if s.bench}
