"""Local replica of the driver's DuckDB-oracle parity check.

Runs a registered query's Spark implementation and its DuckDB oracle on
the same fixture dir, then compares row count, column names, and values
(order-insensitive: columns sorted by name, rows sorted by all columns)
— the same contract described in __spark_entry__'s docstring. Exact
equality is expected because exact.py makes float aggregates
deterministic; a small tolerance fallback reports near-misses distinctly
so determinism bugs are visible before the driver sees them.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from kube_etl_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    # Deliberately NO masking of unhashable cells: the driver's
    # canonicalizer sorts rows by every column as-is and crashes on
    # array/map/struct outputs, so the local replica must crash the
    # same way. Queries must emit scalar columns only (array_join /
    # to_json any nested value).
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def _values_equal(a, b) -> tuple[bool, bool]:
    """Return (exact, close)."""
    if a is None and b is None:
        return True, True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, True
        exact = a == b
        close = exact or math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
        return exact, close
    try:
        if pd.isna(a) and pd.isna(b):
            return True, True
    except (TypeError, ValueError):
        pass
    eq = a == b
    return eq, eq


def compare(spark_df, oracle_df: pd.DataFrame, max_report: int = 5) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    sp = _normalize(spark_df.toPandas())
    oc = _normalize(oracle_df)
    problems: list[str] = []
    if list(sp.columns) != list(oc.columns):
        problems.append(f"columns differ: spark={list(sp.columns)} oracle={list(oc.columns)}")
        return problems
    # dtype parity: a typed value-hash (arrow bytes) would treat
    # int32 vs int64 or ns vs µs timestamps as mismatches, so hold the
    # queries to exact dtype agreement as well
    for c in sp.columns:
        if str(sp[c].dtype) != str(oc[c].dtype):
            problems.append(
                f"dtype differs col {c}: spark={sp[c].dtype} oracle={oc[c].dtype}"
            )
    if problems:
        return problems
    if len(sp) != len(oc):
        problems.append(f"row count differs: spark={len(sp)} oracle={len(oc)}")
        return problems
    n_exact_miss = 0
    n_close_miss = 0
    for col in sp.columns:
        sv, ov = sp[col].tolist(), oc[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            exact, close = _values_equal(a, b)
            if not exact:
                n_exact_miss += 1
                if not close:
                    n_close_miss += 1
                if n_exact_miss <= max_report:
                    kind = "MISMATCH" if not close else "near-miss (nondeterminism!)"
                    problems.append(f"{kind} row {i} col {col}: spark={a!r} oracle={b!r}")
    if n_exact_miss > max_report:
        problems.append(f"... {n_exact_miss} total exact misses ({n_close_miss} beyond tolerance)")
    return problems


def check_query(spark, name: str, sf_dir: str) -> list[str]:
    from kube_etl_spark.registry import all_specs

    spec = all_specs()[name]
    sdf = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        # rows-only: assert it executes and has a stable schema
        n = sdf.count()
        return [] if n >= 0 else [f"{name}: negative count?"]
    con = duckdb_conn(sf_dir)
    try:
        odf = con.execute(spec.oracle).fetchdf()
    finally:
        con.close()
    problems = compare(sdf, odf)
    # Vacuity guard: a 0=0 "match" proves only that the plan compiles
    # (the r02 q_scalar_subquery trap, found again in q_dedup_embedding
    # / q_not_in_subquery / q_join_anti in r03). Every oracle-backed
    # query must verify at least one real row at every fixture SF.
    if not problems and len(odf) == 0:
        problems.append(f"{name}: VACUOUS — 0 rows on both engines at {sf_dir}")
    return problems
