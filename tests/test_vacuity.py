"""DuckDB-only vacuity sweep: every oracle must return rows at EVERY
fixture SF, not just the one the parity suite happens to run at.

The parity suite's vacuity guard (tests/oracle.py) fires only at its
own sf_dir; three of the eight vacuous greens found in rounds 2-3 were
empty at a DIFFERENT SF than the one under test (q_intersect /
q_orderby_multi / q_tpch_q7 at sf0.001, q_except at sf0.1). Running
just the DuckDB side costs seconds per SF — no SparkSession — and the
engines' row counts must match anyway for parity to hold, so a
non-empty oracle is a non-empty query."""

from __future__ import annotations

import pytest

from kube_etl_spark.registry import all_specs

from .oracle import duckdb_conn

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# The sf0.1 sweep is 247 DuckDB queries over the 600k-row fixture
# (~3.5 min, the single slowest non-Spark test) — depth tier; the two
# small SFs keep the vacuity logic in the fast tier.
_MARKS = {
    "/root/testdata/sf0.1": pytest.param(
        "/root/testdata/sf0.1", marks=pytest.mark.slow
    )
}


@pytest.mark.parametrize("sf_dir", [_MARKS.get(sf, sf) for sf in SFS])
def test_no_oracle_is_empty(sf_dir):
    con = duckdb_conn(sf_dir)
    empty, errors = [], []
    try:
        for name, spec in all_specs().items():
            if spec.oracle is None:
                continue
            try:
                n = con.execute(
                    f"SELECT COUNT(*) FROM ({spec.oracle})"
                ).fetchone()[0]
            except Exception as ex:  # noqa: BLE001 - collect, report all
                errors.append((name, str(ex)[:120]))
                continue
            if n == 0:
                empty.append(name)
    finally:
        con.close()
    assert not errors, f"oracle errors at {sf_dir}: {errors}"
    assert not empty, f"vacuous oracles at {sf_dir}: {empty}"
