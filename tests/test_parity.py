"""Every registered query must match its DuckDB oracle (driver's t2 gate,
replicated locally). Parametrized over the whole registry: a new module
in kube_etl_spark/queries/ is covered the moment it registers."""

import pytest

from kube_etl_spark.registry import all_specs

from .oracle import check_query


def _ids():
    return sorted(all_specs().keys())


@pytest.mark.parametrize("name", _ids())
def test_parity(spark, sf_dir, name):
    problems = check_query(spark, name, sf_dir)
    assert not problems, f"{name} vs oracle:\n" + "\n".join(problems)
