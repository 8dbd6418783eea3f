import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE_SF = "/root/testdata/sf0.001"
CORRECTNESS_SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from kube_etl_spark.session import get_spark

    s = get_spark("kube-etl-spark-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    # Parity tests default to the smoke sf for speed; run with
    # SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 before committing a
    # milestone to mirror the driver's correctness gate exactly.
    return os.environ.get("SPARK_GRAFT_TEST_SF", SMOKE_SF)
