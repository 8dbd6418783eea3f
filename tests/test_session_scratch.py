"""Fast-scratch selection (session._default_local_dir, optimization
r13): Spark's local.dir must land on fast storage by default, honor
SPARK_GRAFT_LOCAL_DIR as an override, and disable cleanly on "".
Pure-function tests — no Spark session."""

from __future__ import annotations

import os

from kube_etl_spark.session import _default_local_dir


def _with_env(value, fn):
    saved = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    try:
        if value is None:
            os.environ.pop("SPARK_GRAFT_LOCAL_DIR", None)
        else:
            os.environ["SPARK_GRAFT_LOCAL_DIR"] = value
        return fn()
    finally:
        if saved is None:
            os.environ.pop("SPARK_GRAFT_LOCAL_DIR", None)
        else:
            os.environ["SPARK_GRAFT_LOCAL_DIR"] = saved


def test_env_override_wins():
    assert _with_env("/mnt/nvme0/scratch", _default_local_dir) == "/mnt/nvme0/scratch"


def test_empty_env_disables():
    assert _with_env("", _default_local_dir) is None


def test_default_is_tmpfs_when_available():
    got = _with_env(None, _default_local_dir)
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        assert got == "/dev/shm/spark-graft-local"
    else:
        assert got is None
