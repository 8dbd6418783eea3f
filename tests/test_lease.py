"""Writer-lease semantics (streaming/lease.py): the enforced form of
the state layer's single-writer contract — the analytics analog of the
reference syncer's leader election (one active controller per
destination, /root/reference/syncer/main.go manager bootstrap)."""

from __future__ import annotations

import json
import time

import pytest

from kube_etl_spark.streaming.lease import LeaseHeld, LeaseLost, WriterLease


def test_second_writer_blocked_while_lease_live(tmp_path):
    p = str(tmp_path / "state.lease")
    a = WriterLease(p, owner="a", ttl_s=60)
    b = WriterLease(p, owner="b", ttl_s=60)
    assert a.acquire()
    assert not b.acquire()
    with pytest.raises(LeaseHeld):
        b.__enter__()
    a.release()
    assert b.acquire()


def test_stale_takeover_bumps_fencing_token(tmp_path):
    p = str(tmp_path / "state.lease")
    a = WriterLease(p, owner="a", ttl_s=0.05)
    assert a.acquire()
    assert a.token == 1
    time.sleep(0.1)  # let a's lease expire (crashed writer)
    b = WriterLease(p, owner="b", ttl_s=60)
    assert b.acquire()
    assert b.token == 2  # fencing token strictly increases
    # the old writer is fenced off: its held token is stale
    with pytest.raises(LeaseLost):
        a.assert_held()
    with pytest.raises(LeaseLost):
        a.renew()
    # and release() on the fenced writer must NOT delete b's lease
    a.release()
    b.assert_held()


def test_reacquire_after_restart_keeps_token(tmp_path):
    p = str(tmp_path / "state.lease")
    a = WriterLease(p, owner="a", ttl_s=60)
    assert a.acquire()
    a2 = WriterLease(p, owner="a", ttl_s=60)  # same owner, new process
    assert a2.acquire()
    assert a2.token == a.token


def test_renew_extends_deadline(tmp_path):
    p = str(tmp_path / "state.lease")
    a = WriterLease(p, owner="a", ttl_s=60)
    assert a.acquire()
    d0 = json.load(open(p))["deadline"]
    time.sleep(0.02)
    a.renew()
    assert json.load(open(p))["deadline"] > d0


def test_torn_lease_file_treated_as_stale(tmp_path):
    p = str(tmp_path / "state.lease")
    with open(p, "w") as f:
        f.write('{"owner": "a", "tok')  # torn non-atomic write
    b = WriterLease(p, owner="b", ttl_s=60)
    assert b.acquire()
    assert b.token == 1


def test_fenced_writer_cannot_publish_state(spark, tmp_path):
    """End-to-end: a StateTable merge from a writer whose lease was
    taken over must raise LeaseLost BEFORE publishing — the paused-
    writer split-brain the fencing token exists to stop. The new
    owner's merge then proceeds on the intact pre-crash state."""
    from kube_etl_spark.streaming.cdc import StateTable

    lease_path = str(tmp_path / "state.lease")
    old = WriterLease(lease_path, owner="old", ttl_s=60)
    assert old.acquire()
    t_old = StateTable(spark, str(tmp_path / "st"), ["k"], "seq", lease=old)
    t_old.merge_batch(
        spark.createDataFrame(
            [(1, 1, "v1", "upsert")], "k long, seq long, v string, op string"
        )
    )
    # simulate a long writer pause (GC stall / network partition): the
    # lease deadline passes without a renew
    rec = json.load(open(lease_path))
    rec["deadline"] = time.time() - 1
    with open(lease_path, "w") as f:
        json.dump(rec, f)
    new = WriterLease(lease_path, owner="new", ttl_s=60)
    assert new.acquire()
    with pytest.raises(LeaseLost):
        t_old.merge_batch(
            spark.createDataFrame(
                [(1, 2, "stale", "upsert")], "k long, seq long, v string, op string"
            )
        )
    t_new = StateTable(spark, str(tmp_path / "st"), ["k"], "seq", lease=new)
    t_new.merge_batch(
        spark.createDataFrame(
            [(2, 2, "v2", "upsert")], "k long, seq long, v string, op string"
        )
    )
    rows = {(r["k"], r["v"]) for r in t_new.read().collect()}
    assert rows == {(1, "v1"), (2, "v2")}  # stale write never landed


def test_takeover_during_write_abandons_publish(spark, tmp_path):
    """Review r9: fencing must be validated INSIDE atomic_overwrite —
    after the version write, immediately before the pointer rename. A
    check that only precedes the write leaves the whole write duration
    as a window where a paused-then-fenced writer still publishes (and
    its grace GC deletes the new owner's versions). Simulated by
    expiring the lease FROM the validate hook's viewpoint: the publish
    must abandon with the pointer untouched and old state readable."""
    import os

    from kube_etl_spark.streaming.cdc import StateTable, atomic_overwrite

    lease_path = str(tmp_path / "state.lease")
    old = WriterLease(lease_path, owner="old", ttl_s=60)
    assert old.acquire()
    st_path = str(tmp_path / "st")
    t = StateTable(spark, st_path, ["k"], "seq", lease=old)
    t.merge_batch(
        spark.createDataFrame(
            [(1, 1, "v1", "upsert")], "k long, seq long, v string, op string"
        )
    )
    target_before = os.readlink(st_path)

    # the takeover lands WHILE the stale writer's version write runs:
    # model it with a validate hook that performs the takeover first,
    # then delegates to the real lease check (which must now raise)
    def takeover_then_check():
        rec = json.load(open(lease_path))
        rec["deadline"] = time.time() - 1
        with open(lease_path, "w") as f:
            json.dump(rec, f)
        assert WriterLease(lease_path, owner="new", ttl_s=60).acquire()
        old.assert_held()  # must raise LeaseLost

    df = spark.createDataFrame(
        [(1, 2, "stale", "upsert")], "k long, seq long, v string, op string"
    )
    with pytest.raises(LeaseLost):
        atomic_overwrite(df, st_path, validate=takeover_then_check)
    # pointer untouched, pre-takeover state fully readable
    assert os.readlink(st_path) == target_before
    rows = {(r["k"], r["v"]) for r in spark.read.parquet(st_path).collect()}
    assert rows == {(1, "v1")}


def test_release_keeps_fencing_token_monotone(tmp_path):
    """release() must not reset the token universe: a release/re-acquire
    cycle bumps the token past every previously-issued one (consumers
    persist the high-water token; an unlink-based release restarted the
    next owner at 1, regressing it)."""
    from kube_etl_spark.streaming.lease import WriterLease

    path = str(tmp_path / "lease.json")
    a = WriterLease(path, owner="a", ttl_s=60)
    assert a.acquire() and a.token == 1
    a.release()
    b = WriterLease(path, owner="b", ttl_s=60)
    assert b.acquire()
    assert b.token == 2  # strictly above a's released token
    b.release()
    assert a.acquire() and a.token == 3


def test_crashed_mutator_does_not_wedge(tmp_path):
    """A mutator that dies while holding the mutation mutex must not
    block the next mutation: flock is kernel-released on process death
    (the previous mtime orphan-breaker made waiters stall 10 s and
    could race two breakers into the critical section — ADVICE r4)."""
    import subprocess
    import sys as _sys

    path = str(tmp_path / "state.lease")
    lock = path + ".lock"
    # simulate a crash mid-mutation: grab the flock and die holding it
    subprocess.run(
        [
            _sys.executable,
            "-c",
            "import fcntl, os, sys\n"
            f"fd = os.open({lock!r}, os.O_CREAT | os.O_RDWR)\n"
            "fcntl.flock(fd, fcntl.LOCK_EX)\n"
            "os._exit(0)\n",  # no unlock, no close — kernel cleans up
        ],
        check=True,
    )
    t0 = time.time()
    a = WriterLease(path, owner="a", ttl_s=60)
    assert a.acquire()  # immediate — no 10 s orphan wait
    assert time.time() - t0 < 5.0


def test_concurrent_takeover_mints_single_token(tmp_path):
    """The duplicate-fencing-token race the flock mutex closes: many
    writers racing to take over an expired lease must produce exactly
    ONE winner at exactly old_token+1."""
    import threading

    path = str(tmp_path / "state.lease")
    a = WriterLease(path, owner="a", ttl_s=0.01)
    assert a.acquire()
    time.sleep(0.05)  # expire it
    results: list[tuple[str, int]] = []
    lock = threading.Lock()
    start = threading.Barrier(8)

    def contender(i: int) -> None:
        w = WriterLease(path, owner=f"w{i}", ttl_s=60)
        start.wait()
        if w.acquire():
            with lock:
                results.append((w.owner, w.token))

    ts = [threading.Thread(target=contender, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(results) == 1, f"split-brain: {results}"
    assert results[0][1] == 2  # exactly one bump past a's token
