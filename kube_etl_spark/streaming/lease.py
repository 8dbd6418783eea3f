"""Single-writer lease with fencing tokens — the operational guard for
the state layer's one-writer-per-table contract.

The reference's syncer runs as a manager process with leader election
(a Kubernetes Lease object guarantees one active controller per
destination; /root/reference/syncer/main.go manager bootstrap). This
engine's StateTable/BucketedStateTable declare the same single-writer
model but, until this module, trusted the operator to enforce it. A
``WriterLease`` makes it enforced: a would-be writer must hold the
lease before merging, a crashed writer's lease expires and can be taken
over, and the FENCING TOKEN (monotonically increasing across
takeovers) ensures a paused-then-resumed old writer cannot publish over
the new owner's state — it re-validates ownership immediately before
every publish and finds a newer token.

Implementation is a JSON lease file beside the state dir, updated with
the same atomic-rename publish discipline as cdc.atomic_overwrite —
the single-host filesystem analog of the k8s Lease object (on an
object store this role is played by a conditional-put on the lease
key; the acquire/renew/fence protocol is identical). Takeover races
are resolved by re-reading after the rename: the rename that lands
last wins, and every competitor verifies rather than assumes.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class LeaseHeld(Exception):
    """The lease is currently held by another live owner."""


class LeaseLost(Exception):
    """This owner no longer holds the lease (expired or fenced off)."""


class WriterLease:
    def __init__(self, path: str, owner: str | None = None, ttl_s: float = 60.0):
        self.path = path
        self.owner = owner or f"writer-{uuid.uuid4().hex[:12]}"
        self.ttl_s = float(ttl_s)
        self.token: int | None = None  # fencing token while held

    # -- internals ---------------------------------------------------------
    def _read(self) -> dict | None:
        try:
            with open(self.path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None
        except json.JSONDecodeError:
            # torn write from a non-atomic writer: treat as expired
            return {"owner": "?", "token": 0, "deadline": 0.0}

    def _publish(self, rec: dict) -> None:
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.rename(tmp, self.path)  # atomic on POSIX

    # -- protocol ----------------------------------------------------------
    def acquire(self) -> bool:
        """Try to take the lease. Returns True (and sets the fencing
        token) on success; False while another owner's lease is live.
        A stale lease (deadline passed) is taken over with a BUMPED
        token; the takeover is verified by re-read, so a lost race
        reports False rather than split-brain success."""
        now = time.time()
        cur = self._read()
        if cur is None:
            rec = {
                "owner": self.owner,
                "token": 1,
                "deadline": now + self.ttl_s,
            }
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return False  # lost the creation race; caller may retry
            with os.fdopen(fd, "w") as f:
                json.dump(rec, f)
            self.token = 1
            return True
        if cur["owner"] == self.owner and cur["deadline"] > now:
            self.token = int(cur["token"])
            return True  # already ours (re-acquire after restart)
        if cur["deadline"] > now:
            return False  # live foreign lease
        # stale: take over with a higher fencing token, then VERIFY
        rec = {
            "owner": self.owner,
            "token": int(cur["token"]) + 1,
            "deadline": now + self.ttl_s,
        }
        self._publish(rec)
        after = self._read()
        if after and after["owner"] == self.owner and after["token"] == rec["token"]:
            self.token = rec["token"]
            return True
        return False  # a competing takeover landed after ours

    def renew(self) -> None:
        """Extend the deadline; raises LeaseLost if fenced off."""
        self.assert_held()
        self._publish(
            {
                "owner": self.owner,
                "token": self.token,
                "deadline": time.time() + self.ttl_s,
            }
        )

    def assert_held(self) -> None:
        """Raise LeaseLost unless this owner still holds the CURRENT
        token. Called by guarded writers immediately before publishing
        state — the fencing check that stops a paused old writer."""
        cur = self._read()
        if (
            cur is None
            or cur["owner"] != self.owner
            or int(cur["token"]) != self.token
            or cur["deadline"] <= time.time()
        ):
            raise LeaseLost(
                f"{self.owner} no longer holds {self.path} "
                f"(current: {cur and cur.get('owner')!r} "
                f"token {cur and cur.get('token')})"
            )

    def release(self) -> None:
        """Drop the lease if (and only if) still ours."""
        try:
            self.assert_held()
        except LeaseLost:
            return
        os.unlink(self.path)
        self.token = None

    def __enter__(self) -> "WriterLease":
        if not self.acquire():
            raise LeaseHeld(f"{self.path} is held by another writer")
        return self

    def __exit__(self, *exc) -> None:
        self.release()
