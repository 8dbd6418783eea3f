"""Snapshot differencing — derive a CDC op-log from consecutive FULL
snapshots, for upstreams that only ever hand you complete exports.

The reference's export path is a full, unpaginated List per resource
type (/root/reference/pkg/export/export.go:111-163); a consumer that
polls such exports and wants incremental downstream maintenance must
re-derive the watch stream the upstream never emitted. q_snapshot_diff
(queries/scans.py) is the REPORT form of this comparison; this module
is the PIPELINE form: each new snapshot becomes a minimal op-log batch
(upserts for added/changed keys, deletes for vanished keys, nothing
for unchanged keys) that feeds the same StateTable MERGE every real
CDC source uses — so downstream IVM (MaterializedAgg/MaterializedJoin)
and sinks work identically whether the upstream sends deltas or full
dumps.

Scale shape: one full-outer equi-join per snapshot pair, both sides
hash-partitioned on the key (never broadcastable — both sides are
table-sized); change detection is a map-side null-safe comparison of
the non-key columns; the emitted batch is |changed keys|, not
|snapshot| — the whole point: downstream work is delta-sized even
though the upstream ships full dumps. At 100 TB, snapshots partitioned
by the key family co-locate the join without a shuffle (the
q_join_bucketed path).

Determinism: eqNullSafe on every non-key column — NULL→value,
value→NULL, and NULL→NULL transitions all classify correctly — and
side presence after the full-outer join is detected via injected
non-nullable marker columns, so NULL-valued KEYS also classify
correctly (the join itself matches them via eqNullSafe).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cdc import StateTable


def snapshot_delta(
    old: DataFrame | None, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Minimal op-log turning snapshot `old` into snapshot `new`.

    Returns new's schema + an `op` column: 'upsert' rows carry new's
    values (added or changed keys), 'delete' rows carry the vanished
    key's OLD values (so downstream tombstones keep the last-known
    payload, matching StateTable's delete contract). Unchanged keys
    emit nothing. With old=None (first snapshot) every row upserts."""
    if old is None:
        return new.withColumn("op", F.lit("upsert"))
    val_cols = [c for c in new.columns if c not in key_cols]
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") for c in key_cols],
        *[F.col(c).alias(f"__ov_{c}") for c in val_cols],
        F.lit(1).alias("__o_present"),
    )
    n = new.select(*new.columns, F.lit(1).alias("__n_present"))
    cond = reduce(
        lambda a, b: a & b,
        [n[c].eqNullSafe(F.col(f"__o_{c}")) for c in key_cols],
    )
    j = n.join(o, cond, "full")
    # Side presence is detected with NON-NULLABLE markers, never key
    # nullness (ADVICE r6): the join keys match via eqNullSafe, so a
    # NULL-keyed row present in BOTH snapshots joins — but its key
    # VALUE is NULL on both sides, and the old key-isNull form
    # classified it 'removed' every poll (a spurious delete each cycle,
    # and the row's new value never upserted).
    added = F.col("__o_present").isNull()
    removed = F.col("__n_present").isNull()
    unchanged = reduce(
        lambda a, b: a & b,
        [n[c].eqNullSafe(F.col(f"__ov_{c}")) for c in val_cols],
        ~added & ~removed,
    )
    upserts = j.filter(~removed & ~unchanged).select(
        *[n[c] for c in new.columns], F.lit("upsert").alias("op")
    )
    deletes = j.filter(removed).select(
        *[F.col(f"__o_{c}").alias(c) for c in key_cols],
        *[F.col(f"__ov_{c}").alias(c) for c in val_cols],
        F.lit("delete").alias("op"),
    )
    return upserts.unionByName(deletes)


class SnapshotDiffSource:
    """Poll-based CDC: successive full snapshots in, delta-sized
    StateTable merges out. The state table doubles as the remembered
    previous snapshot, so the caller never stores one — `apply(snap)`
    diffs against current state, merges the delta, and returns it
    (the batch a downstream IVM layer would consume).

    Replay-safe: re-applying the same snapshot produces an EMPTY delta
    (every key compares unchanged against state), so at-least-once
    snapshot delivery converges — the invariant tests pin it."""

    def __init__(self, state: StateTable, seq: int = 0):
        """`seq` restores the monotone merge sequence on restart (e.g.
        the count of already-applied snapshots) — the public seam
        jobs/run_snapshot_sync.py uses, so callers never reach into
        private state (ADVICE r6)."""
        self.state = state
        self._seq = seq

    @property
    def seq(self) -> int:
        """Sequence of the most recently applied snapshot."""
        return self._seq

    def apply(self, snapshot: DataFrame, seq: int | None = None) -> DataFrame:
        self._seq = self._seq + 1 if seq is None else seq
        prev = self.state.read()
        if prev is not None:
            prev = prev.drop("seq")
            # Schema drift between generations fails LOUDLY here, not
            # three operators deep in the state merge: an upstream that
            # added/dropped/renamed/RETYPED columns needs an explicit
            # migration (q_schema_drift_report is the diagnosis tool),
            # because a keyed state table cannot silently widen, narrow,
            # or coerce. Compared on dtypes, not names — a retyped
            # column under the same name is the headline drift case.
            old_t, new_t = dict(prev.dtypes), dict(snapshot.dtypes)
            if old_t != new_t:
                retyped = sorted(
                    c for c in old_t.keys() & new_t.keys() if old_t[c] != new_t[c]
                )
                raise ValueError(
                    "snapshot schema drifted from state: added="
                    f"{sorted(new_t.keys() - old_t.keys())} dropped="
                    f"{sorted(old_t.keys() - new_t.keys())} retyped="
                    f"{[(c, old_t[c], new_t[c]) for c in retyped]}; run a "
                    "schema migration (see q_schema_drift_report) before "
                    "syncing"
                )
        delta = snapshot_delta(prev, snapshot, self.state.key_cols)
        # the delta reads state THROUGH the symlink merge_batch swaps;
        # materialize before mutating (the atomic_overwrite read-path
        # contract — same reason MaterializedAgg checkpoints oc)
        delta = delta.localCheckpoint(eager=True)
        self.state.merge_batch(
            delta.withColumn("seq", F.lit(self._seq).cast("bigint"))
        )
        return delta
