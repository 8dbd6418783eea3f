"""Incrementally-maintained materialized join view (EXT; the
streaming-warehouse feature on top of the CDC machinery in cdc.py).

A denormalized fact⋈dim view (e.g. orders enriched with their
customer row) kept current from BOTH sides' change feeds without ever
re-running the full join:

  * a fact batch touches only its own keys: join the batch against the
    CURRENT dim state, upsert those view rows (fact deletes delete);
  * a dim batch touches the fact rows that reference the changed dim
    keys: semi-select them from fact state, re-join, upsert.

Single applier, one monotonically increasing batch_seq across both
feeds (the reference's one-controller-per-destination model, ST8) —
replaying a batch recomputes identical rows under the same seq, so the
view converges exactly like the CDC MERGE sink.

Scale shape: per batch the work is |batch| ⋈ dim-state (broadcast the
batch side when small) and, for dim changes, a key-pruned slice of
fact state — never the full fact table. State tables are parquet-backed
here; swapping StateTable for a key-partitioned lakehouse table keeps
the same algebra at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cdc import StateTable


class MaterializedJoin:
    """Maintains view = fact ⋈ dim on fact[fact_fk] == dim[dim_key],
    keyed by fact_key. Dim misses produce no view row (inner-join
    semantics); a late-arriving dim row materializes the matching
    facts on its first dim batch."""

    def __init__(
        self,
        fact_state: StateTable,
        dim_state: StateTable,
        view_state: StateTable,
        fact_key: str,
        fact_fk: str,
        dim_key: str,
    ):
        self.fact = fact_state
        self.dim = dim_state
        self.view = view_state
        self.fact_key = fact_key
        self.fact_fk = fact_fk
        self.dim_key = dim_key

    def _join(self, facts: DataFrame, dims: DataFrame) -> DataFrame:
        # both state tables carry their own seq; the view gets a fresh
        # one per batch, so strip them before joining
        f = facts.drop("seq")
        d = dims.drop("seq")
        return f.join(d, f[self.fact_fk] == d[self.dim_key]).drop(self.dim_key)

    def _upsert_view(self, rows: DataFrame, batch_seq: int, op: F.Column) -> None:
        self.view.merge_batch(
            rows.withColumn("seq", F.lit(batch_seq).cast("bigint")).withColumn(
                "op", op
            )
        )

    def apply_fact_batch(self, batch: DataFrame, batch_seq: int) -> None:
        """batch: fact rows + an 'op' column (upsert/delete). Updates
        fact state, then refreshes exactly the batch's view keys."""
        self.fact.merge_batch(
            batch.withColumn("seq", F.lit(batch_seq).cast("bigint"))
        )
        dims = self.dim.read()
        if dims is None:
            # no dim state yet: nothing materialized, nothing to refresh
            return
        upserts = batch.filter(F.col("op") != "delete").drop("op")
        joined = self._join(upserts, dims)
        self._upsert_view(joined, batch_seq, F.lit("upsert"))
        # view keys that must go: explicit fact deletes, plus upserts
        # whose (possibly re-pointed) fk no longer matches any dim row —
        # without this, an fk change to a missing dim would leave the
        # stale enriched row in the view
        deletes = batch.filter(F.col("op") == "delete").select(self.fact_key)
        unmatched = upserts.select(self.fact_key).join(
            joined.select(self.fact_key), self.fact_key, "left_anti"
        )
        doomed_keys = deletes.unionByName(unmatched)
        full = self.view.read()
        if full is not None:
            doomed = full.join(doomed_keys, self.fact_key, "left_semi")
            self._upsert_view(doomed, batch_seq, F.lit("delete"))

    def apply_dim_batch(self, batch: DataFrame, batch_seq: int) -> None:
        """batch: dim rows + 'op'. Updates dim state, then recomputes
        the view rows of every fact row referencing a changed key."""
        self.dim.merge_batch(
            batch.withColumn("seq", F.lit(batch_seq).cast("bigint"))
        )
        facts = self.fact.read()
        if facts is None:
            return
        changed_keys = batch.select(F.col(self.dim_key)).distinct()
        affected = facts.join(
            changed_keys,
            facts[self.fact_fk] == changed_keys[self.dim_key],
            "left_semi",
        )
        dims = self.dim.read()
        rejoined = self._join(affected, dims) if dims is not None else None
        if rejoined is not None:
            self._upsert_view(rejoined, batch_seq, F.lit("upsert"))
        # dim deletes orphan their facts out of the inner-join view
        deleted_dims = batch.filter(F.col("op") == "delete").select(self.dim_key)
        orphans = facts.join(
            deleted_dims, facts[self.fact_fk] == deleted_dims[self.dim_key], "left_semi"
        ).select(self.fact_key)
        full = self.view.read()
        if full is not None:
            doomed = full.join(orphans, self.fact_key, "left_semi")
            self._upsert_view(doomed, batch_seq, F.lit("delete"))

    def read(self) -> DataFrame | None:
        return self.view.read()
