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


class MaterializedAgg:
    """Incrementally-maintained aggregate view: group_col → (n_rows,
    total) over a CDC fact feed, without re-aggregating the fact table.

    Delta maintenance: for each batch, the OLD contribution of the
    batch's keys (from fact state before the merge) and their NEW
    contribution (after) are aggregated per group; the view adds the
    difference. A key moving BETWEEN groups debits its old group and
    credits the new one automatically (its old and new rows aggregate
    under different group values). Totals are exact decimals, so
    credit/debit is associative and replay-safe: re-applying a batch
    finds old ≡ new and produces a zero delta.

    Scale shape: per batch the work is two key-pruned slices of fact
    state + a |groups-touched| merge into the view — the fact table is
    never re-scanned in full."""

    def __init__(
        self,
        fact_state: StateTable,
        view_state: StateTable,
        fact_key: str,
        group_col: str,
        value_col: str,
    ):
        self.fact = fact_state
        self.view = view_state
        self.fact_key = fact_key
        self.group_col = group_col
        self.value_col = value_col

    def _contrib(self, rows: DataFrame | None) -> DataFrame | None:
        if rows is None:
            return None
        return rows.groupBy(self.group_col).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(self.value_col).cast("decimal(20,2)")).alias("s"),
        )

    def apply_fact_batch(self, batch: DataFrame, batch_seq: int) -> None:
        keys = batch.select(self.fact_key).distinct()
        before = self.fact.read()
        old = (
            before.join(keys, self.fact_key, "left_semi") if before is not None else None
        )
        # materialize the old contribution BEFORE the merge: read() goes
        # through the state symlink and merge_batch deletes the prior
        # version dir, so a lazy plan evaluated later would see post-
        # merge data (or dead files). The checkpointed frame is tiny —
        # |groups touched by this batch| rows.
        oc = self._contrib(old)
        if oc is not None:
            oc = oc.localCheckpoint(eager=True)
        self.fact.merge_batch(
            batch.withColumn("seq", F.lit(batch_seq).cast("bigint"))
        )
        after = self.fact.read()
        new = after.join(keys, self.fact_key, "left_semi")

        nc = self._contrib(new)
        if oc is not None:
            oc = oc.withColumnRenamed("n", "n_old").withColumnRenamed("s", "s_old")
            delta = nc.join(oc, self.group_col, "full")
        else:
            delta = nc.withColumn("n_old", F.lit(None)).withColumn("s_old", F.lit(None))
        delta = delta.select(
            self.group_col,
            (F.coalesce("n", F.lit(0)) - F.coalesce("n_old", F.lit(0))).alias("dn"),
            (
                F.coalesce(F.col("s"), F.lit(0).cast("decimal(20,2)"))
                - F.coalesce(F.col("s_old"), F.lit(0).cast("decimal(20,2)"))
            ).alias("ds"),
        ).filter((F.col("dn") != 0) | (F.col("ds") != 0))

        cur = self.view.read()
        if cur is not None:
            cur = cur.select(
                self.group_col,
                F.col("n_rows").alias("cur_n"),
                F.col("total").cast("decimal(20,2)").alias("cur_s"),
            )
            merged = delta.join(cur, self.group_col, "left")
        else:
            merged = delta.withColumn("cur_n", F.lit(None)).withColumn("cur_s", F.lit(None))
        updated = merged.select(
            self.group_col,
            (F.coalesce("cur_n", F.lit(0)) + F.col("dn")).alias("n_rows"),
            (
                F.coalesce(F.col("cur_s"), F.lit(0).cast("decimal(20,2)")) + F.col("ds")
            ).alias("total"),
            F.lit(batch_seq).cast("bigint").alias("seq"),
            # groups whose membership dropped to zero leave the view
            F.when(F.coalesce("cur_n", F.lit(0)) + F.col("dn") <= 0, "delete")
            .otherwise("upsert")
            .alias("op"),
        )
        self.view.merge_batch(updated)

    def read(self) -> DataFrame | None:
        return self.view.read()
