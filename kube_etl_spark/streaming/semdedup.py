"""Continuous semantic (embedding) near-dup detection — the vector
twin of streaming/neardup.py: documents have MinHash, embeddings have
cosine-over-IVF-cells (queries/llm.py q_dedup_semantic is the one-shot
batch form, q_dedup_embedding its exactness anchor).

New vectors are assigned to their top-2 cells against a FROZEN centroid
set (the append_to_index judgment from plans/retrieval_index.py:
centroids come from the initial build and drift is handled by periodic
re-train, not per-batch re-clustering — per-batch k-means would make
detection order-dependent and unreplayable), probed against the
accumulated same-cell members, exact-cosine-verified at the anchor's
threshold, and surviving pairs MERGE into keyed state.

Scale shape per micro-batch: assign = batch × k×dim broadcast distance
scan; probe = equi-join on centroid_id against only the touched cells'
members; verify = candidate-pair-sized dot products. The member state
grows with the corpus (the index IS the memory); per-batch work is
batch-sized plus the touched cells.

At corpus sizes where the flat member scan is the batch cost, the
bucket-pruned layout EXECUTED in the band-index siblings
(streaming/neardup.py / simdup.py, measured in docs/architecture.md
§round-8) applies here too — ``cell_buckets=True`` — with one
structural difference: the probe key is centroid_id, so members
bucket BY CELL (BucketedStateTable.read(buckets=touched cells)) — the
file-state analog of plans/retrieval_index.py's
partitionBy(centroid_id) disk pruning — while changed-detection runs
against a second, vec_id-keyed ``vectors`` table (optionally
vec_id-bucketed via ``bucket_col``), because the cell-bucketed layout
cannot be point-read by id. Cleanup/delete member rows are re-derived
by re-assigning the STORED vector against the frozen centroids (the
frozen-centroid invariant makes the re-derivation exact), so each
tombstone carries the old centroid_id and routes to the dir holding
the old row; members cleanup merges BEFORE the vectors upsert, so a
crash between them replays into a still-detectable changed state —
the same discipline as the siblings.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.llm import _dot, assign_cells
from .cdc import StateTable, changed_ids, retract_pairs

COS_THRESHOLD = 0.8  # q_dedup_embedding's anchor threshold


class SemanticDedupIndex:
    """Incrementally-maintained cosine near-dup index over embeddings.

    State under ``base_dir``:
      * ``members`` — (vec_id, v, centroid_id): every ingested vector in
        its top-2 cells (the nprobe=2 fan-out both sides of the batch
        candidate join rely on — same dial as q_knn_ivf);
      * ``pairs``   — (vec_a, vec_b, cos): detected pairs, vec_a < vec_b,
        exact cosine ≥ COS_THRESHOLD.

    ``centroids`` is the frozen (centroid_id, cv) frame the index was
    opened with; reopening with different centroids is a re-train and
    warrants a rebuild (append ≡ rebuild only under fixed centroids).
    """

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        centroids: DataFrame,
        cell_buckets: bool = False,
        bucket_col: F.Column | None = None,
        n_buckets: int = 16,
    ):
        """cell_buckets=True switches to the scale layout (see module
        docstring): members bucketed BY centroid_id (probe reads only
        the batch's touched cells) plus a vec_id-keyed ``vectors``
        table for changed-detection and cleanup derivation, itself
        bucketed when ``bucket_col`` (a bigint expression over vec_id)
        is given. The flat layout keeps the original two-table state —
        existing state dirs stay readable."""
        from .cdc import BucketedStateTable

        self.spark = spark
        self.centroids = centroids.select("centroid_id", "cv").localCheckpoint(
            eager=True
        )
        self.cell_buckets = cell_buckets
        self._vec_pruned = bucket_col is not None
        if cell_buckets:
            self.members = BucketedStateTable(
                spark,
                os.path.join(base_dir, "members"),
                ["vec_id", "centroid_id"],
                "seq",
                n_buckets=self.centroids.count(),
                bucket_col=F.col("centroid_id").cast("bigint"),
            )
            if bucket_col is not None:
                self.vectors = BucketedStateTable(
                    spark,
                    os.path.join(base_dir, "vectors"),
                    ["vec_id"],
                    "seq",
                    n_buckets=n_buckets,
                    bucket_col=bucket_col,
                )
            else:
                self.vectors = StateTable(
                    spark, os.path.join(base_dir, "vectors"), ["vec_id"], "seq"
                )
        else:
            self.members = StateTable(
                spark,
                os.path.join(base_dir, "members"),
                ["vec_id", "centroid_id"],
                "seq",
            )
            self.vectors = None
        self.pairs = StateTable(
            spark, os.path.join(base_dir, "pairs"), ["vec_a", "vec_b"], "seq"
        )

    def _assign(self, vecs: DataFrame) -> DataFrame:
        """(vec_id, v) → top-2 cells per vector against the frozen
        centroids — queries/llm.assign_cells (the one shared IVF
        routing rule) on the L2-normalized column; the norm is hoisted
        into its own column first (an inline norm in the transform
        lambda re-evaluates the dot product per element)."""
        nrm = F.sqrt(_dot(F.col("v"), F.col("v")))
        vn = vecs.withColumn("n", nrm).withColumn(
            "vn", F.transform(F.col("v"), lambda x: x / F.col("n"))
        )
        return assign_cells(vn, self.centroids, n=2, vec_col="vn").select(
            "vec_id", "v", "centroid_id"
        )

    def ingest_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Assign, index, and near-dup-check one micro-batch of
        (vec_id, v) rows. Idempotent under replay (seq-keyed merges,
        same pairs re-upserted).

        Re-ingesting a vec_id with a CHANGED vector first RETRACTS the
        pairs its old embedding produced AND deletes ALL its old member
        cells — members is keyed (vec_id, centroid_id), so upserting
        only the new top-2 cells would leave the OLD embedding live in
        its old cells, where later vectors could mint pairs against a
        retracted embedding at winning seqs (review r7, second pass).

        Seq phases (seq = 4·batch_id + phase): 0 = retractions/cleanup,
        1 = upserts, 2 = compliance deletion (delete_vecs) — a changed
        vector that still pairs with the same partner beats its own
        retraction, and a same-batch-id compliance delete beats the
        ingest's upserts (the delete-wins contract)."""
        seq_rm = F.lit(4 * int(batch_id)).cast("bigint")
        seq = F.lit(4 * int(batch_id) + 1).cast("bigint")
        vecs = batch.select("vec_id", "v").localCheckpoint(eager=True)
        assigned = self._assign(vecs).localCheckpoint(eager=True)
        if not assigned.head(1):
            return
        if self.cell_buckets:
            # changed-detection against the vec_id-keyed vectors table,
            # pruned to the batch's ids when it is bucketed
            stored = (
                self.vectors.read(
                    buckets=self.vectors.buckets_for(vecs.select("vec_id"))
                )
                if self._vec_pruned
                else self.vectors.read()
            )
            changed = changed_ids(vecs, stored, "vec_id", "v")
        else:
            stored = None
            changed = changed_ids(assigned, self.members.read(), "vec_id", "v")
        if changed is not None:
            retract_pairs(
                self.pairs, changed, "vec_a", "vec_b", "cos",
                4 * int(batch_id),
            )
            if self.cell_buckets:
                # old member rows re-derived by re-assigning the STORED
                # vector against the frozen centroids — exact old cells,
                # routed to the dirs holding the old rows; members
                # cleanup BEFORE the vectors upsert (crash replays into
                # a still-detectable changed state)
                old_members = self._assign(
                    stored.join(changed, "vec_id", "left_semi").select("vec_id", "v")
                )
                self.members.merge_batch(
                    old_members.withColumn("seq", seq_rm).withColumn(
                        "op", F.lit("delete")
                    )
                )
            else:
                self.members.merge_batch(
                    changed.crossJoin(self.centroids.select("centroid_id"))
                    .withColumn("seq", seq_rm)
                    .withColumn("op", F.lit("delete"))
                )
        if self.cell_buckets:
            self.vectors.merge_batch(
                vecs.withColumn("seq", seq).withColumn("op", F.lit("upsert"))
            )
        self.members.merge_batch(
            assigned.withColumn("seq", seq).withColumn("op", F.lit("upsert"))
        )
        # the probe: with cell-bucketed members, read ONLY the cells the
        # batch's vectors were assigned to — IO ∝ touched cells
        state = (
            self.members.read(buckets=self.members.buckets_for(assigned))
            if self.cell_buckets
            else self.members.read()
        )
        # norms hoisted to per-row columns BEFORE the pair join: the
        # verify then pays one fold per pair (the cross dot product)
        # instead of three — per-pair norm recomputation is the
        # q_knn_cosine 3n·k trap, and the state side is read-sized, not
        # pair-sized. Computed on the same doubles in the same fold
        # order, so cos (and the stored rounded value) is bit-identical.
        nrm = F.sqrt(_dot(F.col("v"), F.col("v")))
        a = assigned.withColumn("na", nrm).select(
            F.col("vec_id").alias("vec_a"),
            F.col("v").alias("va"),
            "na",
            "centroid_id",
        )
        b = state.withColumn("nb", nrm).select(
            F.col("vec_id").alias("vec_b"),
            F.col("v").alias("vb"),
            "nb",
            "centroid_id",
        )
        cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        detected = (
            a.join(b, ["centroid_id"])
            .filter(F.col("vec_a") != F.col("vec_b"))
            .select(
                F.least("vec_a", "vec_b").alias("vec_a"),
                F.greatest("vec_a", "vec_b").alias("vec_b"),
                cos.alias("c"),
            )
            .dropDuplicates(["vec_a", "vec_b"])
            .filter(F.col("c") >= COS_THRESHOLD)
            .select("vec_a", "vec_b", F.round("c", 4).alias("cos"))
            .withColumn("seq", seq)
            .withColumn("op", F.lit("upsert"))
        )
        self.pairs.merge_batch(detected)

    def delete_vecs(self, vec_ids: DataFrame, batch_id: int) -> None:
        """Compliance deletion — mirrors NearDupIndex.delete_docs: the
        vectors leave the member state (both their cells) and every
        pair referencing them retracts; idempotent, and a later
        re-ingest re-detects. vec_ids: a 1-column (vec_id) frame.

        Under cell_buckets the member tombstones are re-derived by
        re-assigning the ids' STORED vectors (exact old cells, routed
        correctly); members merge before vectors, so a crash between
        them replays with the vectors still present and re-derives the
        same tombstones."""
        seq = F.lit(4 * int(batch_id) + 2).cast("bigint")
        ids = vec_ids.select("vec_id").distinct().localCheckpoint(eager=True)
        if self.cell_buckets:
            stored = (
                self.vectors.read(buckets=self.vectors.buckets_for(ids))
                if self._vec_pruned
                else self.vectors.read()
            )
            if stored is not None:
                old_members = self._assign(
                    stored.join(ids, "vec_id", "left_semi").select("vec_id", "v")
                )
                self.members.merge_batch(
                    old_members.withColumn("seq", seq).withColumn(
                        "op", F.lit("delete")
                    )
                )
            self.vectors.merge_batch(
                ids.withColumn("seq", seq).withColumn("op", F.lit("delete"))
            )
        else:
            self.members.merge_batch(
                ids.crossJoin(self.centroids.select("centroid_id"))
                .withColumn("seq", seq)
                .withColumn("op", F.lit("delete"))
            )
        retract_pairs(
            self.pairs, ids, "vec_a", "vec_b", "cos", 4 * int(batch_id) + 2
        )

    def pairs_df(self) -> DataFrame:
        cur = self.pairs.read()
        if cur is None:
            return self.spark.createDataFrame(
                [], "vec_a bigint, vec_b bigint, cos double"
            )
        return cur.select("vec_a", "vec_b", "cos")


def run_semdedup_stream(
    stream: DataFrame, index: SemanticDedupIndex, checkpoint_dir: str
) -> None:
    """Wire a (vec_id, v) embedding stream into the index via
    foreachBatch; blocks until available data is processed. At-least-
    once redelivery converges because ingest_batch is idempotent —
    the same contract as run_neardup_stream/run_simdup_stream."""
    (
        stream.writeStream.foreachBatch(
            lambda batch, bid: index.ingest_batch(batch, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
