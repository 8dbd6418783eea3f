"""Continuous BINARY near-duplicate detection (EXT; the streaming twin
of queries/mediaq.py's q_media_neardup byte-shingle SimHash screen —
and the fourth incremental dedup index, beside the MinHash-LSH, the
semantic, and the substring indexes).

A media corpus is not screened once — payloads keep arriving (re-crawls,
re-encodes), and each new payload must be checked against EVERYTHING
already ingested without rescanning the corpus. This module maintains
the SimHash band index incrementally with the SAME signature and
band-key code the batch query uses (media.simhash_signatures /
media.SIMHASH_BAND_SQL — one implementation, so incremental ≡ one-shot
holds by construction; the signature width/banding/threshold constants
are the measured choices in docs/architecture.md §round-7b).

Scale shape per micro-batch (corpus N, batch n, N >> n):
  * sign the batch: O(n) map work over the payload bytes — the corpus
    is never rescanned and the payloads never shuffle;
  * candidate probe: batch band rows (4n narrow rows) hash-join the
    band index (4N rows, 16-byte keys) — the only corpus-sized pass,
    and a point-lookup store swap at 10⁹ payloads leaves the batch
    logic unchanged (the NearDupIndex note applies verbatim);
  * verdict: candidate-pair-sized join back to the signature state
    (8 B/payload), Hamming via one bit_count(xor) per pair.
All state is written via idempotent MERGE keyed on media_id (winner by
seq), so at-least-once redelivery converges — replaying a batch probes
an index it is already in, and a < b canonicalization keeps each pair
single.

Unlike the text NearDupIndex (which retains shingle sets for its
exact-verify tier), this index retains NOTHING content-derived beyond
the 8-byte signature — deliberately: media payloads are large and the
compliance-deletion contract is then trivial. The exact-verify tier
(media.byte_jaccard_verify) composes on demand against the payload
store (the landing zone) for the pairs table's candidates, at
candidate-pair-sized cost (measured: docs/architecture.md §round-7c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..media import SIMHASH_BAND_SQL, simhash_signatures
from .cdc import StateTable, changed_ids, retract_pairs


class SimDupIndex:
    """Incrementally-maintained binary SimHash near-dup index.

    Three state tables under ``base_dir``:
      * ``sigs``  — (media_id, sig): the 32-bit signature per payload
                    (the verdict side; 8 bytes each);
      * ``bands`` — (media_id, band, bucket): the 4-band probe index
                    (lo/hi/even/odd 16-bit views);
      * ``pairs`` — (media_a, media_b, hamming): every detected pair
                    (media_a < media_b) at Hamming ≤ ``hamming_max``.
    """

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        hamming_max: int = 4,
        bucket_col: F.Column | None = None,
        n_buckets: int = 16,
    ):
        """bucket_col (a bigint expression over media_id) switches the
        two corpus-sized tables (sigs, bands) to BucketedStateTable so
        a merge rewrites only the batch's buckets instead of O(corpus)
        parquet per batch — with monotone media ids a RANGE bucket
        (floor(media_id/width)) makes each ingest a one-bucket rewrite
        (the measured BucketedStateTable regime notes apply). The pairs
        table stays flat: near-dup-count-sized, not corpus-sized."""
        from .cdc import BucketedStateTable

        self.spark = spark
        self.hamming_max = hamming_max

        def corpus_table(name: str, key_cols: list[str]) -> StateTable:
            path = f"{base_dir.rstrip('/')}/{name}"
            if bucket_col is not None:
                return BucketedStateTable(
                    spark, path, key_cols, "seq", n_buckets, bucket_col
                )
            return StateTable(spark, path, key_cols, "seq")

        self.sigs = corpus_table("sigs", ["media_id"])
        self.bands = corpus_table("bands", ["media_id", "band"])
        self.pairs = StateTable(
            spark, f"{base_dir.rstrip('/')}/pairs", ["media_a", "media_b"], "seq"
        )

    def _band_rows(self, sig: DataFrame) -> DataFrame:
        rows = None
        for i, expr in enumerate(SIMHASH_BAND_SQL):
            r = sig.select(
                "media_id",
                F.lit(i).cast("int").alias("band"),
                F.expr(expr).cast("bigint").alias("bucket"),
            )
            rows = r if rows is None else rows.unionByName(r)
        return rows

    def ingest_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Sign, index, and near-dup-check one micro-batch of
        (media_id, payload) rows. Idempotent: replaying a batch merges
        the same state rows and upserts the same pairs.

        Re-ingesting an id with CHANGED bytes (the re-crawl/re-encode
        case) first RETRACTS the pairs its old content produced and
        DELETES all its old index rows, then re-indexes under the new
        signature — without this, stale pairs and ghost band rows
        survive a re-crawl forever (review r7). A payload re-crawled to
        under one shingle (no signature at all) is treated as leaving
        the index: its signature, band rows, and pairs go too.

        Seq phases (seq = 4·batch_id + phase): 0 = retractions/cleanup,
        1 = upserts, 2 = compliance deletion (delete_docs). Within a
        batch, re-detected pairs must beat their own retraction (state
        merges break same-seq ties toward delete); ACROSS the same
        batch id, a compliance delete must beat the ingest's upserts —
        the delete-wins contract the state layer documents."""
        seq_rm = F.lit(4 * int(batch_id)).cast("bigint")
        seq_up = F.lit(4 * int(batch_id) + 1).cast("bigint")
        sig = simhash_signatures(batch.select("media_id", "payload")).localCheckpoint(
            eager=True
        )
        stored = self.sigs.read()
        if stored is None and not sig.head(1):
            # fresh index and nothing signable: nothing to do (the
            # probe below would read state that does not exist yet)
            return
        if stored is not None:
            # ids whose signature changed, plus ids in the batch with
            # NO signature anymore (payload shrank under one shingle —
            # absent from `sig`, so a plain join would miss them)
            shrunk = (
                batch.select("media_id")
                .distinct()
                .join(sig.select("media_id"), "media_id", "left_anti")
                .join(stored.select("media_id"), "media_id", "left_semi")
            )
            ch = changed_ids(sig, stored, "media_id", "sig")
            dead = (
                shrunk if ch is None else ch.unionByName(shrunk)
            ).distinct().localCheckpoint(eager=True)
            if dead.head(1):
                retract_pairs(
                    self.pairs, dead, "media_a", "media_b", "hamming",
                    4 * int(batch_id),
                )
                self.sigs.merge_batch(
                    dead.withColumn("seq", seq_rm).withColumn("op", F.lit("delete"))
                )
                self.bands.merge_batch(
                    dead.crossJoin(
                        self.spark.range(len(SIMHASH_BAND_SQL)).select(
                            F.col("id").cast("int").alias("band")
                        )
                    )
                    .withColumn("seq", seq_rm)
                    .withColumn("op", F.lit("delete"))
                )
        if not sig.head(1):
            return
        # merge FIRST, then probe the post-merge index: batch-internal
        # pairs fall out of the same probe join (no separate self-join),
        # and a replayed batch probes an index it is already in — the
        # a < b canonicalization keeps each pair single
        self.sigs.merge_batch(
            sig.withColumn("seq", seq_up).withColumn("op", F.lit("upsert"))
        )
        new_bands = self._band_rows(sig)
        self.bands.merge_batch(
            new_bands.withColumn("seq", seq_up).withColumn("op", F.lit("upsert"))
        )
        index = self.bands.read().select("media_id", "band", "bucket")
        cand = (
            new_bands.alias("n")
            .join(
                index.alias("i"),
                (F.col("n.band") == F.col("i.band"))
                & (F.col("n.bucket") == F.col("i.bucket"))
                & (F.col("n.media_id") != F.col("i.media_id")),
            )
            .select(
                F.least(F.col("n.media_id"), F.col("i.media_id")).alias("media_a"),
                F.greatest(F.col("n.media_id"), F.col("i.media_id")).alias("media_b"),
            )
            .dropDuplicates(["media_a", "media_b"])
        )
        sigs = self.sigs.read().select("media_id", "sig")
        detected = (
            cand.join(
                sigs.select(
                    F.col("media_id").alias("media_a"), F.col("sig").alias("sa")
                ),
                "media_a",
            )
            .join(
                sigs.select(
                    F.col("media_id").alias("media_b"), F.col("sig").alias("sb")
                ),
                "media_b",
            )
            .withColumn("hamming", F.expr("CAST(bit_count(sa ^ sb) AS BIGINT)"))
            .filter(F.col("hamming") <= self.hamming_max)
            .select("media_a", "media_b", "hamming")
            .withColumn("seq", seq_up)
            .withColumn("op", F.lit("upsert"))
        )
        self.pairs.merge_batch(detected)

    def delete_docs(self, media_ids: DataFrame, batch_id: int) -> None:
        """Compliance deletion: remove the payloads' signatures and band
        rows — the index must not retain content-derived state for
        deleted media — and RETRACT every detected pair referencing a
        deleted id. Idempotent (seq-keyed delete winners), and stamped
        at phase 2 of the same batch id so a delete in the SAME
        micro-batch as an ingest of the id wins (the delete-wins
        contract); a later re-ingest of the same media_id (higher batch
        id) re-detects its pairs. media_ids: a 1-column (media_id)
        frame."""
        seq = F.lit(4 * int(batch_id) + 2).cast("bigint")
        ids = media_ids.select("media_id").distinct().localCheckpoint(eager=True)
        self.sigs.merge_batch(
            ids.withColumn("seq", seq).withColumn("op", F.lit("delete"))
        )
        self.bands.merge_batch(
            ids.crossJoin(
                self.spark.range(len(SIMHASH_BAND_SQL)).select(
                    F.col("id").cast("int").alias("band")
                )
            )
            .withColumn("seq", seq)
            .withColumn("op", F.lit("delete"))
        )
        retract_pairs(
            self.pairs, ids, "media_a", "media_b", "hamming",
            4 * int(batch_id) + 2,
        )

    def pairs_df(self) -> DataFrame:
        """All detected pairs so far (media_a, media_b, hamming) — the
        same columns q_media_neardup's batch screen emits."""
        cur = self.pairs.read()
        if cur is None:
            return self.spark.createDataFrame(
                [], "media_a bigint, media_b bigint, hamming bigint"
            )
        # cast normalizes LEGACY state dirs whose hamming was written
        # as double by earlier builds (merge unions widen new bigint
        # rows back to double there); fresh state is bigint end-to-end
        return cur.select(
            "media_a", "media_b", F.col("hamming").cast("bigint").alias("hamming")
        )


def run_simdup_stream(
    stream: DataFrame, index: SimDupIndex, checkpoint_dir: str
) -> None:
    """Wire a (media_id, payload) stream into the index via
    foreachBatch; blocks until available data is processed. At-least-
    once redelivery converges because ingest_batch is idempotent."""
    (
        stream.writeStream.foreachBatch(
            lambda batch, bid: index.ingest_batch(batch, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
