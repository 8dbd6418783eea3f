"""Continuous repeated-substring detection — the streaming form of
queries/llm.py's q_dedup_substring (the ExactSubstr shape): maintain,
as documents arrive, the set of maximal token spans that occur more
than once anywhere in the corpus so far.

What makes this one interesting is RETROACTIVITY: a newly-ingested
document that repeats an old document's text creates spans in BOTH —
the old doc's result rows change even though the old doc never
re-arrives. The index handles that as delta maintenance:

  per micro-batch —
  1. fingerprint the batch (doc, pos, h) with the SAME w-gram helper
     the batch query uses;
  2. additively merge per-fingerprint counts, touching ONLY the
     batch's fingerprints (counts are read-modify-write on the batch
     key set, not a full-state aggregation);
  3. affected docs = docs holding any fingerprint that is duplicated
     NOW and gained an occurrence in this batch (old docs get pulled
     in exactly when the batch collides with them);
  4. recompute the gaps-and-islands span merge for affected docs only,
     and replace their span rows (delete-then-upsert MERGE).

Replay safety: re-ingesting a batch must NOT double-count fingerprints,
so the counts delta is derived from position rows that are NEW to the
positions state (left_anti against existing (doc_id, p) keys) — an
at-least-once redelivery contributes zero new positions and therefore a
zero count delta, and the span recompute is a pure function of state.

Scale notes: positions and counts are corpus-gram-sized (the index IS
the memory); the probes by fingerprint / by doc are state scans here —
the same parquet-state honesty note as streaming/neardup.py, with the
same production swap (point-lookup store or bucket-pruned layout).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries.llm import _tokens
from .cdc import StateTable

W = 10  # q_dedup_substring's window


def _gram_positions(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, p, h): md5 fingerprint of every
    w-token window, 1-based positions — identical to the batch query's
    fingerprint pass (repeated_spans)."""
    tok = docs.select("doc_id", _tokens(F.col("text")).alias("t"))
    grams = F.transform(
        F.sequence(F.lit(1), F.size("t") - (W - 1)),
        lambda i: F.struct(
            i.alias("p"),
            F.md5(F.concat_ws(" ", F.slice("t", i, W))).alias("h"),
        ),
    )
    return (
        tok.filter(F.size("t") >= W)
        .select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", F.col("g.p").alias("p"), F.col("g.h").alias("h"))
    )


class SubstringDupIndex:
    """Incrementally-maintained repeated-span index.

    State under ``base_dir``:
      * ``positions`` — (doc_id, p, h): every ingested w-gram instance;
      * ``counts``    — (h, n): total occurrences per fingerprint;
      * ``spans``     — (doc_id, span_start, span_tokens): the current
                        maximal repeated spans, per doc.
    """

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.positions = StateTable(
            spark, os.path.join(base_dir, "positions"), ["doc_id", "p"], "seq"
        )
        self.counts = StateTable(
            spark, os.path.join(base_dir, "counts"), ["h"], "seq"
        )
        self.spans = StateTable(
            spark, os.path.join(base_dir, "spans"), ["doc_id", "span_start"], "seq"
        )

    def ingest_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Index one micro-batch of (doc_id, text) rows and refresh the
        spans of every affected document (batch docs AND old docs the
        batch collides with). Idempotent under redelivery."""
        seq = F.lit(int(batch_id)).cast("bigint")
        grams = _gram_positions(batch.select("doc_id", "text")).localCheckpoint(
            eager=True
        )
        if not grams.head(1):
            return
        old_pos = self.positions.read()
        if old_pos is not None:
            # the index is APPEND-ONLY per doc_id: counts are additive
            # and never decremented, so re-ingesting a doc_id with
            # CHANGED text would leave counts permanently disagreeing
            # with positions (phantom/missing spans). Fail loudly
            # instead of corrupting state; true updates are a
            # delete-then-reingest workflow this index does not offer.
            changed = grams.alias("g").join(
                old_pos.select("doc_id", "p", F.col("h").alias("h_old")),
                ["doc_id", "p"],
            ).filter(F.col("g.h") != F.col("h_old"))
            if changed.head(1):
                raise ValueError(
                    "SubstringDupIndex is append-only: a re-ingested "
                    "doc_id carries different text than its indexed "
                    "version (counts cannot be decremented)"
                )
        # replay safety: only positions NOT already in state contribute
        # to the count delta (a redelivered batch contributes nothing)
        fresh = (
            grams
            if old_pos is None
            else grams.join(
                old_pos.select("doc_id", "p"), ["doc_id", "p"], "left_anti"
            )
        ).localCheckpoint(eager=True)
        self.positions.merge_batch(
            grams.withColumn("seq", seq).withColumn("op", F.lit("upsert"))
        )
        delta = fresh.groupBy("h").agg(F.count(F.lit(1)).alias("dn"))
        old_counts = self.counts.read()
        if old_counts is None:
            merged = delta.select("h", F.col("dn").alias("n"))
        else:
            merged = (
                delta.join(old_counts.select("h", "n"), "h", "left")
                .select("h", (F.coalesce(F.col("n"), F.lit(0)) + F.col("dn")).alias("n"))
            )
        self.counts.merge_batch(
            merged.withColumn("seq", seq).withColumn("op", F.lit("upsert"))
        )
        # affected docs: hold a fingerprint that is duplicated NOW and
        # was touched by this batch (pure batch-internal dups included;
        # a redelivered batch has no fresh rows → nothing recomputes)
        counts_now = self.counts.read().select("h", "n")
        hot = (
            fresh.select("h")
            .distinct()
            .join(counts_now.filter(F.col("n") > 1), "h", "left_semi")
        )
        all_pos = self.positions.read().select("doc_id", "p", "h")
        affected = (
            all_pos.join(hot, "h", "left_semi").select("doc_id").distinct()
        ).localCheckpoint(eager=True)
        if not affected.head(1):
            return
        # recompute the span set of affected docs from state (a pure
        # function of positions ⋈ duplicated-fingerprints)
        marked = (
            all_pos.join(affected, "doc_id", "left_semi")
            .join(counts_now.filter(F.col("n") > 1), "h", "left_semi")
            .select("doc_id", "p")
        )
        win = Window.partitionBy("doc_id").orderBy("p")
        islands = marked.withColumn("grp", F.col("p") - F.row_number().over(win))
        # materialized once: referenced by both the upsert ops and the
        # stale anti-join below — unchecked, the positions-state scan +
        # island window would execute twice per batch
        new_spans = (
            islands.groupBy("doc_id", "grp")
            .agg(
                F.min("p").cast("bigint").alias("span_start"),
                (F.max("p") - F.min("p") + W).cast("bigint").alias("span_tokens"),
            )
            .select("doc_id", "span_start", "span_tokens")
        ).localCheckpoint(eager=True)
        # replace: retract the affected docs' previous spans that are
        # not re-derived, then upsert the new set
        cur = self.spans.read()
        ops = new_spans.withColumn("op", F.lit("upsert"))
        if cur is not None:
            stale = (
                cur.select("doc_id", "span_start")
                .join(affected, "doc_id", "left_semi")
                .join(new_spans.select("doc_id", "span_start"), ["doc_id", "span_start"], "left_anti")
                .withColumn("span_tokens", F.lit(None).cast("bigint"))
                .withColumn("op", F.lit("delete"))
            )
            ops = ops.unionByName(stale)
        self.spans.merge_batch(ops.withColumn("seq", seq))

    def spans_df(self) -> DataFrame:
        """Current maximal repeated spans (doc_id, span_start,
        span_tokens) across everything ingested so far."""
        cur = self.spans.read()
        if cur is None:
            return self.spark.createDataFrame(
                [], "doc_id bigint, span_start bigint, span_tokens bigint"
            )
        return cur.select("doc_id", "span_start", "span_tokens")
