"""The composed pretraining-data pipeline — the end-to-end job the
individual L-family operators exist for, chained in their production
order: quality gates → exact dedup → leakage-safe split → sequence
packing → partitioned corpus write.

This is the batch analog of the reference's one-shot export pipeline
(scan → per-row transform → partitioned sink, pkg/export/export.go:
64-168) applied to the LLM-data north star: one spark-submit job a
training-data team runs over a raw corpus.

Scale design (the whole pipeline is three shuffles):
  1. quality metrics + content hashes are ONE map-side projection pass
     (all gates fused, no per-metric scans);
  2. exact dedup shuffles 32-byte digests (groupBy sha2 → min doc_id
     winner, then a digest-keyed semi join back — the same shape as
     q_dedup_exact);
  3. the split tag is a map-side md5 bucket (content-hash: duplicates
     co-travel, so dedup-then-split is leakage-safe by construction);
  4. sequence packing is one cumulative-sum window per (split, source)
     hash partition — shards pack independently, no global order;
  5. the write is partitionBy(split) — downstream trainers read one
     split subtree with partition pruning.
No Python UDFs anywhere; every stage is whole-stage-codegen-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..queries.llm import _stopword_hits


def quality_gate(docs: DataFrame) -> DataFrame:
    """Fused per-document quality metrics + keep flag (the
    q_quality_filter_pipeline gates) and the two content hashes the
    later stages need — one projection pass."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    sw_ratio = _stopword_hits(toks).cast("double") / n
    grams = F.transform(
        F.sequence(F.lit(1), n - 4),
        lambda i: F.array_join(F.slice(toks, i, 5), " "),
    )
    rep = F.when(
        n >= 5,
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / (n - 4),
    ).otherwise(F.lit(1.0))
    return docs.select(
        "doc_id",
        "text",
        "lang",
        "source",
        n.cast("bigint").alias("n_tokens"),
        ((n >= 20) & (sw_ratio > 0.01) & (rep < 0.5)).alias("keep"),
        F.sha2(F.col("text"), 256).alias("digest"),
        F.substring(F.md5(F.col("text")), 1, 1).alias("md5_digit"),
    )


def dedup_exact(scored: DataFrame) -> DataFrame:
    """Keep the min-doc_id representative per content digest (the
    q_dedup_exact winner rule). Shuffles only (digest, doc_id).
    Winner columns are RENAMED before the self-join: `winners` shares
    lineage with `scored`, so an unaliased scored.digest ==
    winners.digest resolves both sides to the same attribute — a
    trivially-true predicate (Spark warns, and the join silently
    degrades to the doc_id condition alone)."""
    winners = (
        scored.groupBy("digest")
        .agg(F.min("doc_id").alias("win_id"))
        .select(F.col("digest").alias("win_digest"), "win_id")
    )
    return scored.join(
        winners,
        (F.col("digest") == F.col("win_digest"))
        & (F.col("doc_id") == F.col("win_id")),
        "left_semi",
    )


SPLIT = (
    F.when(F.col("md5_digit").isin(*"0123456"), "train")
    .when(F.col("md5_digit").isin(*"789ab"), "valid")
    .otherwise("test")
)


def pack(split_docs: DataFrame, cap: int) -> DataFrame:
    """Map each doc to its training-sequence interval at `cap` tokens
    per sequence, packing independently per (split, source) shard —
    the q_pack_sequences window, re-keyed for the pipeline."""
    w = (
        Window.partitionBy("split", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return split_docs.withColumn("cum_before", cum_before).select(
        "doc_id",
        "text",
        "lang",
        "source",
        "n_tokens",
        "split",
        (F.col("cum_before") / cap).cast("bigint").alias("first_seq"),
        ((F.col("cum_before") + F.col("n_tokens") - 1) / cap)
        .cast("bigint")
        .alias("last_seq"),
    )


def run_pretraining(
    spark: SparkSession, input_dir: str, output_dir: str, cap: int = 512
) -> dict:
    """Run the full pipeline; write partitionBy(split) parquet; return
    a stats dict (the job's one-line JSON report)."""
    docs = load_table(spark, input_dir, "documents")
    # the gate's 5-gram + double-digest map pass is the job's most
    # expensive projection and feeds FIVE consumers (n_total, n_kept,
    # dedup's winners aggregate AND its semi-join probe side, the final
    # write) — materialize once (review r9; the consumed-N-times rule)
    scored = quality_gate(docs).localCheckpoint(eager=True)
    n_total = scored.count()
    kept = scored.filter(F.col("keep"))
    n_kept = kept.count()
    deduped = dedup_exact(kept)
    n_unique = deduped.count()
    tagged = deduped.withColumn("split", SPLIT)
    packed = pack(tagged, cap)
    packed.write.mode("overwrite").partitionBy("split").parquet(output_dir)

    out = spark.read.parquet(output_dir)
    per_split = {
        r["split"]: {
            "n_docs": r["n_docs"],
            "n_tokens": r["n_tokens"],
            "n_sequences": r["n_sequences"],
        }
        for r in out.groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("d"),
            F.sum("n_tokens").alias("t"),
            (F.max("last_seq") + 1).alias("s"),
        )
        .groupBy("split")
        .agg(
            F.sum("d").cast("bigint").alias("n_docs"),
            F.sum("t").cast("bigint").alias("n_tokens"),
            F.sum("s").cast("bigint").alias("n_sequences"),
        )
        .collect()
    }
    return {
        "input_docs": n_total,
        "dropped_quality": n_total - n_kept,
        "dropped_duplicate": n_kept - n_unique,
        "written_docs": n_unique,
        "cap": cap,
        "splits": per_split,
    }


def build_vocab(corpus: DataFrame, min_count: int = 2) -> DataFrame:
    """Frequency-ranked vocabulary over the processed corpus:
    id 0 = <unk>; real tokens get ids 1..V ordered by (count desc,
    token asc) — fully deterministic, no hash collisions, the layout
    a tokenizer-training step consumes.

    Scale shape: one map-side-combined token count (vocabulary-sized
    output), then the rank via global_row_number (queries/scale.py) —
    a range-partitioned distributed exact rank, so a 10⁸-term web
    vocabulary sorts in parallel instead of in the one task a global
    window would use; the id contract (count desc, token asc) is a
    total order either way."""
    from ..queries.scale import global_row_number

    counts = (
        corpus.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )
    return global_row_number(
        counts, [F.col("count").desc(), F.col("token").asc()], out_col="id"
    ).select("token", "count", "id")


def encode_corpus(corpus: DataFrame, vocab: DataFrame) -> DataFrame:
    """Map each document's tokens to vocabulary ids (OOV → 0 = <unk>)
    keeping order — the id-encoding step before sequence packing feeds
    a trainer. The vocab rides a broadcast map literal-free: explode →
    broadcast-join on token → re-assemble in position order. The
    re-assembly groups by doc on the SAME partitioning the explode
    preserved, so a doc's tokens never cross partitions before the
    collect_list."""
    toks = corpus.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    )
    mapped = (
        toks.join(F.broadcast(vocab.select("token", "id")), "token", "left")
        .select("doc_id", "pos", F.coalesce("id", F.lit(0)).alias("tid"))
    )
    return (
        mapped.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "tid"))
            ).alias("pairs")
        )
        .select(
            "doc_id",
            F.transform(F.col("pairs"), lambda p: p["tid"]).alias("token_ids"),
        )
    )
