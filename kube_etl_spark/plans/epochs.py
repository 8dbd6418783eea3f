"""Epoch-manifest materialization — the hand-off from the processed
corpus to the training loop: for each epoch, WHICH documents to visit
(temperature-scaled mixture sampling per source domain) and in WHAT
order (a deterministic per-epoch shuffle), written as a sharded
manifest the data loader streams.

Composition of the registered operators, productionized:
  mixture  — q_domain_mixture's w(s) ∝ share(s)^α weights, turned into
             per-source ACCEPTANCE RATES: rate(s) ∝ w(s)/share(s),
             normalized so the most-upweighted (smallest) domain
             samples at 1.0 and larger domains downsample toward the
             temperature mixture — subset sampling cannot exceed 1.0
             without replacement, so the head pays, not the tail;
  sample   — deterministic Bernoulli per (doc, epoch): accept iff
             u(doc, epoch) < rate(source), u = the md5 hash of
             "doc_id:epoch:seed" mapped to [0, 1). No RNG state, no
             shuffle — re-running a build yields byte-identical
             manifests (the property a resumable training run needs);
  order    — q_shuffle_order's shard/pos permutation keyed by the same
             hash family, so each epoch's order is independent;
  write    — partitionBy(epoch) parquet: the loader for epoch e reads
             one partition subtree, partition-pruned.

Scale shape: everything before the write is map-side against a
broadcast rate table (|sources| rows); the only exchange is the
per-shard rank window (hashpartition by (epoch, shard)). Epochs
multiply output rows, not input scans: all E epochs are derived in ONE
pass over the corpus (the epoch dimension is an explode of a
sequence literal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def mixture_rates(docs: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Per-source acceptance rates from temperature-scaled shares:
    rate(s) = (w(s)/share(s)) / max_s(w/share). The smallest domain —
    the one the temperature upweights most — samples at 1.0; every
    larger domain downsamples toward the α-mixture (subset sampling
    cannot exceed 1.0 without replacement, so the head pays)."""
    per = docs.groupBy("source").agg(F.sum("n_chars").alias("n_chars"))
    w = Window.partitionBy()
    share = F.col("n_chars").cast("double") / F.sum("n_chars").over(w)
    weight = F.pow(share, alpha) / F.sum(F.pow(share, alpha)).over(w)
    rel = (weight / share).alias("rel")
    rates = per.select("source", share.alias("share"), rel)
    # max over a whole-frame window on the ALREADY-AGGREGATED
    # |sources|-row frame — a crossJoin with rates.agg(max) re-ran the
    # corpus-sized groupBy scan twice (review r9; the mixture_rebalance
    # r6 pitfall, same fix)
    return rates.select(
        "source",
        "share",
        (F.col("rel") / F.max("rel").over(w)).alias("rate"),
    )


def build_manifests(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    n_epochs: int = 2,
    alpha: float = 0.5,
    seed: int = 42,
) -> dict:
    """Write partitionBy(epoch) manifests: (doc_id, source, shard, pos)
    per accepted document per epoch. Returns per-epoch counts."""
    if n_epochs < 1:
        # sequence(0, n_epochs-1) DESCENDS for n_epochs=0 (the repo's
        # documented sequence pitfall), silently manufacturing epochs
        # 0 and -1 — guard at the API (review r9)
        raise ValueError(f"n_epochs must be >= 1, got {n_epochs}")
    rates = mixture_rates(docs, alpha)
    epochs = docs.select("doc_id", "source").join(F.broadcast(rates), "source")
    epochs = epochs.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1))).alias("epoch"),
        "rate",
    )
    # u(doc, epoch) in [0, 1): first 15 hex digits of the keyed md5 —
    # 60 bits, exact in a double's 52-bit mantissa territory is fine
    # for acceptance testing (uniformity matters, not exactness)
    hx = F.md5(
        F.concat_ws(":", F.col("doc_id"), F.col("epoch"), F.lit(str(seed)))
    )
    u = F.conv(F.substring(hx, 1, 15), 16, 10).cast("double") / F.lit(
        float(16**15)
    )
    accepted = epochs.filter(u < F.col("rate"))
    order_hx = F.md5(
        F.concat_ws(":", F.col("doc_id"), F.col("epoch"), F.lit(f"order{seed}"))
    )
    shard = F.conv(F.substring(order_hx, 1, 1), 16, 10).cast("int")
    w = Window.partitionBy("epoch", "shard").orderBy("order_hx", "doc_id")
    manifest = (
        accepted.select(
            "doc_id",
            "source",
            "epoch",
            shard.alias("shard"),
            order_hx.alias("order_hx"),
        )
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "source", "epoch", "shard", "pos")
    )
    manifest.write.mode("overwrite").partitionBy("epoch").parquet(out_dir)
    out = spark.read.parquet(out_dir)
    return {
        "epochs": {
            str(r["epoch"]): r["n"]
            for r in out.groupBy("epoch").agg(F.count(F.lit(1)).alias("n")).collect()
        },
        "n_epochs": n_epochs,
        "alpha": alpha,
        "seed": seed,
    }
