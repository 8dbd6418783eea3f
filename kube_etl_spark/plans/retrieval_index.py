"""Retrieval index build + serve — the production shape of the
retrieval stack: precompute the expensive corpus passes ONCE into
persisted index tables, then answer each query by reading a tiny,
partition-pruned slice of the index.

Build writes four tables under `index_dir`:
  centroids/   k spherical-k-means centroids (k rows — driver-sized)
  cells/       L2-normalized vectors, partitionBy(centroid_id): the IVF
               inverted file. A probe reads ONLY its nprobe cell
               directories — disk-level partition pruning, the batch
               analog of an ANN index's cell seek.
  postings/    (term, doc_id, tf) repartitioned by term hash: the BM25
               inverted index. Query terms push down to the parquet
               scan (predicate pushdown on `term`), so a probe reads
               the query's posting lists, not the corpus. NOT
               partitionBy(term): a web-scale vocabulary would mean
               millions of directories; hash-bucketed files + pushdown
               give the same skip behavior with bounded metadata.
  stats/       1 row (n_docs, total_dl) + per-term df — the BM25
               constants.

Serve (`query_index`) reads only: k centroid rows, nprobe cells, the
query's posting lists, and the 1-row stats — independent of corpus
size. Fusion is the same RRF as q_hybrid_rrf.

Scale notes: the build is the heavy job (full corpus: tokenize +
normalize + k-means assign) and runs as a batch spark-submit; serving
is cheap enough for an interactive session. Index freshness = re-run
the build (or append new cells/postings incrementally — the layout is
append-friendly since both tables are keyed by content, not position).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..queries.llm import (
    _dot,
    _kmeans_centroids,
    _tokens,
    assign_cells,
    bm25_contrib,
)
from ..streaming.cdc import atomic_overwrite


def _normalize(emb: DataFrame) -> DataFrame:
    # norm hoisted into its own column BEFORE the transform: a lambda
    # re-evaluates every expression per element, so an inline norm
    # would compute the full dot product d times per vector (O(d²))
    norm = F.sqrt(_dot(F.col("raw"), F.col("raw")))
    return emb.withColumn("n", norm).select(
        "vec_id",
        F.transform(F.col("raw"), lambda x: x / F.col("n")).alias("v"),
    )


def _assign_cells(unit: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment of unit vectors (the IVF routing) —
    the shared queries/llm.assign_cells rule at n=1."""
    return assign_cells(unit, cents, n=1).select("vec_id", "v", "centroid_id")


def _postings_of(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(postings, doclens) for a batch of (doc_id, text) rows."""
    toks = docs.select("doc_id", _tokens(F.col("text")).alias("toks"))
    doclens = toks.select("doc_id", F.size("toks").cast("bigint").alias("dl"))
    postings = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .repartition(8, "term")  # hash-bucketed by term, NOT partitionBy
    )
    return postings, doclens


def _write_stats(spark: SparkSession, index_dir: str) -> int:
    """(Re)derive the BM25 constants from the postings/doclens tables —
    index-sized passes, not corpus passes. Returns the term count."""
    postings = spark.read.parquet(os.path.join(index_dir, "postings"))
    doclens = spark.read.parquet(os.path.join(index_dir, "doclens"))
    df_tbl = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = df_tbl.crossJoin(
        F.broadcast(
            doclens.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("dl").cast("bigint").alias("total_dl"),
            )
        )
    ).persist()
    n_terms = stats.count()  # materialize BEFORE overwriting the source
    stats.write.mode("overwrite").parquet(os.path.join(index_dir, "stats"))
    stats.unpersist()
    return n_terms


def build_index(
    spark: SparkSession, input_dir: str, index_dir: str, k: int = 16
) -> dict:
    """Build all four index tables; return build stats."""
    emb = load_table(spark, input_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("raw")
    )
    unit = _normalize(emb)
    cents = _kmeans_centroids(spark, unit, k=k, iters=3)
    cents.write.mode("overwrite").parquet(os.path.join(index_dir, "centroids"))
    cells = _assign_cells(unit, cents)
    cells.write.mode("overwrite").partitionBy("centroid_id").parquet(
        os.path.join(index_dir, "cells")
    )
    docs = load_table(spark, input_dir, "documents").select("doc_id", "text")
    postings, doclens = _postings_of(docs)
    postings.write.mode("overwrite").parquet(os.path.join(index_dir, "postings"))
    doclens.write.mode("overwrite").parquet(os.path.join(index_dir, "doclens"))
    n_terms = _write_stats(spark, index_dir)
    # counts come from the just-written tables: re-counting the `cells`
    # / `postings` plans would re-execute the whole corpus pipeline
    # (k-means assignment, tokenize+explode) a second time
    return {
        "k": k,
        "n_vectors": spark.read.parquet(os.path.join(index_dir, "cells")).count(),
        "n_postings": spark.read.parquet(os.path.join(index_dir, "postings")).count(),
        "n_terms": n_terms,
    }


def append_to_index(
    spark: SparkSession, index_dir: str, new_docs: DataFrame, new_emb: DataFrame
) -> dict:
    """Incremental index maintenance — ingest a batch of new documents
    WITHOUT rebuilding: new vectors route to the EXISTING centroids and
    append into their cell directories (partitionBy append only touches
    the written partitions); new posting lists and doc lengths append
    to their tables (content-keyed layout — build order never matters,
    so append ≡ rebuild for the sparse side); only the small BM25
    stats table is re-derived, from the index itself, never from the
    corpus. Centroids drift as the corpus grows — re-run the full
    build when recall degrades (the standard IVF re-train cadence).

    new_docs: (doc_id, text) rows; new_emb: (vec_id, embedding) rows.
    """
    cents = spark.read.parquet(os.path.join(index_dir, "centroids"))
    unit = _normalize(
        new_emb.select("vec_id", F.col("embedding").cast("array<double>").alias("raw"))
    )
    cells = _assign_cells(unit, cents)
    cells.write.mode("append").partitionBy("centroid_id").parquet(
        os.path.join(index_dir, "cells")
    )
    postings, doclens = _postings_of(new_docs.select("doc_id", "text"))
    postings.write.mode("append").parquet(os.path.join(index_dir, "postings"))
    doclens.write.mode("append").parquet(os.path.join(index_dir, "doclens"))
    n_terms = _write_stats(spark, index_dir)
    # the batch is its own row count — avoid re-running the centroid
    # assignment just to count its output
    return {"appended_vectors": new_emb.count(), "n_terms": n_terms}


def dense_probe(
    spark: SparkSession, index_dir: str, probe_v: list[float], nprobe: int = 2,
    topk: int = 10,
) -> DataFrame:
    """IVF probe: pick the nprobe nearest centroids (k driver-side
    rows), then scan ONLY those cell partitions (partition-pruned
    read) and rank by cosine ≡ dot on unit vectors."""
    cents = spark.read.parquet(os.path.join(index_dir, "centroids")).collect()
    import math

    n = math.sqrt(sum(x * x for x in probe_v))
    pv = [x / n for x in probe_v]
    scored = sorted(
        ((sum(a * b for a, b in zip(pv, r["cv"])), r["centroid_id"]) for r in cents),
        reverse=True,
    )
    cell_ids = [cid for _, cid in scored[:nprobe]]
    cells = spark.read.parquet(os.path.join(index_dir, "cells")).filter(
        F.col("centroid_id").isin(cell_ids)  # -> disk partition pruning
    )
    pv_col = F.array(*[F.lit(float(x)) for x in pv])
    return (
        cells.select(
            "vec_id",
            F.round(_dot(pv_col, F.col("v")), 4).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(topk)
        .withColumn(
            "rank_dense",
            F.row_number()
            .over(Window.orderBy(F.col("cos").desc(), F.col("vec_id").asc()))
            .cast("bigint"),
        )
    )


def lexical_probe(
    spark: SparkSession, index_dir: str, terms: list[str], topk: int = 10
) -> DataFrame:
    """BM25 probe from the index: read the query terms' posting lists
    (predicate pushdown on `term`), join doc lengths, score, top-k."""
    post = spark.read.parquet(os.path.join(index_dir, "postings")).filter(
        F.col("term").isin(terms)
    )
    doclens = spark.read.parquet(os.path.join(index_dir, "doclens"))
    stats = spark.read.parquet(os.path.join(index_dir, "stats")).filter(
        F.col("term").isin(terms)
    )
    scored = (
        post.join(F.broadcast(stats), "term")
        .join(doclens, "doc_id")
    )
    contrib = bm25_contrib(
        F.col("tf"), F.col("df"), F.col("dl"), F.col("n_docs"), F.col("total_dl")
    )
    return (
        scored.select("doc_id", contrib.alias("c"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("c"), 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(topk)
        .withColumn(
            "rank_lex",
            F.row_number()
            .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()))
            .cast("bigint"),
        )
    )


def query_index(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    probe_v: list[float],
    nprobe: int = 2,
    topk: int = 10,
) -> DataFrame:
    """Hybrid probe: RRF(k=60) fusion of the two index-served legs."""
    lex = lexical_probe(spark, index_dir, terms, topk).select("doc_id", "rank_lex")
    den = dense_probe(spark, index_dir, probe_v, nprobe, topk).select(
        F.col("vec_id").alias("doc_id"), "rank_dense"
    )
    fused = lex.join(den, "doc_id", "full")
    rrf = F.round(
        F.coalesce(1.0 / (60 + F.col("rank_lex")), F.lit(0.0))
        + F.coalesce(1.0 / (60 + F.col("rank_dense")), F.lit(0.0)),
        6,
    )
    return fused.select("doc_id", "rank_lex", "rank_dense", rrf.alias("rrf")).orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )


def _cells_backup_dir(cells_dir: str) -> str:
    return cells_dir + ".backup"


def _cells_intent_path(cells_dir: str) -> str:
    return cells_dir + ".delete-intent.json"


def _backup_cells(cells_dir: str, touched: list) -> None:
    """Hard-link snapshot of the touched cell dirs + intent journal,
    published BEFORE the in-place rewrite (see delete_from_index).
    Links share data blocks, so the snapshot costs metadata only."""
    from ..streaming.cdc import atomic_write_json

    backup = _cells_backup_dir(cells_dir)
    shutil_rmtree_quiet(backup)
    for cid in touched:
        src = os.path.join(cells_dir, f"centroid_id={cid}")
        dst = os.path.join(backup, f"centroid_id={cid}")
        os.makedirs(dst, exist_ok=True)
        for fn in os.listdir(src):
            os.link(os.path.join(src, fn), os.path.join(dst, fn))
    # intent LAST: its existence asserts the backup is complete
    atomic_write_json(
        _cells_intent_path(cells_dir), {"touched": [int(c) for c in touched]}
    )


def _recover_cells_backup(cells_dir: str) -> None:
    """Self-heal a crashed delete: a leftover intent journal means the
    rewrite may have died mid-commit — restore every journaled cell
    dir from its hard-link snapshot (re-runnable: each restore clears
    the target first), then clear the journal. The caller re-runs the
    delete against the restored pre-delete state, which converges."""
    import json as _json

    intent = _cells_intent_path(cells_dir)
    if not os.path.exists(intent):
        return
    with open(intent) as f:
        touched = _json.load(f)["touched"]
    backup = _cells_backup_dir(cells_dir)
    for cid in touched:
        src = os.path.join(backup, f"centroid_id={cid}")
        dst = os.path.join(cells_dir, f"centroid_id={cid}")
        if not os.path.isdir(src):
            continue  # crash before this cell was snapshotted → untouched
        shutil_rmtree_quiet(dst)
        os.makedirs(dst, exist_ok=True)
        for fn in os.listdir(src):
            os.link(os.path.join(src, fn), os.path.join(dst, fn))
    _clear_cells_backup(cells_dir)


def _clear_cells_backup(cells_dir: str) -> None:
    # intent first (its absence means "nothing to recover"), then the
    # now-unreferenced snapshot
    try:
        os.remove(_cells_intent_path(cells_dir))
    except FileNotFoundError:
        pass
    shutil_rmtree_quiet(_cells_backup_dir(cells_dir))


def shutil_rmtree_quiet(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def delete_from_index(
    spark: SparkSession, index_dir: str, doc_ids: list[int]
) -> dict:
    """Compliance deletion (right-to-be-forgotten): remove a set of
    documents from the index IN PLACE.

    Dense side: only the cell directories that actually contain a
    deleted vector are rewritten — dynamic partition overwrite
    (partitionOverwriteMode=dynamic) leaves every other cell's files
    untouched, so the rewrite cost is proportional to the touched
    cells, not the index. Sparse side: postings/doclens are
    filtered-and-rewritten (they are not partitioned by doc — at
    production scale these would be bucketed by a doc-hash prefix to
    get the same touched-bucket-only property; documented tradeoff),
    and the stats table re-derives from the index. The deleted ids are
    broadcast (a deletion batch is small by nature)."""
    import shutil

    ids_df = spark.createDataFrame([(int(i),) for i in doc_ids], "doc_id long")
    cells_dir = os.path.join(index_dir, "cells")
    # Crash recovery FIRST (review r9): the dense rewrite below is a
    # multi-step in-place mutation (dynamic partition overwrite =
    # delete-then-move per touched dir, plus explicit emptied-dir
    # drops) — a crash mid-commit would otherwise lose a cell's
    # SURVIVING vectors from the compliance-critical index with no way
    # back. Before mutating, the touched cell dirs are snapshotted via
    # hard links (O(files) metadata, no data copy — version dirs can't
    # be used here: a `centroid_id=X.v-...` sibling would parse as a
    # partition value and corrupt the root read) and an intent journal
    # is published; a leftover journal means a crashed delete, so the
    # pre-delete state is restored and the delete re-run converges.
    _recover_cells_backup(cells_dir)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        cells = spark.read.parquet(cells_dir)
        touched = [
            r["centroid_id"]
            for r in cells.join(
                F.broadcast(ids_df), cells.vec_id == ids_df.doc_id, "left_semi"
            )
            .select("centroid_id")
            .distinct()
            .collect()
        ]
        if touched:
            kept = cells.filter(F.col("centroid_id").isin(touched)).join(
                F.broadcast(ids_df), cells.vec_id == ids_df.doc_id, "left_anti"
            ).persist()
            # a touched cell whose EVERY vector is deleted produces no
            # rows, and dynamic overwrite only replaces partitions
            # present in the written data — the emptied cell's files
            # would silently survive (a right-to-be-forgotten hole).
            # Drop those partition directories explicitly (the local-FS
            # analog of ALTER TABLE ... DROP PARTITION).
            survivors = {
                r["centroid_id"] for r in kept.select("centroid_id").distinct().collect()
            }
            _backup_cells(cells_dir, touched)
            # dynamic mode: only the centroid_id=... dirs in `kept` rewrite
            kept.select("vec_id", "v", "centroid_id").write.mode(
                "overwrite"
            ).partitionBy("centroid_id").parquet(cells_dir)
            kept.unpersist()
            for cid in set(touched) - survivors:
                shutil.rmtree(
                    os.path.join(cells_dir, f"centroid_id={cid}"),
                    ignore_errors=True,
                )
            _clear_cells_backup(cells_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    for table in ("postings", "doclens"):
        path = os.path.join(index_dir, table)
        kept = spark.read.parquet(path).join(F.broadcast(ids_df), "doc_id", "left_anti")
        # version-dir + symlink publish (streaming/cdc.atomic_overwrite):
        # the new table is fully written from the still-intact old files
        # before the pointer swaps, so neither a crash mid-write nor a
        # recomputed task can ever see (or cause) a destroyed table —
        # the in-place overwrite both risked
        atomic_overwrite(kept, path)
    n_terms = _write_stats(spark, index_dir)
    return {"deleted": len(doc_ids), "touched_cells": len(touched), "n_terms": n_terms}
