"""Fuzzy-dedup quality anchors: the MinHash-LSH path (rows-only in the
oracle contract) is held to the brute-force n-gram Jaccard ground truth
— recall on high-similarity pairs must be total, and reported Jaccard
values must agree exactly (both verify on the same shingle sets)."""

from __future__ import annotations

from kube_etl_spark.registry import all_specs

from .conftest import SMOKE_SF


def test_lsh_recall_of_high_jaccard_pairs(spark):
    """Every pair the brute force scores ≥ 0.6 must be surfaced by the
    LSH pipeline with the identical Jaccard (8 bands × 4 rows ⇒
    P(miss | J≥0.6) = (1-0.6⁴)⁸ ≈ 0.3 per band-structure... bounded by
    the synthesized near-dups at J≈0.9 where P(miss) < 1e-2; the
    deterministic seeds make this exact, not flaky)."""
    specs = all_specs()
    brute = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in specs["q_dedup_ngram_jaccard"].fn(spark, SMOKE_SF).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in specs["q_dedup_fuzzy"].fn(spark, SMOKE_SF).collect()
    }
    high = {p: j for p, j in brute.items() if j >= 0.6}
    assert high, "fixture should contain synthesized near-dup pairs"
    missed = {p: j for p, j in high.items() if p not in lsh}
    assert not missed, f"LSH missed high-J pairs: {missed}"
    for p in high:
        assert lsh[p] == high[p], f"Jaccard disagrees on {p}"


def test_exact_dedup_keeps_lowest_id(spark):
    """The synthesized copies (doc_id+100000) must always lose to the
    original (deterministic winner)."""
    rows = all_specs()["q_dedup_exact"].fn(spark, SMOKE_SF).collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in rows}
    assert all(k < 100000 for k in by_keep), "a copy won a dedup group"
    assert sum(1 for n in by_keep.values() if n == 2) == 50


def test_cluster_canonicals_are_originals(spark):
    """Every synthesized near-dup (id ≥ 200000) must land in the SAME
    component as its source document and can never be canonical (its
    source has a smaller id by construction). The cluster id may be an
    even smaller third doc when two originals are themselves near-dups —
    that's correct component merging, so compare against the source's
    cluster, not the source id."""
    rows = all_specs()["q_dedup_clusters"].fn(spark, SMOKE_SF).collect()
    cluster_of = {r["doc_id"]: r["cluster_id"] for r in rows}
    synth = [r for r in rows if r["doc_id"] >= 200000]
    assert synth, "no synthesized near-dups in the cluster output (test went vacuous)"
    for r in synth:
        assert not r["is_canonical"]
        assert r["cluster_id"] == cluster_of[r["doc_id"] - 200000]


def test_lsh_ann_recall_vs_exact(spark):
    """LSH-bucketed ANN quality: (a) every reported cosine equals the
    exactly-computed cosine for that pair (bucketing prunes candidates,
    it must never distort values); (b) top-1 recall vs the exact
    ranking is at least 50% (8 Rademacher-free Gaussian planes give
    high same-bucket probability for near neighbors). Deterministic —
    hyperplanes are seeded."""
    specs = all_specs()
    exact_rows = specs["q_knn_cosine"].fn(spark, SMOKE_SF).collect()
    from pyspark.sql import functions as F
    from kube_etl_spark.catalog import load_table
    from kube_etl_spark.queries.llm import _dot

    emb = load_table(spark, SMOKE_SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("norm").alias("cn"))
    cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    all_cos = {
        (r["qid"], r["cid"]): r["cos"]
        for r in c.join(F.broadcast(q), F.col("qid") != F.col("cid"))
        .select("qid", "cid", F.round(cos, 4).alias("cos"))
        .collect()
    }
    lsh_rows = specs["q_knn_lsh"].fn(spark, SMOKE_SF).collect()
    assert lsh_rows, "LSH ANN returned nothing"
    for r in lsh_rows:
        assert all_cos[(r["qid"], r["cid"])] == r["cos"]
    exact_top1 = {r["qid"]: r["cid"] for r in exact_rows if r["rank"] == 1}
    lsh_top1 = {r["qid"]: r["cid"] for r in lsh_rows if r["rank"] == 1}
    hits = sum(1 for qid, cid in exact_top1.items() if lsh_top1.get(qid) == cid)
    assert hits * 2 >= len(exact_top1), f"top-1 recall too low: {hits}/{len(exact_top1)}"


def test_ivf_recall_vs_exact(spark):
    """IVF with data-derived k-means centroids: (a) every reported
    cosine equals the exact cosine for that pair (bucket pruning must
    never distort values); (b) top-1 recall vs the exact ranking ≥ 50%
    (nprobe=2, matching q_knn_ivf, bounds recall — queries whose true
    neighbor sits across BOTH probed centroids' boundaries can miss;
    the k-means fit plus the second probe keep that rare)."""
    specs = all_specs()
    from pyspark.sql import functions as F
    from kube_etl_spark.catalog import load_table
    from kube_etl_spark.queries.llm import _dot

    exact_rows = specs["q_knn_cosine"].fn(spark, SMOKE_SF).collect()
    emb = load_table(spark, SMOKE_SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("norm").alias("cn"))
    cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    all_cos = {
        (r["qid"], r["cid"]): r["cos"]
        for r in c.join(F.broadcast(q), F.col("qid") != F.col("cid"))
        .select("qid", "cid", F.round(cos, 4).alias("cos"))
        .collect()
    }
    ivf_rows = specs["q_knn_ivf"].fn(spark, SMOKE_SF).collect()
    assert ivf_rows, "IVF ANN returned nothing"
    for r in ivf_rows:
        assert all_cos[(r["qid"], r["cid"])] == r["cos"]
    exact_top1 = {r["qid"]: r["cid"] for r in exact_rows if r["rank"] == 1}
    ivf_top1 = {r["qid"]: r["cid"] for r in ivf_rows if r["rank"] == 1}
    hits = sum(1 for qid, cid in exact_top1.items() if ivf_top1.get(qid) == cid)
    assert hits * 2 >= len(exact_top1), f"top-1 recall too low: {hits}/{len(exact_top1)}"


def test_chunking_reassembles_to_original(spark):
    """Chunk-coverage invariant: dropping each chunk's 8-token overlap
    (keeping tokens [1..stride] of every chunk, plus the final chunk's
    tail) reconstructs the original token sequence exactly — no token
    lost or duplicated by the windowing."""
    from pyspark.sql import functions as F
    from kube_etl_spark.catalog import load_table

    rows = all_specs()["q_text_chunk"].fn(spark, SMOKE_SF).collect()
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, SMOKE_SF, "documents")
        .filter(F.col("doc_id") < 40)
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        rebuilt: list[str] = []
        for i, c in enumerate(chunks):
            toks = c["chunk_text"].split(" ")
            assert c["n_tokens"] == len(toks)
            # overlap region must agree with what the previous chunk said
            if i < len(chunks) - 1:
                rebuilt.extend(toks[:24])
            else:
                rebuilt.extend(toks)
        assert rebuilt == docs[doc_id], f"doc {doc_id} reassembly mismatch"


def test_ivf_nprobe_recall_monotone_and_exhaustive_limit(spark):
    """The nprobe dial behaves: top-1 recall vs the exact ranking is
    monotone non-decreasing in nprobe, and probing EVERY list
    (nprobe = k) degenerates to brute force — the IVF result equals
    q_knn_cosine's top-3 exactly."""
    from kube_etl_spark.queries.llm import knn_ivf

    specs = all_specs()
    exact_rows = specs["q_knn_cosine"].fn(spark, SMOKE_SF).collect()
    exact_top1 = {r["qid"]: r["cid"] for r in exact_rows if r["rank"] == 1}
    exact_full = {(r["qid"], r["rank"]): (r["cid"], r["cos"]) for r in exact_rows}

    def recall(nprobe):
        rows = knn_ivf(spark, SMOKE_SF, nprobe=nprobe).collect()
        top1 = {r["qid"]: r["cid"] for r in rows if r["rank"] == 1}
        return sum(1 for q, c in exact_top1.items() if top1.get(q) == c), rows

    r1, _ = recall(1)
    r2, _ = recall(2)
    r16, rows16 = recall(16)  # ≥ k for the 500-vector fixture
    assert r1 <= r2 <= r16, (r1, r2, r16)
    assert r16 == len(exact_top1), f"exhaustive probe missed: {r16}/{len(exact_top1)}"
    got_full = {(r["qid"], r["rank"]): (r["cid"], r["cos"]) for r in rows16}
    assert got_full == exact_full


def test_lsh_table_count_recall_monotone(spark):
    """The L dial behaves: because table t's planes are the same for
    every L (prefix of one fixed family), L tables' candidate set is a
    strict superset of L−1's — so top-1 recall vs the exact ranking is
    monotone non-decreasing in the table count."""
    from kube_etl_spark.queries.llm import knn_lsh

    specs = all_specs()
    exact_top1 = {
        r["qid"]: r["cid"]
        for r in specs["q_knn_cosine"].fn(spark, SMOKE_SF).collect()
        if r["rank"] == 1
    }

    def recall(n_tables):
        rows = knn_lsh(spark, SMOKE_SF, n_tables=n_tables).collect()
        top1 = {r["qid"]: r["cid"] for r in rows if r["rank"] == 1}
        return sum(1 for q, c in exact_top1.items() if top1.get(q) == c)

    r1, r4, r10 = recall(1), recall(4), recall(10)
    assert r1 <= r4 <= r10, (r1, r4, r10)
    assert r10 * 2 >= len(exact_top1), f"L=10 recall too low: {r10}/{len(exact_top1)}"


def test_semantic_dedup_recall_vs_exact_pairs(spark):
    """SemDeDup cell pruning: (a) every reported cosine equals the
    exactly-computed cosine for that pair (pruning must never distort
    values); (b) recall of the anchor's exact near-dup pairs
    (q_dedup_embedding, cos ≥ 0.8 on vec_id < 150) is ≥ 50% — pairs
    split across both vectors' top-2 cells are the only legal misses,
    and near-identical vectors land in the same cell almost surely."""
    specs = all_specs()
    exact = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in specs["q_dedup_embedding"].fn(spark, SMOKE_SF).collect()
    }
    assert exact, "fixture should contain embedding near-dup pairs"
    sem = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in specs["q_dedup_semantic"].fn(spark, SMOKE_SF).collect()
    }
    assert sem, "semantic dedup returned nothing"
    # value fidelity on the anchor's id range
    for p, c in sem.items():
        if p in exact:
            assert c == exact[p], f"cosine disagrees on {p}"
    hits = sum(1 for p in exact if p in sem)
    assert hits * 2 >= len(exact), f"pair recall too low: {hits}/{len(exact)}"


def test_quantized_knn_recall_vs_exact_dot(spark):
    """int8 ADC (q_knn_quantized) vs the exact float dot ranking over
    the same probes: top-1 must agree on EVERY probe at fixture scale,
    top-3 set overlap ≥ 27/30, and the quantized score of the top-1
    must sit within 2% of the true dot — the measured fixture numbers
    are 10/10, 29/30, 0.55% (pinned with slack for arithmetic-order
    churn, not for quality regressions)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kube_etl_spark.catalog import load_table
    from kube_etl_spark.registry import all_specs

    from .conftest import SMOKE_SF

    quant = {
        (r["qid"], r["rank"]): (r["cid"], r["adc"])
        for r in all_specs()["q_knn_quantized"].fn(spark, SMOKE_SF).collect()
    }
    emb = load_table(spark, SMOKE_SF, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("pv")
    )
    dot = F.aggregate(
        F.zip_with("pv", "v", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    p = emb.join(F.broadcast(probes), F.col("qid") != F.col("vec_id")).select(
        "qid", F.col("vec_id").alias("cid"), F.round(dot, 4).alias("d")
    )
    w = Window.partitionBy("qid").orderBy(F.col("d").desc(), F.col("cid"))
    exact = {
        (r["qid"], r["rn"]): (r["cid"], r["d"])
        for r in p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .collect()
    }
    assert all(quant[(q, 1)][0] == exact[(q, 1)][0] for q in range(10))
    overlap = sum(
        len({quant[(q, r)][0] for r in (1, 2, 3)} & {exact[(q, r)][0] for r in (1, 2, 3)})
        for q in range(10)
    )
    assert overlap >= 27, f"top-3 overlap collapsed: {overlap}/30"
    for q in range(10):
        t, a = exact[(q, 1)][1], quant[(q, 1)][1]
        assert abs(a - t) <= 0.02 * max(abs(t), 1e-9), (q, a, t)


def test_incremental_screen_batch_independence(spark):
    """The increment screen's verdicts must be INDEPENDENT per
    increment doc: screening two daily batches separately must equal
    screening their union (each verdict depends only on that doc vs
    the corpus — increment docs never compare to each other). This is
    the contract that lets the daily pipeline shard its increment
    arbitrarily."""
    from pyspark.sql import functions as F

    from kube_etl_spark.catalog import load_table
    from kube_etl_spark.queries.llm import (
        _shingles,
        _tokens,
        incremental_screen,
    )

    docs = load_table(spark, SMOKE_SF, "documents").select("doc_id", "text")
    corpus = docs.filter((F.col("doc_id") < 120) & (F.col("doc_id") % 5 != 0))
    inc = docs.filter((F.col("doc_id") < 120) & (F.col("doc_id") % 5 == 0)).unionByName(
        docs.filter((F.col("doc_id") < 40) & (F.col("doc_id") % 5 != 0)).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" qq zz")).alias("text"),
        )
    )
    cs = corpus.select(
        F.col("doc_id").alias("cid"), _shingles(_tokens(F.col("text"))).alias("s")
    )

    def shingle(frame):
        return frame.select(
            F.col("doc_id").alias("iid"), _shingles(_tokens(F.col("text"))).alias("s")
        )

    def rows(df):
        return {
            r["inc_doc_id"]: (r["is_dup"], r["best_match"], r["best_j"])
            for r in df.collect()
        }

    whole = rows(incremental_screen(cs, shingle(inc)))
    half_a = rows(incremental_screen(cs, shingle(inc.filter(F.col("doc_id") % 2 == 0))))
    half_b = rows(incremental_screen(cs, shingle(inc.filter(F.col("doc_id") % 2 == 1))))
    assert {**half_a, **half_b} == whole
