"""Multimodal plumbing tests: the Arrow mapInPandas pipeline shapes
(decode → resize → frame-sample → audio features), the real-codec seam,
and determinism of the fake codec across partitionings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kube_etl_spark import media
from kube_etl_spark.catalog import load_table

from .conftest import SMOKE_SF


@pytest.fixture()
def payloads(spark):
    docs = load_table(spark, SMOKE_SF, "documents").filter(F.col("doc_id") < 50)
    return media.attach_payload(docs)


def test_decode_deterministic_across_partitionings(spark, payloads):
    one = {r["media_id"]: (r["width"], r["height"], r["checksum"])
           for r in media.decode_features(payloads.repartition(1)).collect()}
    many = {r["media_id"]: (r["width"], r["height"], r["checksum"])
            for r in media.decode_features(payloads.repartition(7)).collect()}
    assert one == many


def test_resize_bounds_payload(spark, payloads):
    out = media.resize(payloads, max_dim=32).collect()
    orig = {r["media_id"]: r["payload"] for r in payloads.collect()}
    assert len(out) == len(orig)
    for r in out:
        assert 1 <= r["n_bytes"] <= len(orig[r["media_id"]])
        # payload is a prefix of the original (fake-codec contract)
        assert bytes(orig[r["media_id"]])[: r["n_bytes"]] == bytes(r["payload"])


def test_audio_features_schema_and_ranges(spark, payloads):
    rows = media.audio_features(payloads).collect()
    assert len(rows) == 50
    for r in rows:
        assert 0 <= r["duration_ms"] < 1000
        assert r["sample_rate"] in (16000, 22050, 44100)
        assert 0.0 <= r["mean_amplitude"] <= 1.0


def test_real_codec_seam_is_marked(spark, payloads):
    with pytest.raises(NotImplementedError):
        media.decode_features(payloads, codec="real")
    with pytest.raises(NotImplementedError):
        media.resize(payloads, codec="real")
    with pytest.raises(NotImplementedError):
        media.audio_features(payloads, codec="real")


def test_frame_sample_counts(spark, payloads):
    frames = media.frame_sample(payloads, every_ms=250)
    counts = {r["media_id"]: r["n"] for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    feats = {r["media_id"]: r["duration_ms"] for r in media.decode_features(payloads).collect()}
    for mid, dur in feats.items():
        assert counts[mid] == dur // 250 + 1


def test_byte_jaccard_verify_exact_and_filtering(spark):
    """byte_jaccard_verify keeps pairs by EXACT distinct-shingle
    Jaccard: identical payloads → j4=10000, a small tail edit stays
    near 10000, disjoint payloads are dropped; sub-shingle payloads
    never reach the output (no shingle set to verify)."""
    from pyspark.sql import functions as F

    from kube_etl_spark.media import byte_jaccard_verify

    base = "0123456789abcdef" * 4  # 64 bytes = 8 distinct-ish shingles
    payloads = spark.createDataFrame(
        [
            (1, base),
            (2, base),               # identical → J = 1
            (3, base + "ZZZZZZZZ"),  # one extra shingle → J = 8/9... (dedup'd shingles)
            (4, "Z" * 64),           # disjoint content
            (5, "tiny"),             # < 8 bytes: no shingles
        ],
        "media_id long, t string",
    ).select("media_id", F.encode("t", "utf-8").alias("payload"))
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5)], "media_a long, media_b long"
    )
    got = {
        (r["media_a"], r["media_b"]): r["j4"]
        for r in byte_jaccard_verify(pairs, payloads, j4_threshold=5000).collect()
    }
    assert got[(1, 2)] == 10000
    assert (1, 3) in got and 5000 <= got[(1, 3)] < 10000
    assert (1, 4) not in got          # disjoint → below threshold
    assert (1, 5) not in got          # unshingleable side → no row
