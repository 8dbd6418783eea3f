"""Multimodal (image/audio/video) column support — BASELINE.json's
mandated extension surface. No reference analog (the reference syncs
Kubernetes objects only).

Model: media lives in DataFrames as an opaque `binary` payload column
plus typed metadata (media_type, byte length, decoded features). The
decode/feature-extract/resize/frame-sample operators run as Arrow-
batched `mapInPandas` passes — the Spark-side plumbing (schema,
batching, partitioning) is real and tested; the actual codec calls are
STUBBED because no image/audio library ships in this container:

  * `decode_features(..., codec="fake")` (default) — a deterministic
    byte-derived fake decoder, so the whole pipeline is exactly
    reproducible and oracle-checkable.
  * `codec="real"` — raises NotImplementedError at the exact call site
    where PIL/libav decoding would plug in.

Scale notes: binary payloads ride the scan; mapInPandas streams Arrow
batches so a 100 MB image row never materializes per-row Python
objects. Feature extraction is embarrassingly parallel — no shuffle at
all; downstream joins happen on the compact metadata, never the bytes
(project the binary column away before any shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURES_SCHEMA = (
    "media_id long, media_type string, n_bytes long, "
    "width int, height int, duration_ms int, checksum long"
)


def attach_payload(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Fixture adapter: treat each document's utf-8 bytes as an opaque
    media payload (the fixtures ship no real binaries)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic pseudo-features (width, height, duration_ms,
    checksum). Sizes derive from BYTE length; the checksum sums the
    first 16 CODEPOINTS of the utf-8 decode — chosen so a SQL oracle
    can reproduce every field from the source text for any content
    (octet_length(encode(text)) / ascii(substr(text, i, 1))), not just
    ASCII where bytes and codepoints coincide."""
    n = len(payload)
    checksum = sum(ord(ch) for ch in payload.decode("utf-8", errors="replace")[:16])
    return (n % 64 + 1, n % 37 + 1, n % 1000, checksum)


def decode_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode each payload into typed features via mapInPandas (one
    Arrow batch per Python call). codec='real' marks where PIL/libav
    would be wired in."""
    if codec == "real":
        raise NotImplementedError(
            "real image/audio decoding needs PIL/libav, not shipped in "
            "this container; plug the codec into _decode_batch below"
        )

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].str.len().astype("int64"),
                    "width": feats.str[0].astype("int32"),
                    "height": feats.str[1].astype("int32"),
                    "duration_ms": feats.str[2].astype("int32"),
                    "checksum": feats.str[3].astype("int64"),
                }
            )

    return media.mapInPandas(_decode_batch, MEDIA_FEATURES_SCHEMA)


def resize(media: DataFrame, max_dim: int = 32, codec: str = "fake") -> DataFrame:
    """Image resize: payload → payload' with target dimensions. The fake
    codec truncates bytes proportionally (deterministic); a real codec
    would decode-scale-reencode at the marked seam. Output schema keeps
    the payload opaque-binary + typed size metadata, so downstream ops
    are codec-agnostic."""
    if codec == "real":
        raise NotImplementedError(
            "real resize needs PIL; plug into _resize_batch below"
        )

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def _shrink(payload: bytes) -> bytes:
                w, h, _, _ = _fake_decode(payload)
                scale = min(1.0, max_dim / max(w, h))
                keep = max(1, int(len(payload) * scale))
                return payload[:keep]

            out = pdf["payload"].map(_shrink)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                    "n_bytes": out.str.len().astype("int64"),
                }
            )

    return media.mapInPandas(
        _resize_batch,
        "media_id long, media_type string, payload binary, n_bytes long",
    )


def audio_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Audio feature extraction (duration, sample-rate, loudness proxy).
    Fake codec derives them from bytes; the real seam would call
    soundfile/libav."""
    if codec == "real":
        raise NotImplementedError("real audio decode needs libav/soundfile")

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].str.len()
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_ms": (n % 1000).astype("int32"),
                    "sample_rate": ((n % 3).map({0: 16000, 1: 22050, 2: 44100})).astype("int32"),
                    "mean_amplitude": pdf["payload"]
                    .map(lambda b: (sum(b[:32]) / max(1, len(b[:32]))) / 255.0)
                    .astype("float64"),
                }
            )

    return media.mapInPandas(
        _feat, "media_id long, duration_ms int, sample_rate int, mean_amplitude double"
    )


def frame_sample(media: DataFrame, every_ms: int = 250, codec: str = "fake") -> DataFrame:
    """Video frame sampling: 1 row → N frame rows (media_id, frame_idx,
    frame_ts_ms). The fake codec derives the frame count from the fake
    duration; a real codec would emit decoded frame payloads."""
    feats = decode_features(media, codec=codec)
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.floor(F.col("duration_ms") / every_ms), F.lit(0)))
        ).alias("frame_idx"),
        "duration_ms",
    ).select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("frame_idx") * every_ms).cast("int").alias("frame_ts_ms"),
    )


# Band-key expressions for the 32-bit SimHash screen, shared verbatim
# with the DuckDB oracle in queries/mediaq.py (generated once so both
# engines evaluate the exact same integer expression). Bands: low 16
# bits, high 16 bits, the 16 even-position bits, the 16 odd-position
# bits — a pair is a candidate if ANY band matches, so a missed pair
# must scatter its flipped bits across the lo/hi split AND the
# even/odd split (measured recall in docs/architecture.md §round-7).
SIMHASH_BAND_SQL = (
    "sig & 65535",
    "sig >> 16",
    " + ".join(f"(((sig >> {2 * i}) & 1) * {1 << i})" for i in range(16)),
    " + ".join(f"(((sig >> {2 * i + 1}) & 1) * {1 << i})" for i in range(16)),
)


def shingle_sets(payloads: DataFrame) -> DataFrame:
    """(media_id, s): each payload's DISTINCT non-overlapping 8-byte
    shingle set as an array of 16-hex-char strings; payloads under one
    shingle (8 bytes) are excluded. The SINGLE shingle definition both
    the SimHash screen (simhash_signatures) and the exact-verify tier
    (byte_jaccard_verify) build on — screen and verify desynchronizing
    on window width/stride would silently corrupt verdicts (review
    r7), the same one-implementation discipline SIMHASH_BAND_SQL
    applies to the band keys."""
    hx = payloads.select("media_id", F.hex("payload").alias("h")).filter(
        F.length("h") >= 16
    )
    return hx.select(
        "media_id",
        F.array_distinct(
            F.expr(
                "transform(sequence(0, CAST(length(h) DIV 16 AS INT) - 1), "
                "i -> substr(h, 1 + 16 * i, 16))"
            )
        ).alias("s"),
    )


def simhash_signatures(payloads: DataFrame) -> DataFrame:
    """32-bit byte-shingle SimHash signature per payload: (media_id,
    sig). Payloads shorter than 8 bytes (one shingle) are excluded —
    nothing to sign. Shared by simhash_screen and the scale-truth
    harness, so measured constants apply to the shipped code.

    Width choice is measured (docs/architecture.md §round-7): a 16-bit
    signature collides by chance at Hamming ≤ 3 for ~0.3% of arbitrary
    pairs — 4.5M junk pairs at 52k payloads; 32 bits cut the chance
    load ~300× at the same wall clock. Wider still (64-bit) would push
    the honest threshold past the banding budget for payloads this
    small (~40 shingles), where a 1-shingle edit already flips ~2-4
    of 32 bits."""
    # Kept the explode-and-shuffle form ON MEASUREMENT: a zero-shuffle
    # map-side rewrite (F.aggregate fold building the 32-wide vote
    # accumulator via zip_with per shingle) is value-identical but ran
    # 16.5 s vs ~14 s at 52k payloads — higher-order-function lambdas
    # are interpreted (no whole-stage codegen) and allocate a fresh
    # 32-long array per shingle step, costing more than the codegen'd
    # hash aggregations save in shuffle (measured r7; contrast with the
    # minhash fold, where the fold REPLACED k materialized arrays and
    # won ~2×). The two aggregations below stay inside codegen.
    sh = shingle_sets(payloads).select(
        "media_id", F.explode("s").alias("s")
    )
    th = sh.select(
        "media_id",
        F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("bigint").alias("hv"),
    )
    bits = (
        th.select(
            "media_id", "hv", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("bit")
        )
        .withColumn(
            "contrib",
            F.when(F.expr("(hv >> bit) & 1") == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        .groupBy("media_id", "bit")
        .agg(F.sum("contrib").alias("sm"))
    )
    return bits.groupBy("media_id").agg(
        F.sum(
            F.when(F.col("sm") > 0, F.expr("CAST(pow(2, bit) AS BIGINT)")).otherwise(
                F.lit(0)
            )
        ).alias("sig")
    )


def simhash_screen(payloads: DataFrame, hamming_max: int = 4) -> DataFrame:
    """Binary-payload near-dup SCREEN shared by q_media_neardup and the
    scale-truth harness (jobs/scale_truth.py --mediasim) — one
    implementation, so the measured constants apply to the code the
    query actually runs (the incremental_screen precedent).

    payloads: (media_id, payload binary). Returns candidate near-dup
    pairs (media_a, media_b, hamming) with media_a < media_b and
    Hamming(simhash32) <= hamming_max, unsorted.

    Design chosen by measurement at 52k payloads with planted 3-byte
    perturbations (full table in docs/architecture.md §round-7): the
    16-bit/2×8-band form had the best raw recall (.92) but drowned the
    verify stage in chance collisions (12.1M candidates, 4.55M junk
    verdicts); this 32-bit/4-band form keeps ~.87 recall on the
    adversarially short fixture payloads at 43× fewer candidates and
    ~300× fewer junk verdicts — and on realistic media (KB-MB payloads,
    thousands of shingles) a small edit flips proportionally fewer
    bits, so recall only improves with payload size.

    Pipeline and scale shape: payload -> uppercase hex ->
    non-overlapping 8-byte shingles (distinct per payload) ->
    md5-derived 32-bit shingle hashes -> 32-bit SimHash by bit vote ->
    FOUR 16-bit band keys (lo/hi/even/odd — any match makes a
    candidate, so a miss must scatter flips across BOTH splits) ->
    ONE (band_id, band_key)-keyed candidate self-join over the exploded
    band views (never all-pairs) -> map-side Hamming via
    bit_count(xor). The signature table is 8 bytes/payload (100 TB of
    media becomes ~GBs of signatures) and is eagerly checkpointed once
    (it feeds both join inputs, launched concurrently).

    Single-join-path by design (r9): the first form unioned FOUR
    same-shape broadcast self-joins (one per band view) — exactly the
    twin-broadcast-union shape that non-deterministically dropped a
    row on first execution under load in q_rule_change_audit (r8
    pitfall ledger; now fenced by tests/test_planlint.py). Exploding
    sig -> 4 (band_id, band_key) rows and joining ONCE on the compound
    key removes the hazard and is the better 100 TB plan anyway: one
    exchange partitioned by (band_id, band_key) instead of four
    band-keyed joins over the same table."""
    band = simhash_signatures(payloads).select(
        "media_id",
        "sig",
        F.posexplode(
            F.array(*[F.expr(b) for b in SIMHASH_BAND_SQL])
        ).alias("band_id", "band_key"),
    ).localCheckpoint(eager=True)
    cand = (
        band.alias("a")
        .join(
            band.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("x"),
            F.col("a.sig").alias("sa"),
            F.col("b.media_id").alias("y"),
            F.col("b.sig").alias("sb"),
        )
    )
    return (
        cand.distinct()
        .withColumn("hamming", F.expr("CAST(bit_count(sa ^ sb) AS BIGINT)"))
        .filter(F.col("hamming") <= hamming_max)
        .select(F.col("x").alias("media_a"), F.col("y").alias("media_b"), "hamming")
    )


def byte_jaccard_verify(
    pairs: DataFrame, payloads: DataFrame, j4_threshold: int = 5000
) -> DataFrame:
    """VERIFY stage for the SimHash screen's candidates — the binary
    twin of the text pipeline's lsh_estimate_verify: exact Jaccard over
    each payload's DISTINCT 8-byte shingle set, keeping pairs with
    J ≥ j4_threshold/10⁴. The screen bounds the pair space; this bounds
    the verdict error (a 32-bit signature still passes ~1e-5 of
    arbitrary pairs at Hamming ≤ 4 — measured: 20k junk pairs at 52k
    payloads, 0 after verify; docs/architecture.md §round-7b).

    pairs: (media_a, media_b, ...); payloads: (media_id, payload).
    Returns (media_a, media_b, j4) — J in basis points, exact integer
    arithmetic (DIV), no float ties.

    Scale shape: two pair-keyed joins against the shingle-set table
    (shingle sets are |payload|/8 longs per doc — carried as arrays,
    grouped once per side), intersection/union via array ops on the
    joined row. Work is candidate-pair-sized; the corpus is scanned
    once to build the sets."""
    sets = shingle_sets(payloads)
    j = (
        pairs.select("media_a", "media_b")
        .join(
            sets.select(F.col("media_id").alias("media_a"), F.col("s").alias("sa")),
            "media_a",
        )
        .join(
            sets.select(F.col("media_id").alias("media_b"), F.col("s").alias("sb")),
            "media_b",
        )
        .withColumn(
            "j4",
            F.expr(
                "CAST(size(array_intersect(sa, sb)) * 10000 AS BIGINT) "
                "DIV size(array_union(sa, sb))"
            ),
        )
    )
    return j.filter(F.col("j4") >= j4_threshold).select("media_a", "media_b", "j4")
