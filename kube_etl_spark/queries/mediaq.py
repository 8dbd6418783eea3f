"""Multimodal-column queries (SURVEY.md §2.10 extension surface).

The payload plumbing is real (binary column → Arrow-batched mapInPandas
decode); the codec is the deterministic fake from media.py, which is
what lets DuckDB reproduce the features from the source text and keep
these exact-checked rather than rows-only. See media.py for the
NotImplementedError seam where a real codec plugs in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import media
from ..catalog import load_table
from ..registry import query


@query(
    "q_media_features",
    tags=("L6", "media"),
    oracle="""
SELECT doc_id AS media_id,
       'image' AS media_type,
       octet_length(encode(text)) AS n_bytes,
       CAST(octet_length(encode(text)) % 64 + 1 AS INTEGER) AS width,
       CAST(octet_length(encode(text)) % 37 + 1 AS INTEGER) AS height,
       CAST(octet_length(encode(text)) % 1000 AS INTEGER) AS duration_ms,
       CAST(list_sum(list_transform(range(1, least(length(text), 16) + 1),
                                    i -> ascii(substr(text, i, 1)))) AS BIGINT)
         AS checksum
FROM documents
WHERE doc_id < 100
ORDER BY media_id
""",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode: binary payload → typed features through the
    mapInPandas decoder (Arrow batches; fake codec, byte-derived)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return media.decode_features(media.attach_payload(docs)).orderBy("media_id")


@query(
    "q_media_frames",
    tags=("L6", "media"),
    oracle="""
SELECT d.doc_id AS media_id,
       CAST(t.k AS INTEGER) AS frame_idx,
       CAST(t.k * 250 AS INTEGER) AS frame_ts_ms
FROM (SELECT doc_id, octet_length(encode(text)) % 1000 AS dur
      FROM documents WHERE doc_id < 50) d,
     LATERAL unnest(range(0, greatest(dur // 250, 0) + 1)) AS t(k)
ORDER BY media_id, frame_idx
""",
)
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: 1 media row → N frame rows at a fixed
    stride (table-function fan-out over the decoded duration)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return media.frame_sample(media.attach_payload(docs, "video"), every_ms=250).orderBy(
        "media_id", "frame_idx"
    )


@query(
    "q_media_neardup",
    tags=("L6", "L2", "media"),
    bench=True,
    oracle=f"""
WITH docs AS (
  SELECT doc_id AS media_id, text FROM documents WHERE doc_id < 120
  UNION ALL
  SELECT doc_id + 100000, text || ' v2' FROM documents
  WHERE doc_id < 120 AND doc_id % 10 = 0
),
hx AS (
  SELECT media_id, hex(encode(text)) AS h FROM docs
  WHERE length(hex(encode(text))) >= 16
),
sh AS (
  SELECT DISTINCT media_id, substr(h, 1 + 16 * i.k, 16) AS s
  FROM hx, LATERAL unnest(range(0, length(h) // 16)) AS i(k)
),
th AS (
  SELECT media_id,
         CAST(CAST(('0x' || substr(md5(s), 1, 8)) AS UBIGINT) AS BIGINT) AS hv
  FROM sh
),
bits AS (
  SELECT media_id, b.bit,
         SUM(CASE WHEN (hv >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS sm
  FROM th, (SELECT unnest(range(0, 32)) AS bit) b
  GROUP BY media_id, b.bit
),
sig AS (
  SELECT media_id,
         CAST(SUM(CASE WHEN sm > 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS sig
  FROM bits GROUP BY media_id
),
band AS (
  SELECT media_id, sig,
         {media.SIMHASH_BAND_SQL[0]} AS b0,
         {media.SIMHASH_BAND_SQL[1]} AS b1,
         {media.SIMHASH_BAND_SQL[2]} AS b2,
         {media.SIMHASH_BAND_SQL[3]} AS b3
  FROM sig
),
cand AS (
  SELECT a.media_id AS x, a.sig AS sa, b.media_id AS y, b.sig AS sb
  FROM band a JOIN band b ON a.b0 = b.b0 AND a.media_id < b.media_id
  UNION
  SELECT a.media_id, a.sig, b.media_id, b.sig
  FROM band a JOIN band b ON a.b1 = b.b1 AND a.media_id < b.media_id
  UNION
  SELECT a.media_id, a.sig, b.media_id, b.sig
  FROM band a JOIN band b ON a.b2 = b.b2 AND a.media_id < b.media_id
  UNION
  SELECT a.media_id, a.sig, b.media_id, b.sig
  FROM band a JOIN band b ON a.b3 = b.b3 AND a.media_id < b.media_id
)
SELECT x AS media_a, y AS media_b,
       CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(sa, sb)) <= 4
ORDER BY media_a, media_b
""",
)
def q_media_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6/L2 (EXT, round 7 — VERDICT r6 #7b): binary-payload near-dup
    SCREEN — byte-shingle SimHash over the opaque `binary` media
    column, extending the dedup family to multimodal payloads with no
    codec at all (the screen never interprets the bytes). The fixture
    plants near-duplicate binaries (every 10th payload re-encoded with
    a 3-byte tail change — an EXIF-style perturbation); the screen
    surfaces the plants whose flip count stays inside the banded
    Hamming budget (12/12, 8/12, 12/12 at the three fixture SFs — the
    misses are the shortest payloads, where one edited shingle is a
    large feature-fraction; the measured recall/precision table across
    signature widths is docs/architecture.md §round-7) and pairs no
    unrelated payloads.

    Pipeline: payload → hex → non-overlapping 8-byte shingles →
    md5-derived 32-bit shingle hashes (cross-engine exact) → 32-bit
    SimHash by bit vote → FOUR 16-bit band keys (lo/hi/even/odd) →
    band-keyed candidate self-joins → Hamming ≤ 4 verdict via
    bit_count(xor). The signature width, band layout, and threshold
    are MEASURED choices — docs/architecture.md §round-7 tabulates the
    16-bit and 32-bit variants at 52k payloads (recall vs candidate
    volume vs junk-verdict load); media.simhash_screen is the single
    shared implementation, and the band-key SQL is generated once
    (media.SIMHASH_BAND_SQL) so this oracle evaluates bit-identical
    expressions.

    Scale shape: linear scan + two keyed aggregations build the
    signature table (8 bytes/payload — 100 TB of media becomes ~GBs of
    signatures); candidates come from band-keyed equi-joins (never
    all-pairs — the LSH banding argument); the Hamming check is a
    map-side bit op on the joined row. Any Hamming ≤ 3 pair that
    matches no band must scatter its flips across the lo/hi split AND
    the even/odd split simultaneously.

    Determinism: md5-derived hashes, integer bit votes (sign ties → 0
    in both engines), bit_count/xor/shift all integer-exact; hex() is
    uppercase in both engines."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 120)
        .select("doc_id", "text")
    )
    variants = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" v2")).alias("text"),
    )
    payloads = docs.unionByName(variants).select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return media.simhash_screen(payloads, hamming_max=4).orderBy(
        "media_a", "media_b"
    )


@query(
    "q_media_dedup_exact",
    tags=("L6", "L1", "media"),
    oracle="""
WITH docs AS (
  SELECT doc_id AS media_id, text FROM documents WHERE doc_id < 150
  UNION ALL
  SELECT doc_id + 200000, text FROM documents
  WHERE doc_id < 150 AND doc_id % 7 = 0
),
hashed AS (
  SELECT media_id, md5(hex(encode(text))) AS content_md5,
         octet_length(encode(text)) AS n_bytes
  FROM docs
)
SELECT content_md5,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(MIN(media_id) AS BIGINT) AS canonical_id,
       CAST((COUNT(*) - 1) * MIN(n_bytes) AS BIGINT) AS wasted_bytes
FROM hashed
GROUP BY content_md5
HAVING COUNT(*) > 1
ORDER BY canonical_id
""",
)
def q_media_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6/L1 (EXT, round 7): EXACT binary dedup — the multimodal twin
    of q_dedup_exact: group opaque payloads by content hash (md5 over
    the hex encoding, byte-exact and codec-free), keep the minimum id
    as canonical, and report the storage the duplicates waste. The
    fixture plants byte-identical copies (every 7th payload re-ingested
    under a new id — the re-crawled-asset case).

    Scale shape: ONE content-hash-keyed shuffle (partial-aggregated
    map-side), no joins, no pair space — the same plan at 100 TB of
    media, where the hash (16 bytes) shuffles instead of the payload.

    Determinism: md5 over the uppercase hex of the payload bytes is
    identical in both engines (DuckDB's md5 takes VARCHAR only, so
    both engines hash the hex string); counts/sizes exact integers."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", "text")
    )
    copies = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    payloads = docs.unionByName(copies).select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    hashed = payloads.select(
        "media_id",
        F.md5(F.hex("payload")).alias("content_md5"),
        F.length("payload").cast("bigint").alias("n_bytes"),
    )
    return (
        hashed.groupBy("content_md5")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.min("media_id").cast("bigint").alias("canonical_id"),
            ((F.count(F.lit(1)) - 1) * F.min("n_bytes"))
            .cast("bigint")
            .alias("wasted_bytes"),
        )
        .filter(F.col("n_copies") > 1)
        .orderBy("canonical_id")
    )
