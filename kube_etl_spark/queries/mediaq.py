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
