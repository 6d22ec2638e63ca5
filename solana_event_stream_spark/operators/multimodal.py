"""Multimodal columns: image/audio/video as opaque BINARY columns with
typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio libraries, so the actual codec work is
STUBBED (clearly marked below): `decode_image` raises NotImplementedError
unless PIL is importable, and the pipeline uses a deterministic
header-parse fake instead. What IS real and tested end-to-end:

- the BINARY payload column + typed metadata struct schema,
- the Arrow batch path through mapInPandas (batch shape, binary
  round-trip, per-batch vectorized work),
- partitioning: payloads are processed where they live (narrow), with
  `spark.sql.execution.arrow.maxRecordsPerBatch` bounding batch memory —
  the setting that matters when a row carries megabytes of media.

Payload format (deterministic fake "media"): 12-byte header
``MMB1 | u32 width | u32 height`` followed by the UTF-8 "pixels".
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

from ..catalog import register
from ..tables import load_table

MAGIC = b"MMB1"

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("payload", BinaryType()),
])

MEDIA_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("content_md5", StringType()),
    StructField("valid_header", IntegerType()),
])


def decode_image(payload: bytes):
    """Real image decode — STUB. The Spark-side plumbing around this
    function (schema, batching, partitioning) is real and tested; the
    codec itself needs an image library not present in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires PIL; container ships without it — "
            "payload headers are parsed by _parse_header instead") from exc
    raise NotImplementedError("wire PIL decode here when available")


def _parse_header(payload: bytes):
    """Deterministic fake 'decode': parse the MMB1 header."""
    if payload is None or len(payload) < 12 or payload[:4] != MAGIC:
        return None, None, 0
    w, h = struct.unpack("<II", payload[4:12])
    return w, h, 1


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """documents -> media table: deterministic payload built from text.

    header: MMB1 | width = n_chars % 640 | height = (doc_id % 480) ;
    body: utf-8 text bytes.
    """
    width = (F.length("text") % 640).cast("int")
    height = (F.col("doc_id") % 480).cast("int")

    def le_u32_bin(col):
        # little-endian u32 as BINARY, JVM-side: hex -> byte-swap -> unhex
        hx = F.lpad(F.hex(col.cast("long")), 8, "0")
        return F.unhex(F.concat(
            F.substring(hx, 7, 2), F.substring(hx, 5, 2),
            F.substring(hx, 3, 2), F.substring(hx, 1, 2)))

    header = F.concat(F.lit(MAGIC), le_u32_bin(width), le_u32_bin(height))
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video").alias("media_type"),
        F.concat(header, F.encode(F.col("text"), "utf-8")).alias("payload"),
        width.alias("width"), height.alias("height"))


def _extract_batches(iterator: Iterator):
    import hashlib

    import pandas as pd
    for pdf in iterator:
        out = []
        for row in pdf.itertuples(index=False):
            payload = bytes(row.payload) if row.payload is not None else b""
            w, h, ok = _parse_header(payload)
            body = payload[12:] if ok else payload
            out.append({
                "doc_id": row.doc_id, "media_type": row.media_type,
                "n_bytes": len(payload), "width": w, "height": h,
                "content_md5": hashlib.md5(body).hexdigest(),
                "valid_header": ok,
            })
        yield pd.DataFrame(
            out, columns=[f.name for f in MEDIA_META_SCHEMA.fields])


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the BINARY column."""
    return media.select("doc_id", "media_type", "payload").mapInPandas(
        _extract_batches, schema=MEDIA_META_SCHEMA)


@register(
    "multimodal_metadata_extract",
    oracle="""
    SELECT media_type, COUNT(*) AS n_media,
           CAST(SUM(strlen(text) + 12) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT md5(text)) AS n_distinct_payloads,
           CAST(SUM(length(text) % 640) AS BIGINT) AS sum_width,
           CAST(SUM(doc_id % 480) AS BIGINT) AS sum_height
    FROM (
      SELECT doc_id, text,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type
      FROM documents) t
    GROUP BY media_type
    """,
    tags=("multimodal", "llm-data"),
    doc="Binary media column -> mapInPandas header parse + content hash; "
        "oracle recomputes the deterministic payload stats from text.",
)
def multimodal_metadata_extract(spark, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    meta = extract_media_metadata(media)
    return (meta.groupBy("media_type")
            .agg(F.count(F.lit(1)).alias("n_media"),
                 F.sum("n_bytes").alias("total_bytes"),
                 F.countDistinct("content_md5").alias("n_distinct_payloads"),
                 F.sum("width").alias("sum_width"),
                 F.sum("height").alias("sum_height")))
