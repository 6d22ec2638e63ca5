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
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

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


FRAME_BYTES = 256
FRAME_STRIDE = 4

FRAME_SAMPLE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_frames", LongType()),
    StructField("n_sampled", LongType()),
    StructField("sample_md5", StringType()),
])


def _frame_sample_batches(iterator: Iterator):
    """Frame sampling over video payloads — the decode step is the
    deterministic fake (fixed-size byte frames); the Spark-side plumbing
    (Arrow batches, binary slicing, per-row vectorizable loop) is the
    real contract. A real codec would replace `_frames` only."""
    import hashlib

    import pandas as pd

    def _frames(body: bytes):
        return [body[i:i + FRAME_BYTES]
                for i in range(0, len(body), FRAME_BYTES)]

    for pdf in iterator:
        out = []
        for row in pdf.itertuples(index=False):
            payload = bytes(row.payload) if row.payload is not None else b""
            body = payload[12:] if _parse_header(payload)[2] else payload
            frames = _frames(body)
            sampled = frames[::FRAME_STRIDE]
            out.append({
                "doc_id": row.doc_id,
                "n_frames": len(frames),
                "n_sampled": len(sampled),
                "sample_md5": hashlib.md5(b"".join(sampled)).hexdigest(),
            })
        yield pd.DataFrame(out, columns=[f.name for f in
                                         FRAME_SAMPLE_SCHEMA.fields])


@register(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(ceil(strlen(text) / {FRAME_BYTES}.0) AS BIGINT) AS n_frames,
           CAST(ceil(ceil(strlen(text) / {FRAME_BYTES}.0)
                     / {FRAME_STRIDE}.0) AS BIGINT) AS n_sampled,
           md5(array_to_string(list_transform(
                 range(0, CAST(ceil(strlen(text) / {FRAME_BYTES}.0) AS BIGINT),
                       {FRAME_STRIDE}),
                 i -> substr(text, 1 + i * {FRAME_BYTES}, {FRAME_BYTES})),
               '')) AS sample_md5
    FROM documents
    WHERE doc_id % 3 = 2
    """,
    tags=("multimodal", "llm-data"),
    doc="Video frame sampling: BINARY payload -> fixed-size frames -> "
        "every 4th frame -> content hash, via Arrow-batched mapInPandas "
        "(the codec is the documented deterministic fake; the batch "
        "plumbing is real). Oracle recomputes from the text the payload "
        "was built from.",
)
def multimodal_frame_sample(spark, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs).filter(
        F.col("media_type") == "video")
    return media.select("doc_id", "payload").mapInPandas(
        _frame_sample_batches, schema=FRAME_SAMPLE_SCHEMA)


RESIZE_FACTOR = 2

RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("new_width", IntegerType()),
    StructField("new_height", IntegerType()),
    StructField("resized_md5", StringType()),
])


def _resize_batches(iterator: Iterator):
    """'Resize' = halve header dimensions + subsample every 2nd body byte
    (nearest-neighbor over the fake 1-byte-per-pixel payload). A real
    image library would replace the body transform only."""
    import hashlib

    import pandas as pd

    for pdf in iterator:
        out = []
        for row in pdf.itertuples(index=False):
            payload = bytes(row.payload) if row.payload is not None else b""
            w, h, ok = _parse_header(payload)
            body = payload[12:] if ok else payload
            resized = body[::RESIZE_FACTOR]
            out.append({
                "doc_id": row.doc_id,
                "width": w, "height": h,
                "new_width": (w or 0) // RESIZE_FACTOR,
                "new_height": (h or 0) // RESIZE_FACTOR,
                "resized_md5": hashlib.md5(resized).hexdigest(),
            })
        yield pd.DataFrame(out, columns=[f.name for f in
                                         RESIZE_SCHEMA.fields])


@register(
    "multimodal_resize",
    oracle=f"""
    SELECT doc_id,
           CAST(strlen(text) % 640 AS INT) AS width,
           CAST(doc_id % 480 AS INT) AS height,
           CAST((strlen(text) % 640) // {RESIZE_FACTOR} AS INT) AS new_width,
           CAST((doc_id % 480) // {RESIZE_FACTOR} AS INT) AS new_height,
           md5(array_to_string(list_transform(
                 range(1, strlen(text) + 1, {RESIZE_FACTOR}),
                 i -> substr(text, CAST(i AS BIGINT), 1)), '')) AS resized_md5
    FROM documents
    WHERE doc_id % 3 = 0
    """,
    tags=("multimodal", "llm-data"),
    doc="Image resize stub over image payloads: header dims halved, body "
        "subsampled (every 2nd byte) and re-hashed — mapInPandas batch "
        "plumbing real, codec faked deterministically.",
)
def multimodal_resize(spark, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs).filter(
        F.col("media_type") == "image")
    return media.select("doc_id", "payload").mapInPandas(
        _resize_batches, schema=RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Audio feature extraction (numpy-vectorized over the binary payload)
# ---------------------------------------------------------------------------

AUDIO_WINDOW = 256       # bytes per analysis window
AUDIO_ACTIVE_MEAN = 96   # window is "active" when mean amplitude exceeds

AUDIO_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_samples", LongType()),
    StructField("sum_amplitude", LongType()),
    StructField("peak", LongType()),
    StructField("rms", DoubleType()),
    StructField("n_active_windows", LongType()),
])


def _audio_feature_batches(iterator: Iterator):
    """Per-payload sample statistics — the decode is the deterministic
    fake (body bytes as u8 PCM samples); the numpy path is the real
    contract: one `frombuffer` view per row, vectorized sum/max/square,
    no per-sample Python. A real audio lib would replace only the
    bytes->samples step."""
    import math

    import numpy as np
    import pandas as pd

    for pdf in iterator:
        out = []
        for row in pdf.itertuples(index=False):
            payload = bytes(row.payload) if row.payload is not None else b""
            body = payload[12:] if _parse_header(payload)[2] else payload
            a = np.frombuffer(body, dtype=np.uint8).astype(np.int64)
            n = int(a.size)
            sum_amp = int(a.sum()) if n else 0
            sumsq = int((a * a).sum()) if n else 0
            nw = (n + AUDIO_WINDOW - 1) // AUDIO_WINDOW
            active = 0
            for w in range(nw):
                c = a[w * AUDIO_WINDOW:(w + 1) * AUDIO_WINDOW]
                if int(c.sum()) > AUDIO_ACTIVE_MEAN * c.size:
                    active += 1
            out.append({
                "doc_id": row.doc_id,
                "n_samples": n,
                "sum_amplitude": sum_amp,
                "peak": int(a.max()) if n else 0,
                "rms": math.sqrt(sumsq / n) if n else 0.0,
                "n_active_windows": active,
            })
        yield pd.DataFrame(out, columns=[f.name for f in
                                         AUDIO_FEATURES_SCHEMA.fields])


# ord() == byte value because the synthetic corpus is ASCII; a non-ASCII
# corpus would need the oracle to fold utf-8 bytes instead.
_SQL_AUDIO_BYTES = ("list_transform(range(1, strlen(text) + 1), "
                    "i -> CAST(ord(substr(text, i, 1)) AS BIGINT))")


@register(
    "multimodal_audio_features",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, {_SQL_AUDIO_BYTES} AS bs,
             CAST(strlen(text) AS BIGINT) AS n
      FROM documents WHERE doc_id % 3 = 1)
    SELECT doc_id, n AS n_samples,
           CAST(list_reduce(list_prepend(0::BIGINT, bs),
                            (a, v) -> a + v) AS BIGINT) AS sum_amplitude,
           CAST(list_max(bs) AS BIGINT) AS peak,
           sqrt(list_reduce(list_prepend(0::BIGINT,
                  list_transform(bs, x -> x * x)), (a, v) -> a + v)
                / n) AS rms,
           CAST(list_reduce(list_prepend(0::BIGINT,
             list_transform(range(0, CAST(ceil(n / {AUDIO_WINDOW}.0) AS BIGINT)),
               w -> CASE WHEN
                 list_reduce(list_prepend(0::BIGINT,
                   bs[(w * {AUDIO_WINDOW} + 1):least((w + 1) * {AUDIO_WINDOW}, n)]),
                   (a, v) -> a + v)
                 > {AUDIO_ACTIVE_MEAN} * (least((w + 1) * {AUDIO_WINDOW}, n)
                                          - w * {AUDIO_WINDOW})
               THEN 1 ELSE 0 END)), (a, v) -> a + v) AS BIGINT)
             AS n_active_windows
    FROM b
    """,
    tags=("multimodal", "llm-data", "audio"),
    doc="Audio feature extraction over audio payloads: u8 samples -> "
        "count/sum/peak/RMS + active-window detection (256-byte windows "
        "above a mean-amplitude gate). numpy frombuffer vectorization "
        "per Arrow batch; codec faked deterministically like the "
        "image/video ops. RMS = sqrt(sumsq/n) is integer arithmetic "
        "until one IEEE division + sqrt, so it is cross-engine exact.",
)
def multimodal_audio_features(spark, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs).filter(
        F.col("media_type") == "audio")
    return media.select("doc_id", "payload").mapInPandas(
        _audio_feature_batches, schema=AUDIO_FEATURES_SCHEMA)
