"""Multimodal columns: image/audio/video as opaque BINARY columns with
typed metadata, processed via Arrow-batched mapInPandas.

The media payloads are REAL formats decoded end-to-end with the
pure-stdlib codecs in `imagecodec.py` (the container has no PIL/libjpeg,
but PNG needs only zlib + numpy and BMP/WAV are plain struct layouts):

- **image** payloads are real PNGs (8-bit greyscale, encoded/decoded
  through `imagecodec.encode_png`/`decode_png` — full 5-filter
  unfiltering + CRC verification on the decode side),
- **audio** payloads are real WAV files (canonical RIFF header + 8-bit
  PCM, `imagecodec.encode_wav`/`decode_wav`),
- **video** payloads are real APNGs (animated PNG — acTL/fcTL/fdAT
  chunks over the same zlib/unfilter core,
  `imagecodec.encode_apng`/`decode_apng`): each 256-byte slice of the
  document becomes one 1-row greyscale frame, so "frames" are real
  decoded pixel arrays. The legacy `MMB1` fake container still parses
  as a documented fallback for stored corpora.

Oracle strategy: the synthetic corpus encodes each document's UTF-8
bytes as the media content (PNG pixel strip / PCM samples), and both
codecs are lossless, so statistics over *decoded* pixels/samples equal
statistics over the text bytes — which DuckDB can recompute from the
`documents` table without being able to parse PNG/WAV. The Spark side
genuinely decodes; the oracle checks the decode round-trips.

What the Spark plumbing guarantees (unchanged from the stub era, now
exercised with real codec work inside the batch loop):

- the BINARY payload column + typed metadata struct schema,
- the Arrow batch path through mapInPandas (batch shape, binary
  round-trip, per-batch vectorized work),
- partitioning: payloads are processed where they live (narrow), with
  `spark.sql.execution.arrow.maxRecordsPerBatch` bounding batch memory —
  the setting that matters when a row carries megabytes of media.

The reference engine has no media operators (driver-brief surface), so
there are no reference citations in this module.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

from ..catalog import register
from ..tables import load_table
from .imagecodec import (PNG_SIGNATURE, decode_apng, decode_png, decode_bmp,
                         decode_wav, encode_apng, encode_png, encode_wav,
                         png_canvas_size)

MAGIC = b"MMB1"
AUDIO_SAMPLE_RATE = 8000
FRAME_BYTES = 256    # bytes of text per video frame (1-row APNG strip)
FRAME_STRIDE = 4     # frame-sampling keeps every 4th frame

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("payload", BinaryType()),
])

MEDIA_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("payload_bytes", LongType()),
    StructField("content_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("content_md5", StringType()),
    StructField("decode_ok", IntegerType()),
])


def decode_image(payload: bytes):
    """Decode an image payload into a numpy pixel array.

    Dispatches on magic bytes: PNG (greyscale -> (H, W), RGB ->
    (H, W, 3)) and uncompressed 24-bit BMP are decoded for real by the
    stdlib codecs in `imagecodec.py`; anything else raises ValueError
    (the `MMB1` fake container is handled by `_parse_header`, the
    documented fallback for formats with no stdlib codec).
    """
    if payload is None:
        raise ValueError("payload is NULL")
    payload = bytes(payload)
    if payload[:8] == PNG_SIGNATURE:
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ValueError(
        f"unsupported image format (magic {payload[:4]!r}); "
        "PNG and 24-bit BMP are implemented")


def _parse_header(payload: bytes):
    """Deterministic fake 'decode' for the LEGACY MMB1 container (the
    pre-APNG video stand-in; kept so stored corpora in that format still
    parse)."""
    if payload is None or len(payload) < 12 or payload[:4] != MAGIC:
        return None, None, 0
    w, h = struct.unpack("<II", payload[4:12])
    return w, h, 1


def decode_video_frames(payload: bytes):
    """Decode a video payload into a list of frame pixel arrays.

    APNG (the format `attach_binary_payload` emits) decodes for real —
    every frame is a decoded pixel region. The legacy MMB1 container
    falls back to fixed-size byte slicing of its body (the documented
    pre-APNG stand-in). Raises ValueError for anything else.
    """
    if payload is None:
        raise ValueError("payload is NULL")
    payload = bytes(payload)
    if payload[:8] == PNG_SIGNATURE:
        return decode_apng(payload)
    if payload[:4] == MAGIC:
        import numpy as np
        body = payload[12:]
        return [np.frombuffer(body[i:i + FRAME_BYTES],
                              dtype=np.uint8).reshape(1, -1)
                for i in range(0, len(body), FRAME_BYTES)]
    raise ValueError(
        f"unsupported video format (magic {payload[:4]!r}); "
        "APNG and the legacy MMB1 container are implemented")


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """documents -> media table with REAL payload bytes.

    Synthesizes the media column a real corpus would already have in
    storage (this builder is the test-fixture path, not a production
    operator): each document's UTF-8 bytes become the media content —

    - ``image`` (doc_id % 3 == 0): real PNG, one-row greyscale strip,
      pixels = text bytes (lossless, so pixel stats == byte stats),
    - ``audio`` (doc_id % 3 == 1): real WAV, 8-bit PCM samples = text
      bytes,
    - ``video`` (doc_id % 3 == 2): real APNG — every FRAME_BYTES-byte
      slice of the text becomes one 1-row greyscale frame (the last
      frame narrower when the text doesn't divide evenly), so frame
      extraction downstream decodes real pixel regions.

    Empty documents have no media content in ANY modality: payload is
    NULL and downstream decode skips the row (symmetric across
    image/audio/video).

    Runs as an Arrow-batched mapInPandas stage (PNG/WAV framing needs
    zlib/struct); narrow — no shuffle, payloads are built where the
    document rows live.
    """
    import numpy as np
    import pandas as pd

    def _build(iterator: Iterator):
        for pdf in iterator:
            rows = []
            for row in pdf.itertuples(index=False):
                did = int(row.doc_id)
                body = (row.text or "").encode("utf-8")
                kind = did % 3
                if kind == 0:
                    payload = (encode_png(
                        np.frombuffer(body, np.uint8).reshape(1, -1))
                        if body else None)
                    rows.append((did, "image", payload))
                elif kind == 1:
                    # Symmetric with image: an empty document has no
                    # media content, so the payload is NULL (not a
                    # zero-sample WAV) and downstream decode skips it.
                    payload = (encode_wav(
                        body, sample_rate=AUDIO_SAMPLE_RATE, bits=8)
                        if body else None)
                    rows.append((did, "audio", payload))
                else:
                    frames = [np.frombuffer(body[i:i + FRAME_BYTES],
                                            np.uint8).reshape(1, -1)
                              for i in range(0, len(body), FRAME_BYTES)]
                    payload = encode_apng(frames) if frames else None
                    rows.append((did, "video", payload))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return docs.select("doc_id", "text").mapInPandas(
        _build, schema=MEDIA_SCHEMA)


def _extract_batches(iterator: Iterator):
    """Per-payload metadata via REAL decode: PNG pixels / WAV samples /
    APNG frames (MMB1-header fallback), per media_type. content_md5
    hashes the *decoded* content bytes (pixel strip, PCM samples,
    concatenated frame pixels), so the oracle can recompute it from the
    source text."""
    import hashlib

    import pandas as pd

    for pdf in iterator:
        out = []
        for row in pdf.itertuples(index=False):
            payload = bytes(row.payload) if row.payload is not None else b""
            width = height = None
            content = b""
            ok = 0
            try:
                if row.media_type == "image":
                    px = decode_image(payload)
                    height, width = int(px.shape[0]), int(px.shape[1])
                    content = px.tobytes()
                    ok = 1
                elif row.media_type == "audio":
                    samples, _rate, _ch, _bits = decode_wav(payload)
                    content = samples.tobytes()
                    ok = 1
                elif payload[:4] == MAGIC:
                    # legacy MMB1 corpora: header parse, body as content
                    w, h, ok = _parse_header(payload)
                    width, height = w, h
                    content = payload[12:] if ok else payload
                else:
                    frames = decode_video_frames(payload)
                    # canvas dims from the IHDR, not frames[0]: a
                    # foreign APNG whose default image is outside the
                    # animation (first fcTL after IDAT) has frame-0
                    # region dims != canvas dims
                    width, height = png_canvas_size(payload)
                    content = b"".join(f.tobytes() for f in frames)
                    ok = 1
            except ValueError:
                ok = 0
            out.append({
                "doc_id": row.doc_id, "media_type": row.media_type,
                "payload_bytes": len(payload),
                "content_bytes": len(content),
                "width": width, "height": height,
                "content_md5": hashlib.md5(content).hexdigest(),
                "decode_ok": ok,
            })
        yield pd.DataFrame(
            out, columns=[f.name for f in MEDIA_META_SCHEMA.fields])


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the BINARY column."""
    return media.select("doc_id", "media_type", "payload").mapInPandas(
        _extract_batches, schema=MEDIA_META_SCHEMA)


@register(
    "multimodal_metadata_extract",
    oracle=f"""
    SELECT media_type, COUNT(*) AS n_media,
           CAST(COUNT(*) FILTER (WHERE strlen(text) > 0) AS BIGINT)
             AS n_decoded,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_content_bytes,
           COUNT(DISTINCT md5(text)) AS n_distinct_payloads,
           CAST(SUM(CASE WHEN media_type = 'image' AND strlen(text) > 0
                           THEN strlen(text)
                         WHEN media_type = 'video' AND strlen(text) > 0
                           THEN least(strlen(text), {FRAME_BYTES})
                    END) AS BIGINT) AS sum_width,
           CAST(SUM(CASE WHEN media_type IN ('image', 'video')
                          AND strlen(text) > 0 THEN 1
                    END) AS BIGINT) AS sum_height
    FROM (
      SELECT doc_id, text,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type
      FROM documents) t
    GROUP BY media_type
    """,
    tags=("multimodal", "llm-data"),
    doc="Binary media column -> mapInPandas REAL decode (PNG pixels, "
        "WAV samples, APNG frames for video) + content hash; the codecs "
        "are lossless so the oracle recomputes every aggregate from the "
        "text the payloads encode. Video width/height are the APNG "
        "canvas dims (1-row strip capped at FRAME_BYTES); "
        "sum_width/sum_height are NULL for audio in both engines (WAV "
        "has no spatial dims).",
)
def multimodal_metadata_extract(spark, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    meta = extract_media_metadata(media)
    return (meta.groupBy("media_type")
            .agg(F.count(F.lit(1)).alias("n_media"),
                 F.sum("decode_ok").alias("n_decoded"),
                 F.sum("content_bytes").alias("total_content_bytes"),
                 F.countDistinct("content_md5").alias("n_distinct_payloads"),
                 F.sum("width").alias("sum_width"),
                 F.sum("height").alias("sum_height")))


FRAME_SAMPLE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_frames", LongType()),
    StructField("n_sampled", LongType()),
    StructField("sample_md5", StringType()),
])


def _frame_sample_batches(iterator: Iterator):
    """Frame sampling over REAL decoded video frames: decode_apng
    yields each frame's pixel region (the legacy MMB1 container slices
    bytes, as before), every FRAME_STRIDE-th frame is kept, and the
    sample hash covers the kept frames' pixel bytes. Undecodable/NULL
    payloads (empty-text docs, corrupt foreign files) emit no row,
    matching the oracle's text filter."""
    import hashlib

    import pandas as pd

    for pdf in iterator:
        out = []
        for row in pdf.itertuples(index=False):
            try:
                frames = decode_video_frames(row.payload)
            except ValueError:
                continue
            sampled = frames[::FRAME_STRIDE]
            out.append({
                "doc_id": row.doc_id,
                "n_frames": len(frames),
                "n_sampled": len(sampled),
                "sample_md5": hashlib.md5(
                    b"".join(f.tobytes() for f in sampled)).hexdigest(),
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
    WHERE doc_id % 3 = 2 AND strlen(text) > 0
    """,
    tags=("multimodal", "llm-data"),
    doc="Video frame sampling over REAL APNG payloads: stdlib "
        "acTL/fcTL/fdAT decode -> per-frame pixel regions -> every 4th "
        "frame -> pixel hash, via Arrow-batched mapInPandas. The corpus "
        "encodes each 256-byte text slice as a 1-row greyscale frame "
        "and the codec is lossless, so the oracle recomputes the "
        "sampled hash from text substrings. Empty docs carry NULL "
        "payloads and emit no row (both engines filter them).",
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
    """Nearest-neighbor 2x downscale over REAL decoded PNG pixels:
    decode_image -> pixels[::2, ::2] -> hash of the resized pixel
    bytes. On the 1-row pixel strips the synthetic corpus encodes,
    that is every-2nd-pixel of the strip — which the oracle recomputes
    as every-2nd-character of the source text (the codec is lossless)."""
    import hashlib

    import pandas as pd

    for pdf in iterator:
        out = []
        for row in pdf.itertuples(index=False):
            payload = bytes(row.payload) if row.payload is not None else b""
            try:
                px = decode_image(payload)
            except ValueError:
                # Undecodable payloads (NULL payload for an empty-text
                # doc, or a corrupt foreign file) emit NO row — matching
                # the oracle's `strlen(text) > 0` filter, so Spark and
                # oracle row counts stay aligned even on corpora that
                # contain empty documents.
                continue
            h, w = int(px.shape[0]), int(px.shape[1])
            resized = px[::RESIZE_FACTOR, ::RESIZE_FACTOR]
            out.append({
                "doc_id": row.doc_id,
                "width": w, "height": h,
                "new_width": int(resized.shape[1]),
                "new_height": int(resized.shape[0]),
                "resized_md5": hashlib.md5(resized.tobytes()).hexdigest(),
            })
        yield pd.DataFrame(out, columns=[f.name for f in
                                         RESIZE_SCHEMA.fields])


@register(
    "multimodal_resize",
    oracle=f"""
    SELECT doc_id,
           CAST(strlen(text) AS INT) AS width,
           CAST(1 AS INT) AS height,
           CAST((strlen(text) + 1) // {RESIZE_FACTOR} AS INT) AS new_width,
           CAST(1 AS INT) AS new_height,
           md5(array_to_string(list_transform(
                 range(1, strlen(text) + 1, {RESIZE_FACTOR}),
                 i -> substr(text, CAST(i AS BIGINT), 1)), '')) AS resized_md5
    FROM documents
    WHERE doc_id % 3 = 0 AND strlen(text) > 0
    """,
    tags=("multimodal", "llm-data"),
    doc="Image resize over REAL PNG payloads: stdlib decode -> "
        "nearest-neighbor [::2, ::2] subsample -> re-hash. The corpus "
        "encodes text bytes as 1-row pixel strips, so the oracle's "
        "every-2nd-character hash checks the decode+resize round-trip "
        "byte-for-byte.",
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

AUDIO_WINDOW = 256       # samples per analysis window
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
    """Per-payload sample statistics over REAL WAV decode: the RIFF
    header/chunk walk in `imagecodec.decode_wav` yields the PCM samples
    as a numpy view, then the stats are vectorized sum/max/square —
    one `frombuffer` per row, no per-sample Python."""
    import math

    import numpy as np
    import pandas as pd

    for pdf in iterator:
        out = []
        for row in pdf.itertuples(index=False):
            payload = bytes(row.payload) if row.payload is not None else b""
            try:
                samples, _rate, _ch, _bits = decode_wav(payload)
            except ValueError:
                # NULL/undecodable payload (empty-text doc or corrupt
                # foreign file): no row, matching the oracle's
                # `strlen(text) > 0` filter.
                continue
            a = samples.astype(np.int64)
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
      FROM documents WHERE doc_id % 3 = 1 AND strlen(text) > 0)
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
    doc="Audio feature extraction over REAL WAV payloads: RIFF chunk "
        "walk -> u8 PCM samples -> count/sum/peak/RMS + active-window "
        "detection (256-sample windows above a mean-amplitude gate). "
        "numpy frombuffer vectorization per Arrow batch. The 8-bit PCM "
        "samples are the text bytes (lossless), so the oracle folds "
        "ord() over the text. RMS = sqrt(sumsq/n) is integer "
        "arithmetic until one IEEE division + sqrt, so it is "
        "cross-engine exact.",
)
def multimodal_audio_features(spark, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs).filter(
        F.col("media_type") == "audio")
    return media.select("doc_id", "payload").mapInPandas(
        _audio_feature_batches, schema=AUDIO_FEATURES_SCHEMA)
