"""Pixel-level golden tests for the stdlib media codecs (PNG/BMP/WAV)
and the multimodal payload round-trip. These assert on actual decoded
pixels/samples, not just headers — the codecs are real, not stubs."""

from __future__ import annotations

import hashlib
import os
import struct
import zlib

import numpy as np
import pytest

from solana_event_stream_spark.operators.imagecodec import (
    PNG_SIGNATURE, _png_chunk, decode_bmp, decode_png, decode_wav,
    encode_bmp, encode_png, encode_wav)


def _rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def test_png_grey_roundtrip_exact():
    px = _rng().integers(0, 256, size=(17, 23), dtype=np.uint8)
    out = decode_png(encode_png(px))
    assert out.shape == (17, 23)
    assert np.array_equal(out, px)


def test_png_rgb_roundtrip_exact():
    px = _rng().integers(0, 256, size=(9, 5, 3), dtype=np.uint8)
    out = decode_png(encode_png(px))
    assert out.shape == (9, 5, 3)
    assert np.array_equal(out, px)


def test_png_single_row_strip_is_text_bytes():
    body = b"The quick brown fox jumps over the lazy dog"
    px = np.frombuffer(body, np.uint8).reshape(1, -1)
    out = decode_png(encode_png(px))
    assert out.tobytes() == body


def _paeth_ref(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _forward_filter(ftype: int, cur, prev, bpp: int) -> bytes:
    """Apply a PNG filter FORWARD (encoder direction) per spec §9 —
    an independent construction the decoder must invert exactly."""
    n = len(cur)
    out = bytearray(n)
    for i in range(n):
        left = cur[i - bpp] if i >= bpp else 0
        up = prev[i]
        upleft = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) // 2
        else:
            pred = _paeth_ref(left, up, upleft)
        out[i] = (cur[i] - pred) & 0xFF
    return bytes(out)


@pytest.mark.parametrize("channels", [1, 3])
def test_png_decode_all_five_filter_types(channels):
    """Hand-build a PNG whose 5 scanlines use filter types 0..4 (the
    shapes a foreign encoder like libpng emits); decode must recover
    the exact pixels."""
    h, w = 5, 7
    shape = (h, w) if channels == 1 else (h, w, channels)
    px = _rng().integers(0, 256, size=shape, dtype=np.uint8)
    flat = px.reshape(h, w * channels)
    raw = bytearray()
    for y in range(h):
        prev = flat[y - 1] if y else np.zeros(w * channels, np.uint8)
        raw.append(y)  # filter type = row index: 0,1,2,3,4
        raw += _forward_filter(y, [int(v) for v in flat[y]],
                               [int(v) for v in prev], channels)
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    payload = (PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
               + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), px)


def test_png_idat_split_across_chunks():
    px = _rng().integers(0, 256, size=(4, 6), dtype=np.uint8)
    good = encode_png(px)
    # re-wrap: split the single IDAT into two chunks
    comp = zlib.compress(
        b"".join(b"\x00" + px[y].tobytes() for y in range(4)))
    mid = len(comp) // 2
    ihdr = struct.pack(">IIBBBBB", 6, 4, 8, 0, 0, 0, 0)
    split = (PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr)
             + _png_chunk(b"IDAT", comp[:mid])
             + _png_chunk(b"IDAT", comp[mid:])
             + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png(split), decode_png(good))


def test_png_crc_corruption_raises():
    payload = bytearray(encode_png(np.zeros((2, 2), np.uint8)))
    payload[-5] ^= 0xFF  # flip a CRC byte of IEND
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_png_bad_signature_raises():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + b"\x00" * 64)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

def test_bmp_roundtrip_with_row_padding():
    # width 5 -> 15-byte rows padded to 16: exercises the 4-byte padding
    px = _rng().integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    out = decode_bmp(encode_bmp(px))
    assert out.shape == (3, 5, 3)
    assert np.array_equal(out, px)


def test_bmp_bottom_up_orientation():
    px = np.zeros((2, 1, 3), np.uint8)
    px[0] = [255, 0, 0]   # top row red
    px[1] = [0, 0, 255]   # bottom row blue
    out = decode_bmp(encode_bmp(px))
    assert list(out[0, 0]) == [255, 0, 0]
    assert list(out[1, 0]) == [0, 0, 255]


def test_bmp_unsupported_bpp_raises():
    bad = bytearray(encode_bmp(np.zeros((1, 1, 3), np.uint8)))
    struct.pack_into("<H", bad, 28, 32)  # claim 32bpp
    with pytest.raises(ValueError, match="bpp"):
        decode_bmp(bytes(bad))


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def test_wav_u8_roundtrip_and_header():
    body = bytes(range(256))
    samples, rate, channels, bits = decode_wav(
        encode_wav(body, sample_rate=8000, bits=8))
    assert samples.tobytes() == body
    assert (rate, channels, bits) == (8000, 1, 8)


def test_wav_i16_roundtrip():
    pcm = _rng().integers(-32768, 32768, size=100).astype("<i2")
    samples, rate, _, bits = decode_wav(
        encode_wav(pcm, sample_rate=44100, bits=16))
    assert bits == 16 and rate == 44100
    assert np.array_equal(samples, pcm)


def test_wav_tolerates_extra_chunks():
    good = encode_wav(b"abcdef", bits=8)
    # splice a LIST chunk between fmt and data (common in real files)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = bytearray(good[:fmt_end] + extra + good[fmt_end:])
    struct.pack_into("<I", spliced, 4, len(spliced) - 8)
    samples, _, _, _ = decode_wav(bytes(spliced))
    assert samples.tobytes() == b"abcdef"


def test_wav_bad_magic_raises():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 60)


# ---------------------------------------------------------------------------
# decode_image dispatch + Spark payload round-trip
# ---------------------------------------------------------------------------

def test_decode_image_dispatches_png_and_bmp():
    from solana_event_stream_spark.operators.multimodal import decode_image
    g = _rng().integers(0, 256, size=(3, 4), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(g)), g)
    c = _rng().integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_bmp(c)), c)
    with pytest.raises(ValueError, match="unsupported image format"):
        decode_image(b"MMB1" + b"\x00" * 16)


def test_attach_binary_payload_is_real_media(spark):
    """End-to-end: the synthesized media column holds REAL PNG/WAV
    bytes whose decoded content is exactly the source text bytes."""
    from solana_event_stream_spark.operators.multimodal import (
        attach_binary_payload, decode_image)
    docs = spark.createDataFrame(
        [(0, "image doc pixels"), (1, "audio doc samples"),
         (2, "video doc frames!")], "doc_id long, text string")
    rows = {r.doc_id: r for r in attach_binary_payload(docs).collect()}
    img = bytes(rows[0].payload)
    assert img[:8] == PNG_SIGNATURE
    assert decode_image(img).tobytes() == b"image doc pixels"
    wav = bytes(rows[1].payload)
    assert wav[:4] == b"RIFF"
    samples, rate, _, bits = decode_wav(wav)
    assert samples.tobytes() == b"audio doc samples"
    assert (rate, bits) == (8000, 8)
    vid = bytes(rows[2].payload)
    assert vid[:8] == PNG_SIGNATURE  # real APNG, not the MMB1 fake
    from solana_event_stream_spark.operators.multimodal import (
        decode_video_frames)
    frames = decode_video_frames(vid)
    assert b"".join(f.tobytes() for f in frames) == b"video doc frames!"


def test_resize_operates_on_decoded_pixels(spark):
    """The resize op's hash equals md5 of the every-2nd-pixel strip of
    the DECODED image — computed here independently from raw bytes."""
    from solana_event_stream_spark.operators.multimodal import (
        _resize_batches, attach_binary_payload)
    import pandas as pd
    text = "0123456789abcdef"
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    media = attach_binary_payload(docs).collect()
    pdf = pd.DataFrame({"doc_id": [0], "payload": [bytes(media[0].payload)]})
    [out] = list(_resize_batches(iter([pdf])))
    row = out.iloc[0]
    assert (row.width, row.height) == (16, 1)
    assert (row.new_width, row.new_height) == (8, 1)
    assert row.resized_md5 == hashlib.md5(
        text.encode()[::2]).hexdigest()


# ---------------------------------------------------------------------------
# APNG
# ---------------------------------------------------------------------------

def test_apng_multiframe_roundtrip_exact():
    from solana_event_stream_spark.operators.imagecodec import (
        decode_apng, encode_apng)
    frames = [_rng().integers(0, 256, size=(1, 256), dtype=np.uint8),
              _rng().integers(0, 256, size=(1, 256), dtype=np.uint8),
              _rng().integers(0, 256, size=(1, 100), dtype=np.uint8)]
    out = decode_apng(encode_apng(frames))
    assert len(out) == 3
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_apng_rgb_roundtrip_exact():
    from solana_event_stream_spark.operators.imagecodec import (
        decode_apng, encode_apng)
    frames = [_rng().integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
              for _ in range(3)]
    out = decode_apng(encode_apng(frames))
    assert all(np.array_equal(a, b) for a, b in zip(frames, out))


def test_apng_animation_unaware_decoder_sees_frame0():
    """Spec behavior: a plain PNG decoder must see the default image
    (frame 0 rides in IDAT; acTL/fcTL/fdAT are ancillary)."""
    from solana_event_stream_spark.operators.imagecodec import encode_apng
    frames = [np.arange(12, dtype=np.uint8).reshape(2, 6),
              np.ones((1, 3), dtype=np.uint8)]
    assert np.array_equal(decode_png(encode_apng(frames)), frames[0])


def test_apng_still_png_is_single_frame():
    from solana_event_stream_spark.operators.imagecodec import decode_apng
    px = _rng().integers(0, 256, size=(3, 7), dtype=np.uint8)
    frames = decode_apng(encode_png(px))
    assert len(frames) == 1 and np.array_equal(frames[0], px)


def test_apng_sequence_number_tamper_rejected():
    from solana_event_stream_spark.operators.imagecodec import (
        decode_apng, encode_apng)
    payload = bytearray(encode_apng(
        [np.ones((1, 8), np.uint8), np.zeros((1, 8), np.uint8)]))
    # rewrite the second fcTL's sequence number (and fix its CRC) so the
    # structure is valid but the animation order is corrupt
    idx = payload.index(b"fcTL", payload.index(b"fcTL") + 4)
    length = struct.unpack_from(">I", payload, idx - 4)[0]
    struct.pack_into(">I", payload, idx + 4, 99)
    body = bytes(payload[idx:idx + 4 + length])
    struct.pack_into(">I", payload, idx + 4 + length,
                     zlib.crc32(body) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="sequence number"):
        decode_apng(bytes(payload))


def test_apng_frame_count_mismatch_rejected():
    from solana_event_stream_spark.operators.imagecodec import (
        decode_apng, encode_apng)
    payload = bytearray(encode_apng([np.ones((1, 8), np.uint8)]))
    idx = payload.index(b"acTL")
    struct.pack_into(">I", payload, idx + 4, 5)   # claim 5 frames
    body = bytes(payload[idx:idx + 12])
    struct.pack_into(">I", payload, idx + 12,
                     zlib.crc32(body) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="frames"):
        decode_apng(bytes(payload))


def test_decode_video_frames_apng_and_legacy_mmb1():
    from solana_event_stream_spark.operators.multimodal import (
        FRAME_BYTES, MAGIC, decode_video_frames)
    from solana_event_stream_spark.operators.imagecodec import encode_apng
    body = bytes(range(256)) * 2 + b"tail"
    frames = [np.frombuffer(body[i:i + FRAME_BYTES], np.uint8)
              .reshape(1, -1) for i in range(0, len(body), FRAME_BYTES)]
    apng = decode_video_frames(encode_apng(frames))
    assert b"".join(f.tobytes() for f in apng) == body
    assert [f.shape[1] for f in apng] == [256, 256, 4]
    # legacy MMB1 corpora still parse (documented fallback)
    legacy = decode_video_frames(
        MAGIC + struct.pack("<II", 1, 2) + body)
    assert b"".join(f.tobytes() for f in legacy) == body
    with pytest.raises(ValueError, match="unsupported video format"):
        decode_video_frames(b"XXXX" + b"\x00" * 20)
    with pytest.raises(ValueError, match="NULL"):
        decode_video_frames(None)


def test_multimodal_ops_agree_with_oracle_on_empty_docs(spark, tmp_path):
    """Cross-engine proof for the EMPTY-document path (previously dead
    code on the driver corpora): a corpus containing empty docs in all
    three modalities runs the REAL catalog queries vs their REAL DuckDB
    oracles — empty docs carry NULL payloads, emit no media rows in the
    per-doc operators, and still count (undecoded) in the metadata
    aggregate, identically on both engines."""
    import pandas as pd

    from solana_event_stream_spark.catalog import load_catalog
    from solana_event_stream_spark.testing import _norm_rows, run_oracle

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5, 6, 7, 8],
        "text": ["image doc pixels", "audio doc samples",
                 "video doc frames " * 40,   # >256 bytes: multi-frame
                 "", "", "",                  # empty: one per modality
                 "img2", "aud2", "vid2"],
        "lang": ["en"] * 9,
        "source": ["test"] * 9,
    })
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    docs.to_parquet(os.path.join(tmp_path, "documents.parquet"),
                    index=False)

    catalog = load_catalog()
    for name in ("multimodal_metadata_extract", "multimodal_frame_sample",
                 "multimodal_resize", "multimodal_audio_features"):
        spec = catalog[name]
        sdf = spec.spark_fn(spark, str(tmp_path)).toPandas()
        odf = run_oracle(spec.oracle, str(tmp_path))
        sc, sr = _norm_rows(sdf)
        oc, orr = _norm_rows(odf)
        assert sc == oc, name
        assert len(sr) == len(orr), (name, len(sr), len(orr))
        assert sr == orr, name


def test_apng_rejects_mismatched_channel_frames():
    """Encoder must refuse frame lists its own decoder would reject:
    a (H, W, 4) or mixed grey/RGB frame after an RGB canvas serializes
    more/fewer bytes per row than the fcTL implies."""
    from solana_event_stream_spark.operators.imagecodec import encode_apng
    rgb = np.zeros((1, 4, 3), np.uint8)
    with pytest.raises(ValueError, match="color kind"):
        encode_apng([rgb, np.zeros((1, 4, 4), np.uint8)])
    with pytest.raises(ValueError, match="color kind"):
        encode_apng([rgb, np.zeros((1, 4), np.uint8)])


def test_multimodal_metadata_all_empty_modality(spark, tmp_path):
    """Degenerate corpus — EVERY document empty: Spark aggregates over
    all-NULL width/height (SUM -> NULL) and the oracle must agree
    (NULL, not 0) for every modality."""
    import pandas as pd

    from solana_event_stream_spark.catalog import load_catalog
    from solana_event_stream_spark.testing import _norm_rows, run_oracle

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2], "text": ["", "", ""],
        "lang": ["en"] * 3, "source": ["test"] * 3,
    })
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    docs.to_parquet(os.path.join(tmp_path, "documents.parquet"),
                    index=False)

    spec = load_catalog()["multimodal_metadata_extract"]
    sdf = spec.spark_fn(spark, str(tmp_path)).toPandas()
    odf = run_oracle(spec.oracle, str(tmp_path))
    sc, sr = _norm_rows(sdf)
    oc, orr = _norm_rows(odf)
    assert sc == oc and len(sr) == len(orr) == 3
    assert sr == orr


def _png_chunk_raw(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def test_apng_idat_after_animation_rejected():
    """Round-7 advice: an IDAT appearing after a later fcTL (or any
    fdAT) must fail fast with a structural error instead of being
    appended to frame 0's zlib stream and failing later (or not) via
    the decoded-size check."""
    from solana_event_stream_spark.operators.imagecodec import (
        decode_apng, encode_apng)
    payload = bytearray(encode_apng(
        [np.ones((1, 8), np.uint8), np.zeros((1, 8), np.uint8)]))
    iend = payload.index(b"IEND") - 4
    stray = _png_chunk_raw(b"IDAT", zlib.compress(b"\x00" * 9))
    tampered = bytes(payload[:iend]) + stray + bytes(payload[iend:])
    with pytest.raises(ValueError, match="IDAT after"):
        decode_apng(tampered)


def test_png_canvas_size_foreign_apng_default_image_outside_animation():
    """Round-7 advice: canvas dims must come from the IHDR. Build a
    foreign-style APNG whose default image (IDAT, 4x4) is NOT part of
    the animation (first fcTL AFTER the IDAT, declaring a 2x2 region):
    frame 0's region dims differ from the canvas."""
    from solana_event_stream_spark.operators.imagecodec import (
        PNG_SIGNATURE, decode_apng, png_canvas_size)

    def _raw_gray(arr):
        return b"".join(b"\x00" + arr[y].tobytes()
                        for y in range(arr.shape[0]))

    canvas = np.arange(16, dtype=np.uint8).reshape(4, 4)
    region = np.ones((2, 2), np.uint8)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    fctl = struct.pack(">IIIIIHHBB", 0, 2, 2, 1, 1, 1, 10, 0, 0)
    fdat = struct.pack(">I", 1) + zlib.compress(_raw_gray(region))
    payload = (PNG_SIGNATURE
               + _png_chunk_raw(b"IHDR", ihdr)
               + _png_chunk_raw(b"acTL", struct.pack(">II", 1, 0))
               + _png_chunk_raw(b"IDAT",
                                zlib.compress(_raw_gray(canvas)))
               + _png_chunk_raw(b"fcTL", fctl)
               + _png_chunk_raw(b"fdAT", fdat)
               + _png_chunk_raw(b"IEND", b""))
    frames = decode_apng(payload)
    assert len(frames) == 1 and frames[0].shape == (2, 2)
    assert png_canvas_size(payload) == (4, 4)   # IHDR, not frames[0]
