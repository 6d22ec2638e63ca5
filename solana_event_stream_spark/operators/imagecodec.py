"""Pure-stdlib media codecs (PNG, BMP, WAV) for the multimodal operators.

The container ships no media libraries (no PIL/libjpeg/soundfile), but
PNG needs only zlib + numpy and BMP/WAV are plain struct layouts, so the
multimodal pipeline decodes REAL formats end-to-end:

- PNG: 8-bit greyscale (color type 0) and RGB (color type 2), no
  interlace. The encoder emits filter 0 scanlines; the decoder
  implements all five PNG filter types (None/Sub/Up/Average/Paeth,
  PNG spec §9) and verifies chunk CRCs, so it also reads
  foreign-encoded baseline PNGs, not just its own output.
- APNG: animated PNG (acTL/fcTL/fdAT chunks over the same zlib +
  unfilter core) — real multi-frame video-style payloads for the
  frame-sampling operator; per-frame zlib streams, consecutive
  sequence-number validation, frame regions within the canvas.
- BMP: uncompressed (BI_RGB) 24-bit, the classic bottom-up
  BGR-with-4-byte-row-padding layout.
- WAV: canonical 44-byte RIFF/WAVE header + PCM (8-bit unsigned or
  16-bit signed little-endian).

These are codecs, not a Spark surface: `operators/multimodal.py` calls
them inside Arrow-batched `mapInPandas` stages. zlib does the heavy
lifting in C; the per-scanline unfilter is numpy-vectorized for the two
filters our encoder emits (None, Up) and byte-looped only for the
left-referencing filters (Sub/Average/Paeth) that appear in foreign
files.

The reference engine has no media operators (this surface comes from
the driver brief), so there are no reference citations here.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    body = tag + data
    return (struct.pack(">I", len(data)) + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray, *, compress_level: int = 6) -> bytes:
    """Encode a (H, W) grey or (H, W, 3) RGB uint8 array as a PNG.

    Scanlines use filter type 0 (None) — valid output per the spec and
    the cheapest to produce; zlib still removes the redundancy.
    """
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color_type = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type = 2
    else:
        raise ValueError(f"expected (H,W) or (H,W,3) uint8, got {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    if h < 1 or w < 1:
        raise ValueError(f"PNG dimensions must be >= 1, got {w}x{h}")
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_SIGNATURE
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, compress_level))
            + _png_chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _walk_chunks(payload: bytes):
    """Yield (tag, data) for every chunk, verifying the signature and
    each chunk's CRC; raises ValueError on any structural damage."""
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, n = 8, len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length or pos + 12 + length > n:
            raise ValueError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        yield tag, data
        if tag == b"IEND":
            return


def _parse_ihdr(data: bytes) -> tuple[int, int, int]:
    """Validate an IHDR against the supported baseline subset; returns
    (width, height, channels)."""
    if len(data) != 13:
        raise ValueError(f"IHDR must be 13 bytes, got {len(data)}")
    w, h, bit_depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", data)
    if bit_depth != 8 or color_type not in (0, 2):
        raise ValueError(
            f"unsupported PNG (bit_depth={bit_depth}, color={color_type}); "
            "only 8-bit grey/RGB baseline is implemented")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported PNG compression/filter/interlace")
    if w < 1 or h < 1 or w * h > 64_000_000:
        # Dims sanity cap: a hostile IHDR could otherwise make the
        # bounded decompress below reserve gigabytes.
        raise ValueError(f"PNG dimensions out of range ({w}x{h})")
    return w, h, 1 if color_type == 0 else 3


def _decode_pixels(compressed: bytes, w: int, h: int,
                   channels: int) -> np.ndarray:
    """Inflate + unfilter one image's scanline stream (shared by the
    still decoder and each APNG frame)."""
    stride = w * channels
    expected = h * (stride + 1)
    try:
        # Bound decompression by the size the (already CRC-verified)
        # header implies, +1 so an oversized stream is detectable without
        # letting a small hostile IDAT balloon memory unboundedly.
        dec = zlib.decompressobj()
        raw = dec.decompress(compressed, expected + 1)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG deflate stream: {exc}") from exc
    if len(raw) != expected or dec.unconsumed_tail or not dec.eof:
        raise ValueError(
            f"IDAT size {len(raw)} != expected {expected}")
    out = np.empty((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1)
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:                       # None
            out[y] = line
        elif ftype == 2:                     # Up — vectorized
            out[y] = line + prev             # uint8 wraps mod 256
        elif ftype == 1:                     # Sub — per-channel prefix sum
            # rec[i] = (line[i] + rec[i-c]) mod 256 is a running sum per
            # channel residue class; cumsum in uint64 then & 0xFF is
            # bit-exact with the sequential recurrence.
            rec = out[y]
            for ch in range(channels):
                rec[ch::channels] = (
                    np.cumsum(line[ch::channels], dtype=np.uint64) & 0xFF)
        elif ftype == 3:                     # Average
            rec = out[y]
            for i in range(stride):
                left = int(rec[i - channels]) if i >= channels else 0
                rec[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:                     # Paeth
            rec = out[y]
            for i in range(stride):
                left = int(rec[i - channels]) if i >= channels else 0
                ul = int(prev[i - channels]) if i >= channels else 0
                rec[i] = (int(line[i])
                          + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype} on row {y}")
    return out if channels == 1 else out.reshape(h, w, 3)


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a baseline (non-interlaced, 8-bit grey/RGB) PNG.

    Returns (H, W) for greyscale, (H, W, 3) for RGB. Verifies the
    signature and every chunk CRC; raises ValueError on anything
    malformed or outside the supported baseline subset. On an APNG this
    returns the default image (the IDAT stream), per the spec's
    animation-unaware-decoder behavior.
    """
    ihdr = None
    idat = bytearray()
    for tag, data in _walk_chunks(payload):
        if tag == b"IHDR":
            ihdr = _parse_ihdr(data)
        elif tag == b"IDAT":
            idat.extend(data)
        # ancillary chunks (tEXt, pHYs, acTL/fcTL/fdAT, ...) are skipped
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, channels = ihdr
    return _decode_pixels(bytes(idat), w, h, channels)


# ---------------------------------------------------------------------------
# APNG (animated PNG) — acTL/fcTL/fdAT over the same zlib/unfilter core
# ---------------------------------------------------------------------------

def encode_apng(frames: list[np.ndarray], *, delay_num: int = 1,
                delay_den: int = 10, compress_level: int = 6) -> bytes:
    """Encode a list of uint8 frames as an APNG.

    Frame 0 defines the canvas and rides in the IDAT stream (so
    animation-unaware PNG decoders show it); later frames may be
    narrower/shorter than the canvas (anchored at 0,0, dispose NONE,
    blend SOURCE) and ride in fdAT chunks, each frame its own complete
    zlib stream per the APNG spec. All frames must share the color kind
    (all grey (H, W) or all RGB (H, W, 3)).
    """
    if not frames:
        raise ValueError("APNG needs at least one frame")
    arrs = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    first = arrs[0]
    if first.ndim == 2:
        color_type = 0
    elif first.ndim == 3 and first.shape[2] == 3:
        color_type = 2
    else:
        raise ValueError(
            f"expected (H,W) or (H,W,3) uint8 frames, got {first.shape}")
    ch, cw = first.shape[0], first.shape[1]
    if ch < 1 or cw < 1:
        raise ValueError(f"PNG dimensions must be >= 1, got {cw}x{ch}")

    def _raw(a: np.ndarray) -> bytes:
        return b"".join(b"\x00" + a[y].tobytes() for y in range(a.shape[0]))

    def _fctl(seq: int, w: int, h: int) -> bytes:
        return _png_chunk(b"fcTL", struct.pack(
            ">IIIIIHHBB", seq, w, h, 0, 0, delay_num, delay_den, 0, 0))

    ihdr = struct.pack(">IIBBBBB", cw, ch, 8, color_type, 0, 0, 0)
    out = [PNG_SIGNATURE, _png_chunk(b"IHDR", ihdr),
           _png_chunk(b"acTL", struct.pack(">II", len(arrs), 0))]
    seq = 0
    out.append(_fctl(seq, cw, ch))
    seq += 1
    out.append(_png_chunk(b"IDAT", zlib.compress(_raw(first),
                                                 compress_level)))
    for a in arrs[1:]:
        if a.ndim != first.ndim or (a.ndim == 3 and a.shape[2] != 3):
            raise ValueError(
                f"all frames must share the color kind; frame shape "
                f"{a.shape} vs canvas {first.shape}")
        fh, fw = a.shape[0], a.shape[1]
        if fh < 1 or fw < 1 or fh > ch or fw > cw:
            raise ValueError(
                f"frame {fw}x{fh} outside canvas {cw}x{ch}")
        out.append(_fctl(seq, fw, fh))
        seq += 1
        out.append(_png_chunk(b"fdAT", struct.pack(">I", seq)
                              + zlib.compress(_raw(a), compress_level)))
        seq += 1
    out.append(_png_chunk(b"IEND", b""))
    return b"".join(out)


def png_canvas_size(payload: bytes) -> tuple[int, int]:
    """(width, height) of a PNG/APNG's CANVAS from its IHDR — which for
    a foreign APNG whose default image is not part of the animation
    (first fcTL after IDAT) can differ from frame 0's region dims.
    Validates signature + chunk CRCs up to the IHDR."""
    for tag, data in _walk_chunks(payload):
        if tag == b"IHDR":
            w, h, _channels = _parse_ihdr(data)
            return w, h
        break  # IHDR must be the first chunk
    raise ValueError("missing IHDR")


def decode_apng(payload: bytes) -> list[np.ndarray]:
    """Decode an APNG into its frame pixel arrays.

    Returns one array per animation frame — the frame's own region
    ((H, W) grey / (H, W, 3) RGB), not a composited canvas: dispose and
    blend are presentation semantics, and frame EXTRACTION (the
    training-data operation) wants the raw regions. Validates chunk
    CRCs, acTL frame count, the spec's consecutive sequence numbers
    across fcTL/fdAT, and that every frame region fits the canvas. A
    plain (non-animated) PNG decodes as a single frame.
    """
    ihdr = None
    actl = None
    idat = bytearray()
    idat_is_frame0 = False
    entries: list[dict] = []       # {"w","h","x","y","data": bytearray}
    expected_seq = 0
    for tag, data in _walk_chunks(payload):
        if tag == b"IHDR":
            ihdr = _parse_ihdr(data)
        elif tag == b"acTL":
            if len(data) != 8:
                raise ValueError(f"acTL must be 8 bytes, got {len(data)}")
            actl = struct.unpack(">II", data)
        elif tag == b"fcTL":
            if len(data) != 26:
                raise ValueError(f"fcTL must be 26 bytes, got {len(data)}")
            (seq, fw, fh, fx, fy, _dn, _dd, dispose, blend) = \
                struct.unpack(">IIIIIHHBB", data)
            if seq != expected_seq:
                raise ValueError(
                    f"APNG sequence number {seq} != expected {expected_seq}")
            expected_seq += 1
            if dispose > 2 or blend > 1:
                raise ValueError(
                    f"bad fcTL dispose/blend ({dispose}/{blend})")
            entries.append({"w": fw, "h": fh, "x": fx, "y": fy,
                            "data": bytearray()})
        elif tag == b"IDAT":
            # spec: IDAT chunks are the default image and precede the
            # animation's fdAT stream — an IDAT after a second fcTL or
            # after any fdAT is structurally malformed; fail fast here
            # rather than via _decode_pixels' stream-size mismatch
            if len(entries) > 1 or expected_seq > len(entries):
                raise ValueError(
                    "IDAT after a later fcTL/fdAT: default-image data "
                    "must be consecutive and precede the animation")
            if entries and not idat and len(entries) == 1 \
                    and not entries[0]["data"]:
                idat_is_frame0 = True
            idat.extend(data)
            if idat_is_frame0:
                entries[0]["data"].extend(data)
        elif tag == b"fdAT":
            if len(data) < 4:
                raise ValueError("truncated fdAT sequence number")
            (seq,) = struct.unpack_from(">I", data, 0)
            if seq != expected_seq:
                raise ValueError(
                    f"APNG sequence number {seq} != expected {expected_seq}")
            expected_seq += 1
            if not entries:
                raise ValueError("fdAT before any fcTL")
            entries[-1]["data"].extend(data[4:])
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, channels = ihdr
    if actl is None:
        # not animated: the still image is the single frame
        return [_decode_pixels(bytes(idat), w, h, channels)]
    if actl[0] != len(entries):
        raise ValueError(
            f"acTL declares {actl[0]} frames, found {len(entries)}")
    frames = []
    for e in entries:
        fw, fh = e["w"], e["h"]
        if fw < 1 or fh < 1 or e["x"] + fw > w or e["y"] + fh > h:
            raise ValueError(
                f"frame region {fw}x{fh}+{e['x']}+{e['y']} outside "
                f"canvas {w}x{h}")
        if not e["data"]:
            raise ValueError("fcTL with no frame data")
        frames.append(_decode_pixels(bytes(e["data"]), fw, fh, channels))
    return frames


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit BI_RGB)
# ---------------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) RGB uint8 array as a 24-bit BI_RGB BMP."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H,W,3) uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):           # bottom-up rows
        body += arr[y, :, ::-1].tobytes()    # RGB -> BGR
        body += b"\x00" * pad
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP into an (H, W, 3) RGB array."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP (bad magic)")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    (_, _, _, _, data_offset) = struct.unpack_from("<2sIHHI", payload, 0)
    (hdr_size, w, h, planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if hdr_size < 40 or planes != 1:
        raise ValueError(f"unsupported BMP header (size={hdr_size})")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (bpp={bpp}, compression={compression}); "
            "only uncompressed 24-bit is implemented")
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if data_offset + stride * h > len(payload):
        raise ValueError("truncated BMP pixel data")
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        y = i if top_down else h - 1 - i
        off = data_offset + i * stride
        row = np.frombuffer(payload, np.uint8, row_bytes, off)
        out[y] = row.reshape(w, 3)[:, ::-1]  # BGR -> RGB
    return out


# ---------------------------------------------------------------------------
# WAV (canonical RIFF/WAVE, PCM)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray | bytes, *, sample_rate: int = 8000,
               bits: int = 8, channels: int = 1) -> bytes:
    """Encode PCM samples as a canonical 44-byte-header WAV file.

    8-bit WAV is unsigned (uint8); 16-bit is signed little-endian.
    """
    if bits == 8:
        data = (samples if isinstance(samples, (bytes, bytearray))
                else np.ascontiguousarray(samples, np.uint8).tobytes())
    elif bits == 16:
        data = np.ascontiguousarray(samples, np.dtype("<i2")).tobytes()
    else:
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    block_align = channels * (bits // 8)
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, bits)
    # RIFF requires word-aligned chunks: an odd-length data chunk gets a
    # pad byte (excluded from the chunk's own length field, included in
    # the RIFF size) so strict parsers and post-data chunks stay aligned.
    pad = b"\x00" * (len(data) & 1)
    return (b"RIFF" + struct.pack("<I", 36 + len(data) + len(pad)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + bytes(data) + pad)


def decode_wav(payload: bytes):
    """Decode a PCM WAV file.

    Returns (samples, sample_rate, channels, bits) — samples is uint8
    for 8-bit files, int16 for 16-bit, flat (interleaved) layout.
    Walks the chunk list (so files with LIST/fact chunks also parse).
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE magic)")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError(f"fmt chunk must be >= 16 bytes, "
                                 f"got {length}")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)     # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(
            f"unsupported WAV (format={audio_format}, bits={bits}); "
            "only 8/16-bit PCM is implemented")
    dtype = np.uint8 if bits == 8 else np.dtype("<i2")
    samples = np.frombuffer(data, dtype=dtype)
    return samples, sample_rate, channels, bits
