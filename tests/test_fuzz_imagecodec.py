"""Property-based fuzz over the stdlib media codecs: any valid input
round-trips exactly; corrupted bytes raise ValueError, never crash or
return wrong pixels silently."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from solana_event_stream_spark.operators.imagecodec import (
    decode_bmp, decode_png, decode_wav, encode_bmp, encode_png, encode_wav)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.booleans(),
       st.integers(0, 2 ** 32 - 1))
def test_png_roundtrip_any_shape(h, w, rgb, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 25), st.integers(1, 25), st.integers(0, 2 ** 32 - 1))
def test_bmp_roundtrip_any_shape(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=2000),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_u8_roundtrip_any_payload(body, rate):
    samples, r, ch, bits = decode_wav(
        encode_wav(body, sample_rate=rate, bits=8))
    assert samples.tobytes() == body
    assert (r, ch, bits) == (rate, 1, 8)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_arbitrary_bytes_never_crash_decoders(data):
    """Decoders must reject garbage with ValueError, not crash with
    struct/zlib/index errors."""
    for dec in (decode_png, decode_bmp, decode_wav):
        try:
            dec(data)
        except ValueError:
            pass


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12),
       st.integers(0, 2 ** 32 - 1), st.data())
def test_corrupted_png_never_returns_wrong_pixels(h, w, seed, data):
    """Flip one byte anywhere in a valid PNG: decode either raises
    ValueError (CRC/structure) or — if the flip landed somewhere
    checksummed-but-recoverable never happens in PNG — returns the
    original pixels. It must never silently return different pixels."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    payload = bytearray(encode_png(px))
    pos = data.draw(st.integers(0, len(payload) - 1))
    flip = data.draw(st.integers(1, 255))
    payload[pos] ^= flip
    try:
        out = decode_png(bytes(payload))
    except ValueError:
        return
    except Exception as exc:  # zlib.error from a flipped IDAT body that
        # passed CRC is impossible (CRC covers IDAT); anything else is a bug
        pytest.fail(f"non-ValueError escape: {type(exc).__name__}: {exc}")
    assert np.array_equal(out, px)


def test_crafted_short_ihdr_raises_valueerror():
    """A chunk with a VALID CRC but wrong IHDR length must raise
    ValueError, not struct.error."""
    from solana_event_stream_spark.operators.imagecodec import (
        PNG_SIGNATURE, _png_chunk)
    bad = PNG_SIGNATURE + _png_chunk(b"IHDR", b"\x00" * 5)
    with pytest.raises(ValueError, match="IHDR"):
        decode_png(bad)


def test_crafted_short_fmt_raises_valueerror():
    import struct
    bad = (b"RIFF" + struct.pack("<I", 24) + b"WAVE"
           + b"fmt " + struct.pack("<I", 4) + b"\x00" * 4
           + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="fmt"):
        decode_wav(bad)


def test_valid_crc_corrupt_deflate_raises_valueerror():
    """A PNG whose chunk CRCs are all valid but whose IDAT holds a
    corrupt deflate stream must raise ValueError (not zlib.error) —
    the multimodal batch loops only catch ValueError, so a zlib.error
    escape would fail the whole Spark task on one bad payload."""
    from solana_event_stream_spark.operators.imagecodec import (
        PNG_SIGNATURE, _png_chunk)
    import struct
    ihdr = struct.pack(">IIBBBBB", 4, 1, 8, 0, 0, 0, 0)
    bad = (PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", b"\xff\xff not deflate \x00\x01")
           + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="deflate"):
        decode_png(bad)


def test_truncated_deflate_stream_raises_valueerror():
    """A valid deflate *prefix* (stream cut before the final block) has
    no zlib error to raise — the eof check must reject it."""
    import zlib
    import struct
    from solana_event_stream_spark.operators.imagecodec import (
        PNG_SIGNATURE, _png_chunk)
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    full = zlib.compress(b"".join(b"\x00" + px[y].tobytes()
                                  for y in range(8)), 6)
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0)
    bad = (PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", full[:len(full) // 2])
           + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(bad)


def test_decompression_bomb_is_bounded():
    """A tiny IDAT that inflates far past the IHDR-implied size must be
    rejected by the bounded decompress, not ballooned into memory."""
    import zlib
    import struct
    from solana_event_stream_spark.operators.imagecodec import (
        PNG_SIGNATURE, _png_chunk)
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)  # claims 2x1
    bomb = zlib.compress(b"\x00" * (16 << 20), 9)        # inflates 16 MiB
    bad = (PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", bomb)
           + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="IDAT size"):
        decode_png(bad)


def test_hostile_ihdr_dims_capped():
    """Giant IHDR dimensions are rejected before any allocation."""
    import struct
    from solana_event_stream_spark.operators.imagecodec import (
        PNG_SIGNATURE, _png_chunk)
    ihdr = struct.pack(">IIBBBBB", 2 ** 31 - 1, 2 ** 31 - 1, 8, 2, 0, 0, 0)
    bad = PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError, match="dimensions"):
        decode_png(bad)


def test_wav_odd_length_data_is_word_aligned():
    """RIFF requires a pad byte after odd-length chunk bodies; the
    encoder must emit it (and count it in the RIFF size) so strict
    parsers and post-data chunks stay aligned."""
    import struct
    wav = encode_wav(b"\x01\x02\x03", sample_rate=8000, bits=8)
    (riff_size,) = struct.unpack_from("<I", wav, 4)
    assert len(wav) % 2 == 0                      # word-aligned file
    assert riff_size == len(wav) - 8              # size counts the pad
    (data_len,) = struct.unpack_from("<I", wav, 40)
    assert data_len == 3                          # length excludes pad
    samples, rate, ch, bits = decode_wav(wav)
    assert bytes(samples) == b"\x01\x02\x03"
    # a chunk AFTER the odd data chunk must still parse
    wav2 = (wav + b"LIST" + struct.pack("<I", 4) + b"INFO")
    wav2 = wav2[:4] + struct.pack("<I", len(wav2) - 8) + wav2[8:]
    samples2, *_ = decode_wav(wav2)
    assert bytes(samples2) == b"\x01\x02\x03"


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 5), st.integers(1, 64), st.booleans(),
       st.integers(0, 2 ** 32 - 1))
def test_apng_roundtrip_any_frames(n_frames, canvas_w, rgb, seed):
    """Any frame list (frame 0 = canvas, later frames any width up to
    the canvas) round-trips exactly through encode_apng/decode_apng."""
    from solana_event_stream_spark.operators.imagecodec import (
        decode_apng, encode_apng)
    rng = np.random.default_rng(seed)
    widths = [canvas_w] + [int(rng.integers(1, canvas_w + 1))
                           for _ in range(n_frames - 1)]
    frames = [rng.integers(0, 256,
                           size=((1, w, 3) if rgb else (1, w)),
                           dtype=np.uint8) for w in widths]
    out = decode_apng(encode_apng(frames))
    assert len(out) == len(frames)
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


@settings(max_examples=40, deadline=None)
@given(st.integers(2, 4), st.integers(0, 2 ** 32 - 1), st.data())
def test_corrupted_apng_never_returns_wrong_frames(n_frames, seed, data):
    """Flip one byte anywhere in a valid APNG: decode either raises
    ValueError or returns the original frames — never silently wrong
    pixels, never a non-ValueError escape (the multimodal batch loops
    only catch ValueError)."""
    from solana_event_stream_spark.operators.imagecodec import (
        decode_apng, encode_apng)
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, size=(1, 16), dtype=np.uint8)
              for _ in range(n_frames)]
    payload = bytearray(encode_apng(frames))
    pos = data.draw(st.integers(0, len(payload) - 1))
    payload[pos] ^= data.draw(st.integers(1, 255))
    try:
        out = decode_apng(bytes(payload))
    except ValueError:
        return
    except Exception as exc:
        pytest.fail(f"non-ValueError escape: {type(exc).__name__}: {exc}")
    assert len(out) == len(frames)
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_arbitrary_bytes_never_crash_video_decode(data):
    """decode_video_frames (APNG + legacy MMB1 dispatch) must reject
    garbage with ValueError, never crash."""
    from solana_event_stream_spark.operators.multimodal import (
        decode_video_frames)
    try:
        decode_video_frames(data)
    except ValueError:
        pass
