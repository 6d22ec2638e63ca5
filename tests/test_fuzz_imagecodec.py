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
