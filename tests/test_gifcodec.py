"""GIF87a codec: real LZW roundtrips, spec-conformance spot checks,
and boundary cases (the width-bump off-by-ones that scramble streams)."""

from __future__ import annotations

import random

from dht11_data_pipeline_spark.functions.gifcodec import (
    _lzw_compress,
    _lzw_decompress,
    decode_gif_gray,
    encode_gif_gray,
    text_to_gif,
)


def test_lzw_roundtrip_patterns():
    cases = [
        b"",
        b"a",
        b"aaaaaaaaaaaaaaaa",          # KwKwK territory
        b"abababababababab",
        bytes(range(256)) * 4,
        b"to be or not to be that is the question " * 8,
    ]
    for raw in cases:
        assert _lzw_decompress(_lzw_compress(raw, 8), 8) == raw


def test_lzw_roundtrip_random_and_width_boundaries():
    rng = random.Random(1234)
    for n in [1, 2, 253, 254, 255, 256, 257, 4000, 20000]:
        raw = bytes(rng.randrange(256) for _ in range(n))
        assert _lzw_decompress(_lzw_compress(raw, 8), 8) == raw
    # low-entropy long input drives the dictionary to the 4096 CLEAR
    raw = (b"ab" * 3000) + (b"cd" * 3000) + bytes(rng.randrange(4)
                                                  for _ in range(20000))
    assert _lzw_decompress(_lzw_compress(raw, 8), 8) == raw


def test_gif_container_roundtrip():
    rng = random.Random(99)
    for w, h in [(1, 1), (64, 3), (17, 5)]:
        gray = bytes(rng.randrange(256) for _ in range(w * h))
        payload = encode_gif_gray(gray, w, h)
        assert payload[:6] == b"GIF87a"
        assert payload[-1] == 0x3B
        dw, dh, dgray = decode_gif_gray(payload)
        assert (dw, dh) == (w, h)
        assert dgray == gray


def test_text_to_gif_replays_bytes():
    raw = b"the quick brown fox jumps over the lazy dog" * 5
    w, h, gray = decode_gif_gray(text_to_gif(raw, width=64))
    assert w == 64 and h == (len(raw) + 63) // 64
    assert gray[:len(raw)] == raw
    assert all(b == 0 for b in gray[len(raw):])


def test_gif89a_and_extension_blocks_accepted():
    # splice a GIF89a header + a dummy extension before the image: the
    # decoder must skip extensions and still decode
    raw = b"hello gif"
    payload = bytearray(text_to_gif(raw, width=8))
    payload[:6] = b"GIF89a"
    # insert a graphic-control-ish extension right before image sep
    sep = payload.index(0x2C, 6 + 7 + 768)
    ext = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    payload[sep:sep] = ext
    w, h, gray = decode_gif_gray(bytes(payload))
    assert w == 8 and gray[:len(raw)] == raw


def test_gif_matches_external_decoder_if_available():
    """If PIL exists in the environment, cross-check our encoder with
    an independent decoder (skipped in this container)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        import pytest
        pytest.skip("PIL not available")
    import io

    from PIL import Image
    raw = bytes(range(256))
    img = Image.open(io.BytesIO(text_to_gif(raw, width=16)))
    assert list(img.getdata())[:256] == list(range(256))


def test_truncated_stream_raises():
    import pytest
    payload = text_to_gif(b"some document", width=8)
    with pytest.raises(ValueError):
        decode_gif_gray(payload[:20])
    with pytest.raises(ValueError):
        decode_gif_gray(b"NOTAGIF" + payload)
