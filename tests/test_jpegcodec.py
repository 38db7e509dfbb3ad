"""Baseline JPEG codec: spec-structure checks, the block-constant
closed form the SQL oracle relies on, a general (non-constant-block)
roundtrip bounded by the quantization step, and loud rejection of
unsupported stream shapes."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dht11_data_pipeline_spark.functions.jpegcodec import (
    Q_STEP,
    decode_jpeg_gray,
    encode_jpeg_gray,
    text_to_jpeg,
)


def _closed_form(vals: np.ndarray) -> np.ndarray:
    return np.clip(2 * np.floor((vals - 127) / 2).astype(np.int64) + 128,
                   0, 255)


def test_marker_structure():
    jpg = text_to_jpeg(b"abc")
    assert jpg[:2] == b"\xFF\xD8" and jpg[-2:] == b"\xFF\xD9"
    # JFIF APP0, DQT, SOF0, two DHTs, SOS all present
    for tag in (0xE0, 0xDB, 0xC0, 0xC4, 0xDA):
        assert bytes([0xFF, tag]) in jpg


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=25, deadline=None)
def test_block_constant_closed_form(raw: bytes):
    w, h, gray = decode_jpeg_gray(text_to_jpeg(raw))
    assert w == 64 and h == 8 * max(1, -(-len(raw) // 8))
    img = np.frombuffer(gray, np.uint8).reshape(h, w)
    blocks = (img.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 64))
    assert (blocks == blocks[:, :1]).all(), "decoded blocks not constant"
    n = len(raw)
    vals = np.zeros(blocks.shape[0], np.int64)
    vals[:n] = np.frombuffer(raw, np.uint8)
    assert (blocks[:, 0].astype(np.int64) == _closed_form(vals)).all()


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=10, deadline=None)
def test_general_roundtrip_error_bounded(seed: int):
    """Non-constant blocks exercise the full AC path (RLE runs, ZRL,
    value bits); reconstruction error is bounded by the uniform
    quantization step across all 64 coefficients."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (16, 24), dtype=np.uint8)
    w, h, gray = decode_jpeg_gray(encode_jpeg_gray(img.tobytes(), 24, 16))
    assert (w, h) == (24, 16)
    dec = np.frombuffer(gray, np.uint8).reshape(16, 24).astype(np.int64)
    err = np.abs(dec - img.astype(np.int64))
    # per-pixel error <= sum over 64 coeffs of q/2 scaled back is loose;
    # empirically < 3*Q_STEP, assert 4*Q_STEP as the regression guard
    assert err.max() <= 4 * Q_STEP


def test_dc_differential_coding_across_blocks():
    """Monotone byte ramp → nonzero DC diffs in both directions."""
    raw = bytes(range(0, 256, 4)) + bytes(range(255, 0, -4))
    w, h, gray = decode_jpeg_gray(text_to_jpeg(raw))
    img = np.frombuffer(gray, np.uint8).reshape(h, w)
    got = (img.reshape(h // 8, 8, w // 8, 8)[:, 0, :, 0]
           .reshape(-1)[:len(raw)].astype(np.int64))
    vals = np.frombuffer(raw, np.uint8).astype(np.int64)
    assert (got == _closed_form(vals)).all()


def test_rejects_malformed():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"\x00\x00garbage")
    with pytest.raises(ValueError, match="truncated|marker|SOF"):
        decode_jpeg_gray(text_to_jpeg(b"xyz")[:20])
    with pytest.raises(ValueError, match="multiples of 8"):
        encode_jpeg_gray(b"\x00" * 12, 4, 3)
    with pytest.raises(ValueError, match="pixel length"):
        encode_jpeg_gray(b"\x00" * 10, 8, 8)


def test_rejects_progressive_sof():
    jpg = bytearray(text_to_jpeg(b"abc"))
    i = jpg.find(b"\xFF\xC0")
    jpg[i + 1] = 0xC2                       # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_gray(bytes(jpg))


def test_byte_stuffing_roundtrip():
    """Bytes near 255 produce 0xFF-dense entropy data; the stuffed
    stream must still decode exactly (covers the FF00 path)."""
    raw = bytes([255, 254, 1, 0] * 32)
    w, h, gray = decode_jpeg_gray(text_to_jpeg(raw))
    img = np.frombuffer(gray, np.uint8).reshape(h, w)
    got = (img.reshape(h // 8, 8, w // 8, 8)[:, 0, :, 0]
           .reshape(-1)[:len(raw)].astype(np.int64))
    assert (got == _closed_form(
        np.frombuffer(raw, np.uint8).astype(np.int64))).all()
