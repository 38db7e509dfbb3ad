"""Byte-level tests for the vendored WAV codec and the audio
multimodal operators (the audio twin of test_imagecodec)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dht11_data_pipeline_spark.functions.audiocodec import (
    decode_wav, encode_wav, resample_nn_wav, text_to_wav)

samples_st = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=200)


@settings(max_examples=50, deadline=None)
@given(samples=samples_st, rate=st.sampled_from([3000, 8000, 44100]))
def test_roundtrip(samples, rate):
    ch, r, out = decode_wav(encode_wav(samples, rate))
    assert (ch, r, out) == (1, rate, samples)


@settings(max_examples=50, deadline=None)
@given(samples=st.lists(st.integers(min_value=-32768, max_value=32767),
                        min_size=1, max_size=100),
       in_rate=st.sampled_from([8000, 16000]),
       out_rate=st.sampled_from([3000, 4000, 8000, 16000]))
def test_resample_contract(samples, in_rate, out_rate):
    """n_out = floor(n_in * out/in); each output sample is an input
    sample (sample-and-hold, never interpolated); identity at equal
    rates."""
    out = resample_nn_wav(encode_wav(samples, in_rate), out_rate)
    _, r, res = decode_wav(out)
    assert r == out_rate
    assert len(res) == len(samples) * out_rate // in_rate
    assert set(res) <= set(samples)
    if in_rate == out_rate:
        assert res == samples


def test_decode_skips_extra_riff_chunks():
    """Chunk-walking must survive a LIST chunk before data (the common
    metadata layout) and odd-length chunks (word alignment)."""
    body = encode_wav([1, -2, 3], 8000)
    fmt_chunk = body[12:36]
    data_chunk = body[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    payload = (b"RIFF" + struct.pack("<I", 4 + len(fmt_chunk) + len(extra)
                                     + len(data_chunk)) + b"WAVE"
               + fmt_chunk + extra + data_chunk)
    assert decode_wav(payload) == (1, 8000, [1, -2, 3])


def test_decode_rejects_non_wav_and_non_pcm():
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")
    bad = bytearray(encode_wav([1], 8000))
    bad[20] = 3  # format = IEEE float
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_text_to_wav_sample_law():
    _, rate, samples = decode_wav(text_to_wav(b"abc", 8000))
    assert rate == 8000
    assert samples == [(b - 128) * 256 for b in b"abc"]


def test_audio_operators_end_to_end(spark):
    from pyspark.sql import functions as F

    from dht11_data_pipeline_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "x"), (3, "a b c d e f g h")],
        "doc_id long, text string")
    wav = multimodal.attach_audio_payload(docs, rate=8000)
    feats = {r["doc_id"]: r for r in multimodal.audio_features(wav).collect()}
    assert feats[1]["n_samples"] == len("hello world")
    assert feats[2]["peak"] == abs((ord("x") - 128) * 256)
    assert all(r["n_channels"] == 1 and r["sample_rate"] == 8000
               for r in feats.values())
    res = {r["doc_id"]: r for r in
           multimodal.resample_audio(wav, out_rate=4000).collect()}
    for doc_id, r in res.items():
        assert r["n_out"] == r["n_in"] * 4000 // 8000
        assert len(r["out_checksum"]) == 64
    # re-run determinism (checksums pin exact bytes)
    res2 = {r["doc_id"]: r["out_checksum"] for r in
            multimodal.resample_audio(wav, out_rate=4000).collect()}
    assert res2 == {k: v["out_checksum"] for k, v in res.items()}


def test_decode_rejects_stereo_and_truncated():
    bad = bytearray(encode_wav([1, 2, 3, 4], 8000))
    bad[22] = 2  # channels = 2
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))
    whole = encode_wav([1, 2, 3, 4], 8000)
    with pytest.raises(ValueError):
        decode_wav(whole[:-3])  # data chunk declares more than remains
