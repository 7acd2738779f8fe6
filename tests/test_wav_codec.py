"""WAV codec gates: roundtrips through our encoder/decoder AND
cross-checks against the stdlib ``wave`` module in both directions, so
the codec is pinned to the real format, not to itself."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from new_data_pipeline_spark.functions.wav_codec import (
    decode_wav, encode_wav, is_wav)


def test_roundtrip_8bit_mono():
    samples = [0, 1, -1, 127, -128, 64, -64]
    b = encode_wav(samples, n_channels=1, sample_rate=8000, sample_width=1)
    d = decode_wav(b)
    assert (d.n_channels, d.sample_rate, d.sample_width) == (1, 8000, 1)
    assert d.samples == samples
    assert d.n_frames == len(samples)


def test_roundtrip_16bit_stereo():
    samples = [0, 100, -100, 32767, -32768, 5, -5, 1000]  # L/R interleaved
    b = encode_wav(samples, n_channels=2, sample_rate=44100, sample_width=2)
    d = decode_wav(b)
    assert (d.n_channels, d.sample_rate, d.sample_width) == (2, 44100, 2)
    assert d.samples == samples
    assert d.n_frames == 4


def test_our_encoder_readable_by_stdlib_wave():
    samples = [10, -20, 30, -40]
    b = encode_wav(samples, n_channels=1, sample_rate=16000, sample_width=2)
    with wave.open(io.BytesIO(b)) as w:
        assert w.getnchannels() == 1
        assert w.getframerate() == 16000
        assert w.getsampwidth() == 2
        assert w.getnframes() == 4
        raw = w.readframes(4)
    assert list(struct.unpack("<4h", raw)) == samples


def test_stdlib_wave_readable_by_our_decoder():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setframerate(22050)
        w.setsampwidth(2)
        w.writeframes(struct.pack("<6h", 1, -1, 2, -2, 3, -3))
    d = decode_wav(buf.getvalue())
    assert (d.n_channels, d.sample_rate, d.n_frames) == (2, 22050, 3)
    assert d.samples == [1, -1, 2, -2, 3, -3]


def test_24bit_decode():
    # hand-build a 24-bit data chunk: values need sign extension
    vals = [0, 1, -1, (1 << 22), -(1 << 22)]
    data = b"".join(
        (v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    b = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert decode_wav(b).samples == vals


def test_rejects_non_pcm_and_garbage():
    assert not is_wav(b"\x89PNG1234WAVE")
    with pytest.raises(ValueError):
        decode_wav(b"garbage that is not a wav")
    # format tag 3 (IEEE float) must be rejected, engaging the fallback
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    b = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError):
        decode_wav(b)
