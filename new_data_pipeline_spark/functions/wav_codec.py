"""Pure-stdlib WAV (RIFF/PCM) codec: header parse + sample extraction,
and a minimal encoder for tests/synthesis.

The container ships no audio libraries, but PCM WAV is a 44-byte RIFF
header plus raw samples — struct is enough for a REAL decode (the same
standing the PNG codec gives images, functions/png_codec.py). Supports
the integer PCM widths (8-bit unsigned, 16/24/32-bit signed LE) in any
channel count; compressed formats (format tag != 1) are rejected so the
caller's fallback path engages.

Cross-checked against the stdlib ``wave`` module in
tests/test_wav_codec.py — both directions (our encoder → wave reader,
wave writer → our decoder).
"""

from __future__ import annotations

import struct
from typing import NamedTuple


class WavData(NamedTuple):
    n_channels: int
    sample_rate: int
    sample_width: int          # bytes per sample
    n_frames: int
    samples: list[int]         # interleaved, centered (signed) values


def is_wav(b: bytes) -> bool:
    return (len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE")


def decode_wav(b: bytes) -> WavData:
    """Parse RIFF chunks, return PCM samples as centered ints (8-bit
    unsigned data is shifted by -128 so every width reads as signed
    amplitude). Raises ValueError on non-PCM or malformed input."""
    if not is_wav(b):
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, len(b)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid, size = b[pos:pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    (tag, n_ch, rate, _byterate, _align, bits) = struct.unpack_from(
        "<HHIIHH", fmt, 0)
    if tag != 1:
        raise ValueError(f"non-PCM format tag {tag}")
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported bit depth {bits}")
    width = bits // 8
    usable = len(data) - (len(data) % (width * n_ch))
    if width == 1:
        samples = [x - 128 for x in data[:usable]]
    elif width == 2:
        samples = list(struct.unpack(f"<{usable // 2}h", data[:usable]))
    elif width == 4:
        samples = list(struct.unpack(f"<{usable // 4}i", data[:usable]))
    else:  # 24-bit little-endian signed
        samples = []
        for i in range(0, usable, 3):
            v = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16)
            samples.append(v - (1 << 24) if v & 0x800000 else v)
    return WavData(n_ch, rate, width, usable // (width * n_ch), samples)


def encode_wav(samples: list[int], n_channels: int = 1,
               sample_rate: int = 8000, sample_width: int = 1) -> bytes:
    """Minimal PCM writer (the test/synthesis twin of decode_wav).
    ``samples`` are centered ints; 8-bit output stores them shifted
    +128 per the WAV convention."""
    if sample_width == 1:
        data = bytes((s + 128) & 0xFF for s in samples)
    elif sample_width == 2:
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif sample_width == 4:
        data = struct.pack(f"<{len(samples)}i", *samples)
    else:
        raise ValueError("encoder supports widths 1/2/4")
    byterate = sample_rate * n_channels * sample_width
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byterate,
                      n_channels * sample_width, sample_width * 8)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data
              + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
