"""PNG codec (functions/png_codec.py): roundtrip through every filter
type and channel count, decode of an externally-produced PNG, and the
real-decode path inside the decode_images Arrow stage.
"""

from __future__ import annotations

import base64
import struct
import zlib

import pytest

from new_data_pipeline_spark.functions.png_codec import (
    PNG_MAGIC, decode_png, encode_png, is_png)


def _pixels(h: int, w: int, c: int) -> bytes:
    # value pattern with row/col/channel structure so every filter's
    # left/up/upper-left deltas are non-trivial
    return bytes(((y * 31 + x * 7 + ch * 13) % 251)
                 for y in range(h) for x in range(w) for ch in range(c))


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_all_filters_all_channels(filter_type, channels):
    h, w = 13, 17
    pix = _pixels(h, w, channels)
    png = encode_png(pix, h, w, channels, filter_type=filter_type)
    assert is_png(png)
    dh, dw, dc, dpix = decode_png(png)
    assert (dh, dw, dc) == (h, w, channels)
    assert dpix == pix


def test_decode_external_png():
    """A PNG produced by an external encoder (the ubiquitous 1x1
    transparent pixel) decodes — proves the codec reads real-world
    files, not just its own output."""
    b64 = ("iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
           "AAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    h, w, c, pix = decode_png(base64.b64decode(b64))
    assert (h, w, c) == (1, 1, 4)
    assert len(pix) == 4


def test_non_png_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a not a png")


def test_unsupported_corners_raise_cleanly():
    pix = _pixels(2, 2, 3)
    png = bytearray(encode_png(pix, 2, 2, 3))
    # patch IHDR bit depth (offset: 8 magic + 8 chunk hdr + 8 w/h)
    png[24] = 16
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(bytes(png))
    png = bytearray(encode_png(pix, 2, 2, 3))
    png[28] = 1  # interlace flag (IHDR: w4 h4 depth1 color1 comp1 filt1 int1)
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(bytes(png))


def test_truncated_idat_detected():
    pix = _pixels(4, 4, 1)
    png = encode_png(pix, 4, 4, 1)
    # rebuild with IDAT deflating too few bytes
    bad_raw = zlib.compress(b"\x00" * 5)

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bad = PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bad_raw) \
        + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="decompressed size"):
        decode_png(bad)


def test_decode_images_real_png_path(spark):
    """decode_images reports DECODED geometry for PNG payloads (not the
    metadata struct) and exact pixel statistics."""
    from new_data_pipeline_spark.operators.multimodal import decode_images

    pix_a = bytes([10, 20, 30, 40, 50, 60])          # 1x2 RGB
    pix_b = bytes(range(16))                          # 4x4 gray
    rows = [
        (1, encode_png(pix_a, 1, 2, 3, filter_type=4), {"height": 99, "width": 99, "channels": 9}),
        (2, encode_png(pix_b, 4, 4, 1, filter_type=3), {"height": 99, "width": 99, "channels": 9}),
        (3, b"not-an-image", {"height": 7, "width": 8, "channels": 1}),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, payload binary, "
              "meta struct<height:int,width:int,channels:int>")
    got = {r.doc_id: r for r in decode_images(df).collect()}
    assert (got[1].height, got[1].width, got[1].channels) == (1, 2, 3)
    assert got[1].n_bytes == 6
    assert got[1].mean_byte == pytest.approx(sum(pix_a) / 6)
    assert (got[2].height, got[2].width, got[2].channels) == (4, 4, 1)
    assert got[2].mean_byte == pytest.approx(sum(pix_b) / 16)
    # non-PNG: metadata passthrough + byte stats (the documented fallback)
    assert (got[3].height, got[3].width, got[3].channels) == (7, 8, 1)
    assert got[3].n_bytes == len(b"not-an-image")
