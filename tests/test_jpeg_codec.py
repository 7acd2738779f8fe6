"""Baseline-JPEG codec gates: roundtrips across geometries, component
layouts, subsampling, quantization, and restart markers — plus the
rejection paths that keep the operator fallback safe."""

from __future__ import annotations

import numpy as np
import pytest

from new_data_pipeline_spark.functions.jpeg_codec import (
    decode_jpeg, encode_jpeg, is_jpeg)

RNG = np.random.default_rng(7)


def _roundtrip(img: np.ndarray, **kw) -> np.ndarray:
    if img.ndim == 2:
        h, w, c = *img.shape, 1
    else:
        h, w, c = img.shape
    b = encode_jpeg(img.tobytes(), h, w, c, **kw)
    assert is_jpeg(b)
    hh, ww, cc, pix = decode_jpeg(b)
    assert (hh, ww, cc) == (h, w, c)
    return np.frombuffer(pix, dtype=np.uint8).reshape(img.shape)


@pytest.mark.parametrize("shape", [(8, 8), (16, 24), (13, 9), (1, 1),
                                   (7, 33)])
def test_gray_roundtrip_near_lossless(shape):
    """Flat quant=1: the only error left is DCT float rounding (±3)."""
    img = RNG.integers(0, 256, size=shape, dtype=np.uint8)
    out = _roundtrip(img, quant=1)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_rgb_444_roundtrip():
    img = RNG.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    out = _roundtrip(img, quant=1)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_rgb_420_subsampled():
    """4:2:0 loses chroma detail by design; a constant-chroma (gray)
    image must survive near-losslessly, a colored one within the
    averaging bound."""
    gray3 = np.repeat(
        RNG.integers(0, 256, size=(16, 16), dtype=np.uint8)[:, :, None],
        3, axis=2)
    out = _roundtrip(gray3, quant=1, subsample=True)
    assert np.abs(out.astype(int) - gray3.astype(int)).max() <= 4
    # smooth color image: 2x2 chroma averaging stays within one step
    grad = np.zeros((16, 16, 3), dtype=np.uint8)
    grad[..., 0] = np.arange(16, dtype=np.uint8)[None, :] * 4
    grad[..., 1] = 128
    grad[..., 2] = np.arange(16, dtype=np.uint8)[:, None] * 4
    out = _roundtrip(grad, quant=1, subsample=True)
    assert np.abs(out.astype(int) - grad.astype(int)).max() <= 8


def test_quantization_compresses_and_bounds_error():
    img = RNG.integers(0, 256, size=(32, 32), dtype=np.uint8)
    b1 = encode_jpeg(img.tobytes(), 32, 32, 1, quant=1)
    b16 = encode_jpeg(img.tobytes(), 32, 32, 1, quant=16)
    assert len(b16) < len(b1)  # coarser quant → smaller stream
    _, _, _, pix = decode_jpeg(b16)
    out = np.frombuffer(pix, dtype=np.uint8).reshape(32, 32)
    # worst-case error per coefficient is quant/2; loose pixel bound
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 64


def test_restart_markers_roundtrip():
    img = RNG.integers(0, 256, size=(24, 40), dtype=np.uint8)  # 15 MCUs
    b = encode_jpeg(img.tobytes(), 24, 40, 1, quant=1, restart_interval=4)
    assert b"\xff\xd0" in b or b"\xff\xd1" in b  # RSTn actually emitted
    _, _, _, pix = decode_jpeg(b)
    out = np.frombuffer(pix, dtype=np.uint8).reshape(24, 40)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_rejects_progressive_and_garbage():
    img = RNG.integers(0, 256, size=(8, 8), dtype=np.uint8)
    b = bytearray(encode_jpeg(img.tobytes(), 8, 8, 1))
    sof = b.find(b"\xff\xc0")
    b[sof + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(b))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    assert not is_jpeg(b"\x89PNG")


def test_decode_images_real_jpeg_path(spark):
    """decode_images reports DECODED geometry for JPEG payloads while
    PNG and fallback payloads keep their own paths in the same batch."""
    from new_data_pipeline_spark.functions.png_codec import encode_png
    from new_data_pipeline_spark.operators.multimodal import decode_images

    jpg_img = RNG.integers(0, 256, size=(8, 16), dtype=np.uint8)
    rows = [
        (1, encode_jpeg(jpg_img.tobytes(), 8, 16, 1, quant=1),
         {"height": 99, "width": 99, "channels": 9}),
        (2, encode_png(bytes([10, 20, 30]), 1, 1, 3),
         {"height": 99, "width": 99, "channels": 9}),
        (3, b"neither-format", {"height": 7, "width": 8, "channels": 1}),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, payload binary, "
              "meta struct<height:int,width:int,channels:int>")
    got = {r.doc_id: r for r in decode_images(df).collect()}
    assert (got[1].height, got[1].width, got[1].channels) == (8, 16, 1)
    _, _, _, pix = decode_jpeg(rows[0][1])
    assert got[1].mean_byte == pytest.approx(sum(pix) / len(pix))
    assert (got[2].height, got[2].width, got[2].channels) == (1, 1, 3)
    assert (got[3].height, got[3].width, got[3].channels) == (7, 8, 1)


def test_decode_images_corrupt_magic_falls_back(spark):
    """A payload that LOOKS like JPEG/PNG but is truncated or corrupt
    must take the byte-stats fallback, not kill the Spark task: the
    codecs' documented contract is raise-so-the-fallback-engages, and
    this is the operator half of that contract."""
    from new_data_pipeline_spark.operators.multimodal import decode_images

    truncated_jpeg = b"\xff\xd8\xff\xe0\x00\x10JFIF"      # SOI then EOF
    corrupt_png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16     # no valid IHDR
    rows = [
        (1, truncated_jpeg, {"height": 5, "width": 6, "channels": 3}),
        (2, corrupt_png, {"height": 2, "width": 3, "channels": 1}),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, payload binary, "
              "meta struct<height:int,width:int,channels:int>")
    got = {r.doc_id: r for r in decode_images(df).collect()}
    assert (got[1].height, got[1].width, got[1].channels) == (5, 6, 3)
    assert got[1].n_bytes == len(truncated_jpeg)
    assert got[1].mean_byte == pytest.approx(
        sum(truncated_jpeg) / len(truncated_jpeg))
    assert (got[2].height, got[2].width, got[2].channels) == (2, 3, 1)
    assert got[2].n_bytes == len(corrupt_png)
