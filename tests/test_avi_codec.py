"""AVI codec gates: roundtrip through the raw-DIB container (row
padding, bottom-up flip, BGR swap all exercised by non-multiple-of-4
widths) plus the compressed-stream rejection that keeps the operator
fallback safe."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from new_data_pipeline_spark.functions.avi_codec import (
    decode_avi, encode_avi, is_avi)

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("w,h", [(4, 4), (5, 3), (7, 2)])  # 5,7: padding
def test_roundtrip_raw_frames(w, h):
    frames = [RNG.integers(0, 256, size=h * w * 3, dtype=np.uint8).tobytes()
              for _ in range(3)]
    b = encode_avi(frames, w, h, fps=10.0)
    assert is_avi(b)
    d = decode_avi(b)
    assert (d.width, d.height, len(d.frames)) == (w, h, 3)
    assert d.fps == pytest.approx(10.0)
    assert d.frames == frames  # raw container: bit-exact roundtrip


def test_rejects_compressed_and_garbage():
    assert not is_avi(b"RIFF....WAVE")
    with pytest.raises(ValueError):
        decode_avi(b"garbage")
    # flip biCompression to a fourcc: must be rejected, not mis-decoded
    b = bytearray(encode_avi(
        [bytes(4 * 2 * 3)], 4, 2, fps=5.0))
    strf = b.find(b"strf")
    struct.pack_into("<I", b, strf + 8 + 16, 0x34363248)  # 'H264'
    with pytest.raises(ValueError):
        decode_avi(bytes(b))


def test_top_down_dib_decodes_unflipped():
    """Spec-valid top-down DIB (negative biHeight in strf) must decode
    in stored row order, not be vertically flipped by the bottom-up
    convention."""
    w, h = 5, 3
    frame = RNG.integers(0, 256, size=h * w * 3, dtype=np.uint8).tobytes()
    b = bytearray(encode_avi([frame], w, h, fps=2.0))
    bottom_up = decode_avi(bytes(b)).frames[0]

    strf = b.find(b"strf")
    struct.pack_into("<i", b, strf + 8 + 8, -h)  # biHeight := -h
    top_down = decode_avi(bytes(b)).frames[0]

    stride = w * 3
    rows_bu = [bottom_up[y * stride:(y + 1) * stride] for y in range(h)]
    rows_td = [top_down[y * stride:(y + 1) * stride] for y in range(h)]
    assert rows_td == rows_bu[::-1]  # same rows, opposite order


def test_strf_avih_geometry_mismatch_rejected():
    """A strf whose biWidth/biHeight disagrees with avih engages the
    fallback (ValueError) instead of mis-decoding with the wrong
    stride."""
    b = bytearray(encode_avi([bytes(4 * 2 * 3)], 4, 2, fps=5.0))
    strf = b.find(b"strf")
    struct.pack_into("<i", b, strf + 8 + 4, 6)  # biWidth := 6 != 4
    with pytest.raises(ValueError):
        decode_avi(bytes(b))


def test_frame_sampling_stride():
    """The operator's every-Nth sampling contract over real frames."""
    frames = [bytes([i] * (2 * 2 * 3)) for i in range(10)]
    d = decode_avi(encode_avi(frames, 2, 2, fps=1.0))
    sampled = d.frames[::4]
    assert [f[0] for f in sampled] == [0, 4, 8]


def test_decode_video_frames_spark_stage(spark):
    """The Arrow video stage: real AVI payloads fan out to sampled
    frame rows; garbage payloads take the sentinel fallback row."""
    from new_data_pipeline_spark.operators.multimodal import (
        decode_video_frames)

    frames = [bytes([i * 10] * (4 * 2 * 3)) for i in range(7)]
    avi = encode_avi(frames, 4, 2, fps=5.0)
    df = spark.createDataFrame(
        [(1, avi), (2, b"not-a-video")], "doc_id bigint, payload binary")
    got = decode_video_frames(df, every_n=3).collect()
    vid = sorted([r for r in got if r.doc_id == 1],
                 key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in vid] == [0, 3, 6]
    assert all((r.width, r.height) == (4, 2) for r in vid)
    assert [r.mean_pixel for r in vid] == [0.0, 30.0, 60.0]
    [fb] = [r for r in got if r.doc_id == 2]
    assert fb.frame_idx == -1 and fb.width == 0
