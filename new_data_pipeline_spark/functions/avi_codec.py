"""Pure-stdlib AVI (RIFF) parser for uncompressed (DIB/RGB24) video:
real frame extraction with no native deps.

The container ships no ffmpeg/cv2, but the AVI container itself is the
same RIFF framing as WAV (functions/wav_codec.py), and the DIB
(biCompression=0) payload is raw bottom-up BGR rows — so frame-sampling
a raw-video file needs only struct. Motion-JPEG ('MJPG') streams ALSO
really decode: each frame chunk is a standalone baseline JPEG, handed
to functions/jpeg_codec.py — the one compressed-video codec a
pure-Python stack can genuinely implement. Other compressed fourccs
(H.264/VP9/...) raise ValueError so the operator's metadata-driven
fallback engages rather than mis-decoding.

This closes the last modality stub: image (PNG/JPEG codecs), audio
(WAV), video (raw AVI + MJPEG) all REALLY parse their formats; only
inter-frame codecs stay behind the documented fallback until a codec
library lands.

Format reference: the public RIFF/AVI and BITMAPINFOHEADER layouts
(Microsoft Windows multimedia documentation), re-implemented from the
spec, not from any codebase.
"""

from __future__ import annotations

import struct
from typing import NamedTuple


class AviData(NamedTuple):
    width: int
    height: int
    fps: float
    frames: list[bytes]    # RGB24, top-down, row-major


def is_avi(b: bytes) -> bool:
    return len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"AVI "


# 'MJPG' as the little-endian u32 biCompression stores it: the one
# compressed-video codec a pure-Python stack can REALLY decode, because
# every frame is a standalone baseline JPEG (functions/jpeg_codec.py).
MJPG_FOURCC = struct.unpack("<I", b"MJPG")[0]


def _mjpeg_frame(raw: bytes, width: int, height: int) -> bytes:
    """One MJPEG frame chunk → RGB24 top-down bytes. JPEG frames are
    already top-down RGB (no DIB flip/BGR/pad); grayscale frames
    replicate to 3 channels so the AviData contract stays uniform.
    Geometry disagreements raise (reject rather than mis-decode)."""
    from new_data_pipeline_spark.functions.jpeg_codec import decode_jpeg
    h, w, c, pix = decode_jpeg(raw)
    if (w, h) != (width, height):
        raise ValueError(
            f"MJPEG frame geometry {w}x{h} disagrees with avih "
            f"{width}x{height}")
    if c == 3:
        return pix
    if c == 1:
        out = bytearray(len(pix) * 3)
        out[0::3] = pix
        out[1::3] = pix
        out[2::3] = pix
        return bytes(out)
    raise ValueError(f"unsupported MJPEG channel count {c}")


def _walk(b: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for chunks in [pos, end);
    LIST chunks yield their list-type as fourcc with body after it."""
    while pos + 8 <= end:
        cid = b[pos:pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        if cid == b"LIST":
            yield b[pos + 8:pos + 12], pos + 12, size - 4
        else:
            yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi(b: bytes) -> AviData:
    """Parse an uncompressed AVI → geometry, fps, and RGB24 frames
    (converted from the DIB convention: bottom-up rows, BGR, 4-byte row
    padding). Raises ValueError for compressed or malformed streams."""
    if not is_avi(b):
        raise ValueError("not a RIFF/AVI stream")
    width = height = None
    usec_per_frame = 0
    compression = None
    bi_width = bi_height = None
    frames: list[bytes] = []

    def scan(pos: int, end: int) -> None:
        nonlocal width, height, usec_per_frame, compression
        nonlocal bi_width, bi_height
        for cc, start, size in _walk(b, pos, end):
            if cc in (b"hdrl", b"strl", b"movi"):
                scan(start, start + size)
            elif cc == b"avih":
                usec_per_frame = struct.unpack_from("<I", b, start)[0]
                width = struct.unpack_from("<I", b, start + 32)[0]
                height = struct.unpack_from("<I", b, start + 36)[0]
            elif cc == b"strf" and compression is None:
                # BITMAPINFOHEADER: biWidth/biHeight SIGNED at offsets
                # 4/8 (negative biHeight = top-down DIB), biCompression
                # at offset 16.
                bi_width, bi_height = struct.unpack_from("<ii", b,
                                                         start + 4)
                compression = struct.unpack_from("<I", b, start + 16)[0]
            elif cc[2:4] in (b"db", b"dc"):  # video frame chunk
                frames.append(b[start:start + size])

    scan(12, len(b))
    if width is None or height is None:
        raise ValueError("missing avih header")
    if compression not in (0, None, MJPG_FOURCC):
        raise ValueError(f"compressed AVI (biCompression={compression})")
    # Row order comes from strf's biHeight sign (negative = top-down);
    # cross-check strf geometry against avih so a disagreeing header
    # engages the fallback instead of mis-decoding.
    top_down = bi_height is not None and bi_height < 0
    if bi_height is not None:
        if bi_width != width or abs(bi_height) != height:
            raise ValueError(
                f"strf geometry {bi_width}x{bi_height} disagrees with "
                f"avih {width}x{height}")

    if compression == MJPG_FOURCC:
        fps_ = 1e6 / usec_per_frame if usec_per_frame else 0.0
        return AviData(width, height, fps_,
                       [_mjpeg_frame(raw, width, height) for raw in frames])

    stride = (width * 3 + 3) & ~3  # DIB rows pad to 4 bytes
    rgb_frames = []
    row_order = (range(height) if top_down
                 else range(height - 1, -1, -1))  # bottom-up → top-down
    for raw in frames:
        if len(raw) < stride * height:
            raise ValueError("truncated frame chunk")
        rows = []
        for y in row_order:
            row = raw[y * stride:y * stride + width * 3]
            flipped = bytearray(len(row))
            flipped[0::3] = row[2::3]            # BGR → RGB
            flipped[1::3] = row[1::3]
            flipped[2::3] = row[0::3]
            rows.append(bytes(flipped))
        rgb_frames.append(b"".join(rows))
    fps = 1e6 / usec_per_frame if usec_per_frame else 0.0
    return AviData(width, height, fps, rgb_frames)


def _chunk(cc: bytes, body: bytes) -> bytes:
    return (cc + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) & 1 else b""))


def _lst(cc: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", cc + body)


def _container(payloads: list[bytes], width: int, height: int,
               fps: float, handler: bytes, compression: int,
               buf_size: int, frame_cc: bytes) -> bytes:
    """Shared RIFF/AVI assembly for the DIB and MJPG writers."""
    usec = int(1e6 / fps) if fps else 0
    avih = struct.pack("<14I", usec, 0, 0, 0, len(payloads), 0, 1,
                       buf_size, width, height, 0, 0, 0, 0)
    strh = (b"vids" + handler + struct.pack("<10I", 0, 0, 0, 1,
                                            max(int(fps), 1), 0,
                                            len(payloads), buf_size,
                                            0, 0)
            + struct.pack("<4H", 0, 0, width & 0xFFFF, height & 0xFFFF))
    strf = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24,
                       compression, buf_size, 0, 0, 0, 0)
    hdrl = _lst(b"hdrl", _chunk(b"avih", avih)
                + _lst(b"strl", _chunk(b"strh", strh)
                       + _chunk(b"strf", strf)))
    movi = _lst(b"movi", b"".join(_chunk(frame_cc, f) for f in payloads))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def encode_avi(frames: list[bytes], width: int, height: int,
               fps: float = 10.0) -> bytes:
    """Minimal uncompressed-AVI writer (test/synthesis twin): RGB24
    top-down frames in, spec-conformant RIFF out."""
    stride = (width * 3 + 3) & ~3
    dib_frames = []
    for f in frames:
        rows = []
        for y in range(height - 1, -1, -1):      # top-down → bottom-up
            row = f[y * width * 3:(y + 1) * width * 3]
            bgr = bytearray(len(row))
            bgr[0::3] = row[2::3]
            bgr[1::3] = row[1::3]
            bgr[2::3] = row[0::3]
            rows.append(bytes(bgr) + b"\x00" * (stride - width * 3))
        dib_frames.append(b"".join(rows))
    return _container(dib_frames, width, height, fps, b"DIB ", 0,
                      stride * height, b"00db")


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int,
                     fps: float = 10.0, quant: int = 1) -> bytes:
    """Motion-JPEG AVI writer: each RGB24 top-down frame becomes a
    standalone baseline JPEG chunk (functions/jpeg_codec.encode_jpeg),
    fourcc/biCompression 'MJPG' — the lossy-codec twin of encode_avi,
    exercising the REAL compressed-video decode path."""
    from new_data_pipeline_spark.functions.jpeg_codec import encode_jpeg
    payloads = [encode_jpeg(f, height, width, 3, quant=quant)
                for f in frames]
    buf = max(len(p) for p in payloads) if payloads else 0
    return _container(payloads, width, height, fps, b"MJPG",
                      MJPG_FOURCC, buf, b"00dc")
