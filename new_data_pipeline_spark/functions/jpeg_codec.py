"""Pure-Python baseline JPEG codec: a real ITU T.81 sequential-DCT
decoder (and a minimal encoder for tests/synthesis) with no native
deps — numpy only, for the 8×8 DCT basis.

The container ships no cv2/PIL (the reference decodes with
``cv2.imread`` — reference serialize.py:34,44-64). PNG landed in round
3 via stdlib zlib; JPEG needs no external entropy codec either — just
Huffman tables and an 8×8 IDCT — so this module closes the last image
gap: baseline (SOF0) JPEG, 8-bit, grayscale or YCbCr, 4:4:4 / 4:2:2 /
4:2:0 chroma subsampling, restart markers. Progressive (SOF2) and
arithmetic coding are rejected with ValueError so the operator's
byte-stats fallback engages instead of mis-decoding.

The encoder is deliberately simple (4:4:4 or 4:2:0, one canonical
8-bit-per-symbol Huffman table embedded in DHT, caller-chosen quant
tables): its job is to produce spec-conformant streams the decoder is
tested against — roundtrip error with flat quant tables is bounded by
DCT float rounding alone, which the tests pin to ±3 counts.

Format reference: the public JPEG specification (ITU-T T.81),
re-implemented from the spec, not from any codebase.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# 8x8 DCT-II basis: C[k, n] = s(k) * cos((2n+1) k pi / 16)
_C = np.array([[(np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
                * np.cos((2 * n + 1) * k * np.pi / 16)
                for n in range(8)] for k in range(8)])


def is_jpeg(data: bytes) -> bool:
    return data[:2] == b"\xff\xd8"


# ---------------------------------------------------------------- huffman

class _HuffTable:
    """Canonical Huffman table from DHT (bits[1..16], values)."""

    def __init__(self, bits: list[int], values: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: handled by caller
                raise _RestartMarker()
            else:
                raise EOFError("marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")

    def align_to_marker(self) -> None:
        """Skip past an RSTn marker and reset bit state."""
        while self.data[self.pos] != 0xFF or \
                not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2
        self.acc = 0
        self.n = 0


class _RestartMarker(Exception):
    pass


def _extend(v: int, t: int) -> int:
    """DC/AC value extension (T.81 F.2.2.1): t-bit magnitude to signed."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------- decoder

def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG → (height, width, channels, pixel bytes).

    Pixels are interleaved row-major uint8 (RGB for 3-component YCbCr
    streams, single plane for grayscale). Raises ValueError on
    progressive/arithmetic/12-bit streams.
    """
    if not is_jpeg(data):
        raise ValueError("not a JPEG stream")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        body = data[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.array(list(body[i + 1:i + 65]), dtype=np.float64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1:i + 17])
                nval = sum(bits)
                values = body[i + 17:i + 17 + nval]
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(bits, values)
                i += 17 + nval
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, ncomp = body[0], *struct.unpack(">HH", body[1:5]), \
                body[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = {}
            for s in range(ns):
                cs, tables = body[1 + 2 * s], body[2 + 2 * s]
                scan[cs] = (tables >> 4, tables & 15)
            return _decode_scan(data, pos, frame, scan, qt, huff_dc,
                                huff_ac, restart_interval)
    raise ValueError("no scan data found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.align_to_marker()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        try:
                            block, pred[ci] = _decode_block(
                                reader, huff_dc[td], huff_ac[ta], q,
                                pred[ci])
                        except _RestartMarker:
                            reader.align_to_marker()
                            pred = [0] * len(comps)
                            block, pred[ci] = _decode_block(
                                reader, huff_dc[td], huff_ac[ta], q,
                                pred[ci])
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
    # upsample to full resolution, crop, color-convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        out = np.clip(np.round(full[0] + 128), 0, 255).astype(np.uint8)
        return h, w, 1, out.tobytes()
    y, cb, cr = full[0] + 128, full[1], full[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return h, w, 3, out.tobytes()


def _decode_block(reader, dc_table, ac_table, q, pred):
    coeffs = np.zeros(64)
    t = reader.huff(dc_table)
    diff = _extend(reader.bits(t), t) if t else 0
    pred += diff
    coeffs[0] = pred
    k = 1
    while k < 64:
        rs = reader.huff(ac_table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coeffs[k] = _extend(reader.bits(s), s)
        k += 1
    dezz = np.zeros(64)
    dezz[ZIGZAG] = coeffs * q
    block = dezz.reshape(8, 8)
    return _C.T @ block @ _C, pred  # 2-D IDCT


# ---------------------------------------------------------------- encoder

def _canonical_dht(symbols: list[int]) -> tuple[list[int], bytes,
                                                dict[int, tuple[int, int]]]:
    """One canonical table: every symbol gets an 8-bit code (≤255
    symbols; JPEG AC alphabets have 162). Returns (bits, values,
    symbol→(code, length))."""
    bits = [0] * 16
    bits[7] = len(symbols)  # all codes length 8
    codes = {}
    code = 0
    # canonical: lengths 1..7 empty, so first length-8 code is 0
    for s in symbols:
        codes[s] = (code, 8)
        code += 1
    return bits, bytes(symbols), codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc <<= (8 - self.n)
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _category(v: int) -> int:
    a, t = abs(v), 0
    while a:
        a >>= 1
        t += 1
    return t


def encode_jpeg(pixels: bytes, height: int, width: int, channels: int,
                quant: int = 1, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Minimal baseline encoder (test/synthesis twin of decode_jpeg):
    grayscale or RGB input, flat quant tables of value ``quant``,
    4:4:4 or (``subsample``) 4:2:0, one shared canonical Huffman pair,
    optional RSTn markers every ``restart_interval`` MCUs (exercises
    the decoder's DRI/restart path).
    """
    img = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    if channels == 1:
        comps_px = [img.reshape(height, width) - 128]
        samp = [(1, 1)]
    else:
        rgb = img.reshape(height, width, 3)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            def down(p):
                he, we = (p.shape[0] + 1) // 2 * 2, (p.shape[1] + 1) // 2 * 2
                pp = np.pad(p, ((0, he - p.shape[0]), (0, we - p.shape[1])),
                            mode="edge")
                return (pp[0::2, 0::2] + pp[1::2, 0::2]
                        + pp[0::2, 1::2] + pp[1::2, 1::2]) / 4.0
            comps_px = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            comps_px = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    q = np.full(64, float(quant))
    dc_syms = list(range(12))
    ac_syms = sorted({(r << 4) | s for r in range(16)
                      for s in range(1, 11)} | {0x00, 0xF0})
    dc_bits, dc_vals, dc_codes = _canonical_dht(dc_syms)
    ac_bits, ac_vals, ac_codes = _canonical_dht(ac_syms)

    hmax = max(hh for hh, _ in samp)
    vmax = max(vv for _, vv in samp)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    padded = []
    for (hh, vv), p in zip(samp, comps_px):
        ph, pw = mcuy * vv * 8, mcux * hh * 8
        padded.append(np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                             mode="edge"))

    writer = _BitWriter()
    pred = [0] * len(padded)
    mcu_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and \
                    mcu_idx % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0
                                     + (mcu_idx // restart_interval - 1) % 8])
                pred = [0] * len(padded)
            mcu_idx += 1
            for ci, ((hh, vv), p) in enumerate(zip(samp, padded)):
                for by in range(vv):
                    for bx in range(hh):
                        y0 = (my * vv + by) * 8
                        x0 = (mx * hh + bx) * 8
                        block = p[y0:y0 + 8, x0:x0 + 8]
                        coeffs = _C @ block @ _C.T
                        zz = np.round(coeffs.flatten()[ZIGZAG] / q)
                        zz = zz.astype(int)
                        diff = zz[0] - pred[ci]
                        pred[ci] = zz[0]
                        t = _category(diff)
                        writer.write(*dc_codes[t])
                        if t:
                            writer.write(diff if diff >= 0
                                         else diff + (1 << t) - 1, t)
                        run = 0
                        last_nz = max(np.nonzero(zz)[0]) if zz.any() else 0
                        for k in range(1, 64):
                            v = zz[k]
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                writer.write(*ac_codes[0xF0])
                                run -= 16
                            s = _category(v)
                            writer.write(*ac_codes[(run << 4) | s])
                            writer.write(v if v >= 0
                                         else v + (1 << s) - 1, s)
                            run = 0
                        if last_nz < 63:
                            writer.write(*ac_codes[0x00])  # EOB
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    qt_body = bytes([0]) + bytes(int(x) for x in q)
    ncomp = len(padded)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    sos = bytes([ncomp])
    for ci, (hh, vv) in enumerate(samp):
        sof += bytes([ci + 1, (hh << 4) | vv, 0])
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    dht = (bytes([0x00]) + bytes(dc_bits) + dc_vals
           + bytes([0x10]) + bytes(ac_bits) + ac_vals)
    dri = (seg(0xDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    return (b"\xff\xd8" + seg(0xDB, qt_body) + seg(0xC0, sof)
            + seg(0xC4, dht) + dri + seg(0xDA, sos)
            + bytes(writer.out) + b"\xff\xd9")
