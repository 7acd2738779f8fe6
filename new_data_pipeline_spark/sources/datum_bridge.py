"""Interop bridge for the reference's protobuf ``Datum`` records.

The reference serializes every sample as a proto2 ``Datum`` message
(reference datum.proto:3-48; written via SerializeToString at reference
serialize.py:356-384 and read back in its LMDB consumers). Systems that
still speak that format need a path into and out of this engine's
struct/parquet encoding — this module provides it.

The container ships no ``google.protobuf``, so the codec implements the
proto2 *wire format* directly (varints + length-delimited submessages —
the format is public and stable by design). Only the Datum schema is
supported; this is an interop shim, not a protobuf library. Decoding
accepts both packed and unpacked repeated floats; encoding writes
unpacked (proto2's default for ``repeated float`` without [packed]).

Spark surface: ``from_datum`` / ``to_datum`` run the codec over
``mapInPandas`` (Arrow batches, no driver collect). An interop bridge
is not a hot path — the engine's native storage is columnar parquet,
which is strictly better for scans (SURVEY.md §2.1 T4) — so per-row
Python here is the documented trade, bounded to ingest/egress edges.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame

# ---------------------------------------------------------------- wire format

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


def _write_varint(out: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _write_tag(out: bytearray, field: int, wt: int) -> None:
    _write_varint(out, (field << 3) | wt)


def _write_len(out: bytearray, field: int, payload: bytes) -> None:
    _write_tag(out, field, _WT_LEN)
    _write_varint(out, len(payload))
    out.extend(payload)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _read_fields(buf: bytes) -> Iterator[tuple[int, int, Any]]:
    """Yield (field_number, wire_type, raw_value) triples."""
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == _WT_VARINT:
            val, pos = _read_varint(buf, pos)
        elif wt == _WT_I32:
            val = buf[pos:pos + 4]
            pos += 4
        elif wt == _WT_I64:
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == _WT_LEN:
            n, pos = _read_varint(buf, pos)
            val = buf[pos:pos + n]
            pos += n
        else:  # pragma: no cover - groups are pre-proto2 legacy
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


# ------------------------------------------------------------- Datum schema
# Field maps mirror reference datum.proto:3-48.

def _encode_numeric(m: dict) -> bytes:
    out = bytearray()
    _write_len(out, 1, m["identifier"].encode())
    if m.get("dim") is not None:  # Size submessage, field 2 / dim field 1
        size = bytearray()
        _write_tag(size, 1, _WT_VARINT)
        _write_varint(size, m["dim"])
        _write_len(out, 2, bytes(size))
    if m.get("data") is not None:
        _write_len(out, 3, bytes(m["data"]))
    return bytes(out)


def _encode_imgdata(m: dict) -> bytes:
    out = bytearray()
    _write_len(out, 1, m["identifier"].encode())
    for field, key in ((2, "channels"), (3, "height"), (4, "width")):
        if m.get(key) is not None:
            _write_tag(out, field, _WT_VARINT)
            _write_varint(out, m[key])
    if m.get("data") is not None:
        _write_len(out, 5, bytes(m["data"]))
    for f in m.get("float_data") or ():
        _write_tag(out, 6, _WT_I32)
        out.extend(struct.pack("<f", f))
    if m.get("encoded") is not None:
        _write_tag(out, 7, _WT_VARINT)
        _write_varint(out, int(m["encoded"]))
    return bytes(out)


def _encode_videodata(m: dict) -> bytes:
    out = bytearray()
    _write_len(out, 1, m["identifier"].encode())
    for field, key in ((2, "frames"), (3, "height"), (4, "width"),
                       (5, "channels")):
        if m.get(key) is not None:
            _write_tag(out, field, _WT_VARINT)
            _write_varint(out, m[key])
    if m.get("duration") is not None:
        _write_tag(out, 6, _WT_I32)
        out.extend(struct.pack("<f", m["duration"]))
    if m.get("data") is not None:
        _write_len(out, 7, bytes(m["data"]))
    return bytes(out)


def _encode_class(m: dict) -> bytes:
    out = bytearray()
    _write_len(out, 1, m["identifier"].encode())
    if m.get("slabel") is not None:
        _write_len(out, 2, m["slabel"].encode())
    if m.get("nlabel") is not None:
        _write_tag(out, 3, _WT_VARINT)
        _write_varint(out, m["nlabel"])
    if m.get("multilabel") is not None:
        _write_len(out, 4, bytes(m["multilabel"]))
    return bytes(out)


def encode_datum(d: dict) -> bytes:
    """dict → Datum wire bytes. Top-level fields: numeric=10,
    imgdata=11, videodata=12, classs=13 (reference datum.proto:3-8)."""
    out = bytearray()
    for field, key, enc in ((10, "numeric", _encode_numeric),
                            (11, "imgdata", _encode_imgdata),
                            (12, "videodata", _encode_videodata),
                            (13, "classs", _encode_class)):
        if d.get(key) is not None:
            _write_len(out, field, enc(d[key]))
    return bytes(out)


def _dec_f32(raw: bytes) -> float:
    return struct.unpack("<f", raw)[0]


def _decode_numeric(buf: bytes) -> dict:
    m: dict = {"identifier": "", "dim": None, "data": None}
    for field, _wt, val in _read_fields(buf):
        if field == 1:
            m["identifier"] = val.decode()
        elif field == 2:
            for f2, _w2, v2 in _read_fields(val):
                if f2 == 1:
                    m["dim"] = v2
        elif field == 3:
            m["data"] = bytes(val)
    return m


def _decode_imgdata(buf: bytes) -> dict:
    m: dict = {"identifier": "", "channels": None, "height": None,
               "width": None, "data": None, "float_data": [],
               "encoded": None}
    for field, wt, val in _read_fields(buf):
        if field == 1:
            m["identifier"] = val.decode()
        elif field == 2:
            m["channels"] = val
        elif field == 3:
            m["height"] = val
        elif field == 4:
            m["width"] = val
        elif field == 5:
            m["data"] = bytes(val)
        elif field == 6:
            if wt == _WT_I32:
                m["float_data"].append(_dec_f32(val))
            else:  # packed encoding: one LEN record of n*4 bytes
                m["float_data"].extend(
                    struct.unpack(f"<{len(val) // 4}f", val))
        elif field == 7:
            m["encoded"] = bool(val)
    return m


def _decode_videodata(buf: bytes) -> dict:
    m: dict = {"identifier": "", "frames": None, "height": None,
               "width": None, "channels": None, "duration": None,
               "data": None}
    fields = {2: "frames", 3: "height", 4: "width", 5: "channels"}
    for field, _wt, val in _read_fields(buf):
        if field == 1:
            m["identifier"] = val.decode()
        elif field in fields:
            m[fields[field]] = val
        elif field == 6:
            m["duration"] = _dec_f32(val)
        elif field == 7:
            m["data"] = bytes(val)
    return m


def _decode_class(buf: bytes) -> dict:
    m: dict = {"identifier": "", "slabel": None, "nlabel": None,
               "multilabel": None}
    for field, _wt, val in _read_fields(buf):
        if field == 1:
            m["identifier"] = val.decode()
        elif field == 2:
            m["slabel"] = val.decode()
        elif field == 3:
            m["nlabel"] = val
        elif field == 4:
            m["multilabel"] = bytes(val)
    return m


def decode_datum(buf: bytes) -> dict:
    """Datum wire bytes → dict with keys numeric/imgdata/videodata/classs
    (absent submessages → None)."""
    d: dict = {"numeric": None, "imgdata": None, "videodata": None,
               "classs": None}
    decoders = {10: ("numeric", _decode_numeric),
                11: ("imgdata", _decode_imgdata),
                12: ("videodata", _decode_videodata),
                13: ("classs", _decode_class)}
    for field, _wt, val in _read_fields(buf):
        if field in decoders:
            key, dec = decoders[field]
            d[key] = dec(val)
    return d


# ------------------------------------------------------------ Spark surface

DATUM_SPARK_SCHEMA = """
    numeric STRUCT<identifier: STRING, dim: INT, data: BINARY>,
    imgdata STRUCT<identifier: STRING, channels: INT, height: INT,
                   width: INT, data: BINARY, float_data: ARRAY<FLOAT>,
                   encoded: BOOLEAN>,
    videodata STRUCT<identifier: STRING, frames: INT, height: INT,
                     width: INT, channels: INT, duration: FLOAT,
                     data: BINARY>,
    classs STRUCT<identifier: STRING, slabel: STRING, nlabel: INT,
                  multilabel: BINARY>
"""


def from_datum(df: DataFrame, bin_col: str = "datum",
               passthrough: list[str] | None = None) -> DataFrame:
    """Parse a binary Datum column into typed struct columns.

    Arrow-batched via mapInPandas; ``passthrough`` columns are carried
    alongside the parsed structs.
    """
    keep = passthrough or [c for c in df.columns if c != bin_col]
    schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in keep]
        + [DATUM_SPARK_SCHEMA])

    def parse(batches):
        for pdf in batches:
            parsed = [decode_datum(b) for b in pdf[bin_col]]
            out = pdf[keep].copy()
            for key in ("numeric", "imgdata", "videodata", "classs"):
                out[key] = [p[key] for p in parsed]
            yield out

    return df.mapInPandas(parse, schema)


def to_datum(df: DataFrame, out_col: str = "datum",
             passthrough: list[str] | None = None) -> DataFrame:
    """Serialize numeric/imgdata/videodata/classs struct columns back to
    Datum wire bytes (the reverse of ``from_datum``)."""
    parts = [c for c in ("numeric", "imgdata", "videodata", "classs")
             if c in df.columns]
    keep = passthrough or [c for c in df.columns if c not in parts]
    schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in keep]
        + [f"{out_col} BINARY"])

    def serialize(batches):
        for pdf in batches:
            out = pdf[keep].copy()
            out[out_col] = [
                encode_datum({k: (row[k] if isinstance(row.get(k), dict)
                                  else (row[k].asDict(recursive=True)
                                        if row.get(k) is not None else None))
                              for k in parts})
                for row in pdf[parts].to_dict("records")]
            yield out

    return df.mapInPandas(serialize, schema)
