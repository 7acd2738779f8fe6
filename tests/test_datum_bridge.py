"""Roundtrip tests for the hand-rolled Datum proto2 wire codec
(reference datum.proto:3-48) and its Spark mapInPandas surface."""

from __future__ import annotations

import struct

import pytest

from new_data_pipeline_spark.sources import datum_bridge as db

NUMERIC_DATUM = {
    "numeric": {"identifier": "sample-1", "dim": 3,
                "data": struct.pack("<3f", 1.0, 2.5, -3.0)},
    "imgdata": None, "videodata": None, "classs": None,
}
IMG_DATUM = {
    "numeric": None,
    "imgdata": {"identifier": "img-7", "channels": 3, "height": 32,
                "width": 32, "data": b"\x00\x01\x02", "float_data": [],
                "encoded": True},
    "videodata": None,
    "classs": {"identifier": "img-7", "slabel": "cat", "nlabel": 2,
               "multilabel": None},
}
VIDEO_DATUM = {
    "numeric": None, "imgdata": None,
    "videodata": {"identifier": "vid-1", "frames": 16, "height": 64,
                  "width": 64, "channels": 3, "duration": 1.5,
                  "data": b"\xff" * 8},
    "classs": None,
}


@pytest.mark.parametrize("datum", [NUMERIC_DATUM, IMG_DATUM, VIDEO_DATUM],
                         ids=["numeric", "img+class", "video"])
def test_codec_roundtrip(datum):
    assert db.decode_datum(db.encode_datum(datum)) == datum


def test_float_data_unpacked_and_packed_decode():
    floats = [0.5, -1.25, 3.0]
    d = {"imgdata": {"identifier": "f", "float_data": floats}}
    got = db.decode_datum(db.encode_datum(d))
    assert got["imgdata"]["float_data"] == floats
    # packed layout (one LEN record) must decode identically — proto2
    # writers with [packed=true] produce it
    packed = bytearray()
    body = bytearray()
    db._write_len(body, 1, b"f")
    db._write_tag(body, 6, db._WT_LEN)
    db._write_varint(body, 12)
    body.extend(struct.pack("<3f", *floats))
    db._write_len(packed, 11, bytes(body))
    got2 = db.decode_datum(bytes(packed))
    assert got2["imgdata"]["float_data"] == floats


def test_varint_multibyte_roundtrip():
    d = {"imgdata": {"identifier": "big", "height": 300, "width": 70000}}
    got = db.decode_datum(db.encode_datum(d))
    assert got["imgdata"]["height"] == 300
    assert got["imgdata"]["width"] == 70000


def test_spark_roundtrip(spark):
    raw = [(1, db.encode_datum(NUMERIC_DATUM)),
           (2, db.encode_datum(IMG_DATUM)),
           (3, db.encode_datum(VIDEO_DATUM))]
    df = spark.createDataFrame(raw, "id bigint, datum binary")
    parsed = db.from_datum(df, "datum")
    rows = {r["id"]: r for r in parsed.collect()}
    assert rows[1]["numeric"]["identifier"] == "sample-1"
    assert rows[2]["imgdata"]["encoded"] is True
    assert rows[2]["classs"]["slabel"] == "cat"
    assert abs(rows[3]["videodata"]["duration"] - 1.5) < 1e-6

    back = db.to_datum(parsed)
    wire = {r["id"]: bytes(r["datum"]) for r in back.collect()}
    for i, original in ((1, NUMERIC_DATUM), (2, IMG_DATUM), (3, VIDEO_DATUM)):
        assert db.decode_datum(wire[i]) == original
