"""ndpdatum Python DataSource: round-trip, parallelism contract,
manifest-based file pruning, and composition with the wire codec.

(Measurement-free — safe to run alongside benches.)
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from new_data_pipeline_spark.sources.datum_bridge import (
    encode_datum, from_datum)
from new_data_pipeline_spark.sources.datum_source import (
    MANIFEST, read_datum_file, register_datum_source, write_datum_file)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_datum_source(spark)


def _payload(i: int) -> bytes:
    return encode_datum(
        {"classs": {"identifier": f"doc-{i}", "slabel": f"label_{i % 3}",
                    "nlabel": i % 3, "multilabel": None}})


def test_file_roundtrip(tmp_path):
    recs = [(i, _payload(i)) for i in (0, 1, 7, 128, 300_000)]
    p = str(tmp_path / "one.datum")
    write_datum_file(p, recs)
    assert list(read_datum_file(p)) == recs


def test_write_read_roundtrip(spark, tmp_path):
    out = str(tmp_path / "ds")
    df = spark.range(100).select(
        F.col("id").alias("key"),
        F.udf(_payload, "binary")(F.col("id")).alias("datum"))
    df.repartition(4).write.format("ndpdatum").mode("append").save(out)
    back = spark.read.format("ndpdatum").load(out)
    assert back.count() == 100
    assert sorted(r.key for r in back.collect()) == list(range(100))
    got = {r.key: bytes(r.datum) for r in back.collect()}
    assert got[7] == _payload(7)


def test_one_partition_per_file(spark, tmp_path):
    out = str(tmp_path / "par")
    df = spark.range(64).select(F.col("id").alias("key"),
                                F.lit(b"\x0a\x00").alias("datum"))
    df.repartition(8).write.format("ndpdatum").mode("append").save(out)
    files = [f for f in os.listdir(out) if f.endswith(".datum")]
    assert len(files) == 8
    back = spark.read.format("ndpdatum").load(out)
    assert back.rdd.getNumPartitions() == 8


def test_manifest_written_and_correct(spark, tmp_path):
    out = str(tmp_path / "man")
    df = spark.range(10).select(F.col("id").alias("key"),
                                F.lit(b"").alias("datum"))
    # range-partition so each file owns a contiguous key range
    df.repartitionByRange(2, "key").write.format("ndpdatum").mode("append").save(out)
    with open(os.path.join(out, MANIFEST)) as f:
        manifest = json.load(f)
    assert sum(m["rows"] for m in manifest["files"]) == 10
    spans = sorted((m["min_key"], m["max_key"]) for m in manifest["files"])
    assert spans[0][0] == 0 and spans[-1][1] == 9


def test_key_filter_prunes_files(spark, tmp_path):
    out = str(tmp_path / "prune")
    df = spark.range(1000).select(F.col("id").alias("key"),
                                  F.lit(b"").alias("datum"))
    df.repartitionByRange(10, "key").write.format("ndpdatum").mode("append").save(out)
    narrow = (spark.read.format("ndpdatum").load(out)
              .filter(F.col("key") == 555))
    # file pruning: only the file whose [min,max] covers 555 is planned
    assert narrow.rdd.getNumPartitions() == 1
    assert [r.key for r in narrow.collect()] == [555]
    ranged = (spark.read.format("ndpdatum").load(out)
              .filter((F.col("key") >= 100) & (F.col("key") < 305)))
    assert ranged.rdd.getNumPartitions() == 3  # files 100-199/200-299/300-399
    assert ranged.count() == 205


def test_overwrite_replaces_dataset(spark, tmp_path):
    out = str(tmp_path / "ow")
    mk = lambda n: spark.range(n).select(  # noqa: E731
        F.col("id").alias("key"), F.lit(b"").alias("datum"))
    mk(50).repartition(5).write.format("ndpdatum").mode("append").save(out)
    mk(20).repartition(2).write.format("ndpdatum").mode(
        "overwrite").save(out)
    back = spark.read.format("ndpdatum").load(out)
    assert back.count() == 20
    assert len([f for f in os.listdir(out) if f.endswith(".datum")]) == 2


def test_composes_with_wire_decode(spark, tmp_path):
    out = str(tmp_path / "dec")
    df = spark.range(30).select(
        F.col("id").alias("key"),
        F.udf(_payload, "binary")(F.col("id")).alias("datum"))
    df.repartition(3).write.format("ndpdatum").mode("append").save(out)
    decoded = from_datum(spark.read.format("ndpdatum").load(out))
    counts = {r.slabel: r.n for r in
              (decoded.groupBy(F.col("classs.slabel").alias("slabel"))
               .agg(F.count("*").alias("n")).collect())}
    assert counts == {"label_0": 10, "label_1": 10, "label_2": 10}
