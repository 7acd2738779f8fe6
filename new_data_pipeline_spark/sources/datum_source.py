"""``ndpdatum``: a Spark Python DataSource (4.x API) for the reference's
Datum wire format — the record stream the reference writes into its KV
store (reference serialize.py:796 wire layout; datum_bridge.py is the
hand-written codec) surfaced as a first-class ``spark.read.format(...)``
/ ``df.write.format(...)`` source.

Container layout (one directory = one dataset):
- ``part-*.datum``: a record stream; each record is
  ``varint(key) varint(len) payload`` where payload is Datum wire bytes.
  Record streams are not byte-splittable, so the parallelism unit is the
  FILE — the writer emits one file per Spark partition (the same
  contract as Avro/SequenceFile containers: many medium files, not one
  giant one).
- ``_ndp_datum_manifest.json``: per-file row counts and [min,max] key
  ranges, written atomically at commit.

Scale design:
- partitions() = one InputPartition per data file → a 1000-file dataset
  fans out across 1000 tasks with zero coordination.
- pushFilters() accepts key-range predicates (=, <, <=, >, >=, IN on
  ``key``) and prunes whole FILES via the manifest before any byte is
  read — the same data-skipping contract parquet row-group stats give,
  at the source-file granularity. Residual row-level filtering is
  returned to Spark (conservative: we prune files, Spark re-checks
  rows).
- read() streams records lazily (no whole-file materialization beyond
  the OS page cache granularity; files are one partition's worth).
- Writes are atomic-by-rename per task plus a manifest-at-commit, so a
  failed job leaves no visible partial dataset (same recipe as the
  multi-stream sink, sources/sink.py).

Usage::

    from new_data_pipeline_spark.sources.datum_source import register_datum_source
    register_datum_source(spark)
    df.write.format("ndpdatum").mode("overwrite").save(path)
    back = spark.read.format("ndpdatum").load(path)   # key bigint, datum binary
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, DataSourceWriter, EqualTo, Filter,
    GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual,
    InputPartition, WriterCommitMessage)
from pyspark.sql.types import StructType

MANIFEST = "_ndp_datum_manifest.json"
SCHEMA = "key bigint, datum binary"


# ------------------------------------------------------------ wire helpers

def _write_varint(out: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def write_datum_file(path: str, records: list[tuple[int, bytes]]) -> None:
    """Write one ``part-*.datum`` record stream (varint key, varint len,
    payload), atomically via rename."""
    out = bytearray()
    for key, payload in records:
        _write_varint(out, key)
        _write_varint(out, len(payload))
        out += payload
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(bytes(out))
    os.replace(tmp, path)


def read_datum_file(path: str):
    """Yield (key, payload) from one record stream."""
    with open(path, "rb") as f:
        buf = f.read()
    pos, n = 0, len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        ln, pos = _read_varint(buf, pos)
        yield key, buf[pos:pos + ln]
        pos += ln


# ------------------------------------------------------------ reader

@dataclass
class _FilePartition(InputPartition):
    path: str


class DatumReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ndpdatum: path option is required")
        # key-range constraints accumulated by pushFilters:
        # (lo, lo_inclusive, hi, hi_inclusive, in_set)
        self._lo: int | None = None
        self._lo_inc = True
        self._hi: int | None = None
        self._hi_inc = True
        self._in: frozenset[int] | None = None

    # -- pushdown ------------------------------------------------------
    def pushFilters(self, filters):
        for flt in filters:
            handled = self._try_push(flt)
            if not handled:
                yield flt
            else:
                # conservatively ask Spark to still evaluate row-level —
                # we only prune FILES with it (manifest granularity)
                yield flt

    def _try_push(self, flt: Filter) -> bool:
        col = getattr(flt, "attribute", None)
        if col != ("key",):
            return False
        if isinstance(flt, EqualTo):
            v = int(flt.value)
            self._lo = v if self._lo is None else max(self._lo, v)
            self._hi = v if self._hi is None else min(self._hi, v)
            return True
        if isinstance(flt, GreaterThan):
            v = int(flt.value)
            if self._lo is None or v >= self._lo:
                self._lo, self._lo_inc = v, False
            return True
        if isinstance(flt, GreaterThanOrEqual):
            v = int(flt.value)
            if self._lo is None or v > self._lo:
                self._lo, self._lo_inc = v, True
            return True
        if isinstance(flt, LessThan):
            v = int(flt.value)
            if self._hi is None or v <= self._hi:
                self._hi, self._hi_inc = v, False
            return True
        if isinstance(flt, LessThanOrEqual):
            v = int(flt.value)
            if self._hi is None or v < self._hi:
                self._hi, self._hi_inc = v, True
            return True
        if isinstance(flt, In):
            vals = frozenset(int(v) for v in flt.values)
            self._in = vals if self._in is None else (self._in & vals)
            return True
        return False

    def _file_survives(self, meta: dict) -> bool:
        fmin, fmax = meta["min_key"], meta["max_key"]
        if self._lo is not None:
            if fmax < self._lo or (fmax == self._lo and not self._lo_inc):
                return False
        if self._hi is not None:
            if fmin > self._hi or (fmin == self._hi and not self._hi_inc):
                return False
        if self._in is not None and all(
                v < fmin or v > fmax for v in self._in):
            return False
        return True

    # -- planning ------------------------------------------------------
    def partitions(self):
        manifest_path = os.path.join(self.path, MANIFEST)
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = json.load(f)
            files = [m["file"] for m in manifest["files"]
                     if m["rows"] > 0 and self._file_survives(m)]
        else:  # manifest-less directory: every data file scans
            files = sorted(f for f in os.listdir(self.path)
                           if f.endswith(".datum"))
        if not files:
            # an empty partition list makes Spark invoke read(None);
            # hand it one explicit empty-scan sentinel instead
            return [_FilePartition("")]
        return [_FilePartition(os.path.join(self.path, f)) for f in files]

    # -- execution -----------------------------------------------------
    def read(self, partition: _FilePartition):
        if partition is None or not partition.path:
            return
        yield from read_datum_file(partition.path)


# ------------------------------------------------------------ writer

@dataclass
class _FileCommit(WriterCommitMessage):
    file: str
    rows: int
    min_key: int
    max_key: int


class DatumWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ndpdatum: path option is required")
        self.overwrite = overwrite

    def write(self, rows):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.datum"
        recs, kmin, kmax = [], None, None
        for row in rows:
            k = int(row["key"])
            payload = bytes(row["datum"]) if row["datum"] is not None else b""
            recs.append((k, payload))
            kmin = k if kmin is None else min(kmin, k)
            kmax = k if kmax is None else max(kmax, k)
        write_datum_file(os.path.join(self.path, name), recs)
        return _FileCommit(file=name, rows=len(recs),
                           min_key=kmin if kmin is not None else 0,
                           max_key=kmax if kmax is not None else -1)

    def commit(self, messages):
        if self.overwrite:
            keep = {m.file for m in messages} | {MANIFEST}
            for f in os.listdir(self.path):
                if f.endswith(".datum") and f not in keep:
                    os.remove(os.path.join(self.path, f))
        manifest = {"version": 1,
                    "files": sorted(
                        ({"file": m.file, "rows": m.rows,
                          "min_key": m.min_key, "max_key": m.max_key}
                         for m in messages), key=lambda d: d["file"])}
        tmp = os.path.join(self.path, f".{MANIFEST}.tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(self.path, MANIFEST))

    def abort(self, messages):
        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.file))
            except OSError:
                pass


# ------------------------------------------------------------ data source

class DatumDataSource(DataSource):
    """``spark.read.format("ndpdatum")`` / ``.write.format("ndpdatum")``.

    Fixed schema ``key bigint, datum binary``; decode the payload with
    datum_bridge.from_datum (Arrow-batched) — source I/O and wire
    decode stay composable, so a projection that never touches the
    payload never decodes it.
    """

    @classmethod
    def name(cls) -> str:
        return "ndpdatum"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType) -> DatumReader:
        return DatumReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DatumWriter:
        return DatumWriter(self.options, overwrite)


def register_datum_source(spark) -> None:
    """Idempotently register the ndpdatum format on this session.

    Also enables ``spark.sql.python.filterPushdown.enabled`` — Spark 4
    refuses to plan a Python DataSource that implements pushFilters()
    while the flag is off, and manifest-based file pruning is the whole
    point of this source.
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DatumDataSource)
