"""``ndpdatum``: a Spark Python DataSource (4.x API) for the reference's
Datum wire format — the record stream the reference writes into its KV
store (reference serialize.py:796 wire layout; datum_bridge.py is the
hand-written codec) surfaced as a first-class ``spark.read.format(...)``
/ ``df.write.format(...)`` source.

Container layout (one directory = one dataset):
- ``part-*.datum``: a record stream; each record is
  ``varint(key) varint(len) payload`` where payload is Datum wire bytes.
- ``_ndp_datum_manifest.json``: per-file row counts, [min,max] key
  ranges, and (manifest v2) per-BLOCK metadata — byte offset/length,
  rows, key range, and a key bloom filter — recorded every
  ``blockBytes`` (default 64 MB) at write, written atomically at
  commit. Blocks make record streams splittable: a single large
  foreign-written file fans out across tasks at block granularity,
  the parquet row-group analog.

Scale design:
- partitions() = one InputPartition per manifest BLOCK (per file when
  a v1 manifest or no manifest is present) → a 10 GB single-file
  dataset still fans out across ~160 tasks with zero coordination.
- pushFilters() accepts key predicates (=, <, <=, >, >=, IN on
  ``key``) and prunes whole FILES and BLOCKS via the manifest before
  any byte is read — min/max spans for range predicates plus a
  per-block bloom filter for point predicates (the same data-skipping
  ladder parquet row-group stats + bloom filters give). Residual
  row-level filtering is returned to Spark (conservative: we prune
  blocks, Spark re-checks rows).
- read() seeks to the block offset and materializes only that block.
- Writes are atomic-by-rename per task plus a manifest-at-commit, so a
  failed job leaves no visible partial dataset (same recipe as the
  multi-stream sink, sources/sink.py).

Input contract (schema ``key bigint, datum binary``): keys must be
non-negative (the wire varint is unsigned — a negative key would not
round-trip and is rejected at write, not silently corrupted) and
payloads must be non-NULL (NULL is rejected rather than coerced to
b'', which would silently conflate NULL with the empty payload).

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
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, DataSourceWriter, EqualTo, Filter,
    GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual,
    InputPartition, WriterCommitMessage)
from pyspark.sql.types import StructType

MANIFEST = "_ndp_datum_manifest.json"
SCHEMA = "key bigint, datum binary"
DEFAULT_BLOCK_BYTES = 64 * 1024 * 1024
BLOOM_K = 7
BLOOM_BITS_PER_KEY = 10
# Manifest-size guard (ADVICE r8): a 64 MB block of tiny records holds
# ~650K keys → 6.5M bloom bits. Cap the filter at 2^23 bits (1 MiB raw,
# far less once deflated) — past the cap the false-positive rate
# degrades gracefully instead of the manifest bloating linearly.
BLOOM_MAX_BITS = 1 << 23


# ------------------------------------------------------------ wire helpers

def _write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        # unsigned wire varint: Python's arithmetic right shift never
        # terminates for negatives — reject instead of looping forever
        raise ValueError(f"ndpdatum: negative value not encodable: {v}")
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


# ------------------------------------------------------------ key bloom

_MASK64 = (1 << 64) - 1


def _bloom_hashes(key: int, m: int) -> list[int]:
    """k bit positions for one key (Kirsch-Mitzenmacher double hashing
    over two multiplicative mixes — deterministic, no randomness). All
    arithmetic wraps at 64 bits so the scalar probe and the vectorized
    numpy build (same formulas in uint64) agree bit-for-bit."""
    h1 = (key * 0x9E3779B97F4A7C15 + 0x2545F4914F6CDD1D) & _MASK64
    h1 ^= h1 >> 29
    h2 = ((key * 0xC2B2AE3D27D4EB4F) | 1) & _MASK64
    h2 ^= h2 >> 31
    return [((h1 + i * h2) & _MASK64) % m for i in range(BLOOM_K)]


def _bloom_build(keys: list[int]) -> dict:
    """Vectorized bloom construction: the writer runs this per block,
    so per-key Python loops would be the ingest hot path — numpy uint64
    does the k·N hash work in C (overflow wraps exactly like the
    masked scalar probe above)."""
    import numpy as np

    m = min(BLOOM_MAX_BITS,
            max(64, ((len(keys) * BLOOM_BITS_PER_KEY + 63) // 64) * 64))
    k = np.asarray(keys, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h1 = k * np.uint64(0x9E3779B97F4A7C15) + np.uint64(0x2545F4914F6CDD1D)
        h1 ^= h1 >> np.uint64(29)
        h2 = (k * np.uint64(0xC2B2AE3D27D4EB4F)) | np.uint64(1)
        h2 ^= h2 >> np.uint64(31)
        words = np.zeros(m // 64, dtype=np.uint64)
        for i in range(BLOOM_K):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
            np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
    import base64
    import zlib

    # deflate+base64, not hex (ADVICE r8): hex costs ~2.5 chars/key in
    # the JSON manifest; sparse bloom words deflate to a fraction of
    # that, and planning-time decode is one inflate, not an O(bytes²)
    # int(hex, 16) parse per (block × probe-point) pair
    payload = base64.b64encode(
        zlib.compress(words.tobytes(), 6)).decode("ascii")
    return {"m": m, "k": BLOOM_K, "z": payload}


def _bloom_int(bloom: dict) -> int:
    """Decode a bloom's bit field ONCE per manifest read and memoize it
    on the (in-memory) dict — pushdown planning probes every block for
    every point, and re-parsing the field per probe made planning
    O(points × blocks × bloom_bytes) (ADVICE r8). Accepts both the v2
    deflate+base64 form and the legacy hex form."""
    cached = bloom.get("_int")
    if cached is None:
        if "z" in bloom:
            import base64
            import zlib
            cached = int.from_bytes(
                zlib.decompress(base64.b64decode(bloom["z"])), "little")
        else:
            cached = int(bloom["bits"], 16)
        bloom["_int"] = cached
    return cached


def _bloom_might_contain(bloom: dict, key: int) -> bool:
    m, bits = bloom["m"], _bloom_int(bloom)
    return all(bits >> pos & 1 for pos in _bloom_hashes(key, m))


# ------------------------------------------------------------ file writer

def write_datum_file(path: str, records: list[tuple[int, bytes]],
                     block_bytes: int = DEFAULT_BLOCK_BYTES) -> list[dict]:
    """Write one ``part-*.datum`` record stream (varint key, varint len,
    payload), atomically via rename. Returns per-block metadata —
    (offset, length, rows, min/max key, key bloom) cut every
    ``block_bytes`` — for the manifest; block boundaries always fall on
    record boundaries, so any block slices out as a valid stream."""
    out = bytearray()
    blocks: list[dict] = []
    b_off = 0
    b_keys: list[int] = []
    for key, payload in records:
        _write_varint(out, key)
        _write_varint(out, len(payload))
        out += payload
        b_keys.append(key)
        if len(out) - b_off >= block_bytes:
            blocks.append(_block_meta(b_off, len(out) - b_off, b_keys))
            b_off, b_keys = len(out), []
    if b_keys:
        blocks.append(_block_meta(b_off, len(out) - b_off, b_keys))
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(bytes(out))
    os.replace(tmp, path)
    return blocks


def _block_meta(offset: int, length: int, keys: list[int]) -> dict:
    return {"offset": offset, "length": length, "rows": len(keys),
            "min_key": min(keys), "max_key": max(keys),
            "bloom": _bloom_build(keys)}


def read_datum_file(path: str, offset: int = 0, length: int = -1):
    """Yield (key, payload) from one record stream (or one block of
    it): seek to ``offset``, materialize ``length`` bytes (whole file
    when -1) — a task never reads outside its block."""
    with open(path, "rb") as f:
        if offset:
            f.seek(offset)
        buf = f.read(length) if length >= 0 else f.read()
    pos, n = 0, len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        ln, pos = _read_varint(buf, pos)
        yield key, buf[pos:pos + ln]
        pos += ln


def build_manifest(path: str,
                   block_bytes: int = DEFAULT_BLOCK_BYTES) -> dict:
    """Index a manifest-less (foreign-written) dataset directory: one
    sequential pass per ``*.datum`` file records block boundaries
    (every ``block_bytes``, always on record edges), key ranges, and
    key blooms, then commits the v2 manifest atomically. After this,
    a single 10 GB foreign file scans block-parallel and prunes like
    a native write — the one-time cost parquet pays at write time,
    paid here at adoption time. Returns the manifest dict."""
    files = []
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".datum"):
            continue
        fpath = os.path.join(path, fname)
        blocks: list[dict] = []
        b_off = 0
        b_keys: list[int] = []
        kmin = kmax = None
        with open(fpath, "rb") as f:
            buf = f.read()
        pos, n = 0, len(buf)
        while pos < n:
            key, pos = _read_varint(buf, pos)
            ln, pos = _read_varint(buf, pos)
            pos += ln
            b_keys.append(key)
            kmin = key if kmin is None else min(kmin, key)
            kmax = key if kmax is None else max(kmax, key)
            if pos - b_off >= block_bytes:
                blocks.append(_block_meta(b_off, pos - b_off, b_keys))
                b_off, b_keys = pos, []
        if b_keys:
            blocks.append(_block_meta(b_off, n - b_off, b_keys))
        files.append({"file": fname,
                      "rows": sum(b["rows"] for b in blocks),
                      "min_key": kmin if kmin is not None else 0,
                      "max_key": kmax if kmax is not None else -1,
                      "blocks": blocks})
    manifest = {"version": 2, "files": files}
    tmp = os.path.join(path, f".{MANIFEST}.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(path, MANIFEST))
    return manifest


# ------------------------------------------------------------ reader

@dataclass
class _BlockPartition(InputPartition):
    path: str
    offset: int = 0
    length: int = -1


class DatumReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ndpdatum: path option is required")
        # key constraints accumulated by pushFilters. Range bounds
        # (lo/hi with inclusivity) and POINT constraints (EqualTo/In)
        # are tracked separately: folding EqualTo into the range via
        # max/min corrupts the inclusivity flag left by an earlier
        # strict bound ([key > 3, key = 5] must NOT become lo=5
        # exclusive — that prunes the file holding key 5).
        self._lo: int | None = None
        self._lo_inc = True
        self._hi: int | None = None
        self._hi_inc = True
        self._points: frozenset[int] | None = None  # EqualTo ∧ In sets

    # -- pushdown ------------------------------------------------------
    def pushFilters(self, filters):
        for flt in filters:
            self._try_push(flt)
            # conservatively ask Spark to still evaluate row-level —
            # we only prune FILES/BLOCKS with it (manifest granularity)
            yield flt

    def _try_push(self, flt: Filter) -> bool:
        col = getattr(flt, "attribute", None)
        if col != ("key",):
            return False
        if isinstance(flt, EqualTo):
            self._add_points(frozenset((int(flt.value),)))
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
            self._add_points(frozenset(int(v) for v in flt.values))
            return True
        return False

    def _add_points(self, vals: frozenset[int]) -> None:
        self._points = vals if self._points is None else (
            self._points & vals)

    def _span_survives(self, fmin: int, fmax: int) -> bool:
        """Can any key in [fmin, fmax] satisfy the pushed constraints?"""
        if self._lo is not None:
            if fmax < self._lo or (fmax == self._lo and not self._lo_inc):
                return False
        if self._hi is not None:
            if fmin > self._hi or (fmin == self._hi and not self._hi_inc):
                return False
        if self._points is not None and all(
                v < fmin or v > fmax for v in self._points):
            return False
        return True

    def _block_survives(self, blk: dict) -> bool:
        if not self._span_survives(blk["min_key"], blk["max_key"]):
            return False
        bloom = blk.get("bloom")
        if bloom and self._points is not None:
            # point-lookup pruning beyond min/max: the block's key
            # bloom must admit at least one sought point
            if not any(_bloom_might_contain(bloom, v)
                       for v in self._points):
                return False
        return True

    # -- planning ------------------------------------------------------
    def partitions(self):
        manifest_path = os.path.join(self.path, MANIFEST)
        parts: list[_BlockPartition] = []
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = json.load(f)
            for m in manifest["files"]:
                if m["rows"] == 0 or not self._span_survives(
                        m["min_key"], m["max_key"]):
                    continue
                fpath = os.path.join(self.path, m["file"])
                blocks = m.get("blocks")
                if blocks:  # manifest v2: block-granular split + prune
                    parts.extend(
                        _BlockPartition(fpath, b["offset"], b["length"])
                        for b in blocks if self._block_survives(b))
                else:  # v1 entry: whole file is the task
                    parts.append(_BlockPartition(fpath))
        else:  # manifest-less directory: every data file scans whole
            parts = [_BlockPartition(os.path.join(self.path, f))
                     for f in sorted(os.listdir(self.path))
                     if f.endswith(".datum")]
        if not parts:
            # an empty partition list makes Spark invoke read(None);
            # hand it one explicit empty-scan sentinel instead
            return [_BlockPartition("")]
        return parts

    # -- execution -----------------------------------------------------
    def read(self, partition: _BlockPartition):
        if partition is None or not partition.path:
            return
        yield from read_datum_file(partition.path, partition.offset,
                                   partition.length)


# ------------------------------------------------------------ writer

@dataclass
class _FileCommit(WriterCommitMessage):
    file: str
    rows: int
    min_key: int
    max_key: int
    blocks: list = field(default_factory=list)


class DatumWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ndpdatum: path option is required")
        self.overwrite = overwrite
        self.block_bytes = int(options.get("blockbytes",
                                           DEFAULT_BLOCK_BYTES))

    def write(self, rows):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.datum"
        recs, kmin, kmax = [], None, None
        for row in rows:
            k = int(row["key"])
            if k < 0:
                raise ValueError(
                    f"ndpdatum: key must be non-negative, got {k} "
                    "(the wire varint is unsigned)")
            if row["datum"] is None:
                raise ValueError(
                    f"ndpdatum: NULL datum payload at key {k} — the "
                    "record stream has no null marker, and coercing to "
                    "b'' would silently conflate NULL with empty")
            recs.append((k, bytes(row["datum"])))
            kmin = k if kmin is None else min(kmin, k)
            kmax = k if kmax is None else max(kmax, k)
        blocks = write_datum_file(os.path.join(self.path, name), recs,
                                  self.block_bytes)
        return _FileCommit(file=name, rows=len(recs),
                           min_key=kmin if kmin is not None else 0,
                           max_key=kmax if kmax is not None else -1,
                           blocks=blocks)

    def commit(self, messages):
        if self.overwrite:
            keep = {m.file for m in messages} | {MANIFEST}
            for f in os.listdir(self.path):
                if f.endswith(".datum") and f not in keep:
                    os.remove(os.path.join(self.path, f))
        entries = [{"file": m.file, "rows": m.rows,
                    "min_key": m.min_key, "max_key": m.max_key,
                    "blocks": m.blocks} for m in messages]
        if not self.overwrite:
            # append (ADVICE r8): merge the EXISTING manifest's file
            # entries — rebuilding from only this job's commit messages
            # would atomically replace the manifest and silently hide
            # every previously-written .datum file from partitions()
            prev = os.path.join(self.path, MANIFEST)
            if os.path.exists(prev):
                with open(prev) as f:
                    new_names = {e["file"] for e in entries}
                    entries += [e for e in json.load(f).get("files", [])
                                if e["file"] not in new_names]
        manifest = {"version": 2,
                    "files": sorted(entries, key=lambda d: d["file"])}
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
