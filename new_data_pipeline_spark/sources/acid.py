"""Transactional parquet table: snapshot isolation, time travel,
optimistic concurrency, rollback, and vacuum — the Delta-shaped ACID
semantics the image's missing delta jars would otherwise provide
(SURVEY.md §2.2 "sinks: write.{parquet,delta}").

Design (the standard log-structured table-format protocol):

- Data files are IMMUTABLE. Every write lands in fresh uniquely-named
  parquet files under ``<table>/data/<txn-uuid>/``; nothing is ever
  modified in place.
- A snapshot is a JSON version file ``<table>/_txn/v%012d.json``
  listing the exact data files visible at that version (plus schema,
  operation, parent version, wall-clock timestamp).
- COMMIT = creating the next version file with ``open(..., "x")``
  (O_EXCL). The filesystem makes exactly one creator win, which is the
  whole concurrency-control story: a loser re-reads the new latest
  snapshot, rebases its intent, and retries. On an object store the
  same protocol runs on conditional PUT — the design carries to 100 TB
  unchanged because a commit is O(1) metadata regardless of data size.
- READ = pick a version file (latest, explicit, or as-of timestamp) and
  scan exactly the files it lists. Readers never see a half-finished
  write (files are complete before the commit exists) and are immune to
  concurrent commits (their file list is frozen) — snapshot isolation
  without locks.
- ROLLBACK = a new commit whose file list equals an old version's (the
  history stays append-only; nothing is deleted).
- VACUUM = delete data files referenced by NO retained version. The
  only destructive operation, and the only one that limits time travel.

Reference contrast: the reference's LMDB env offers single-process
transactions only, and its stream catalog dies with the server process
(reference serialize.py:456-471). Here every piece of state is a file
any session — or any number of Spark clusters — can open.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_TXN_DIR = "_txn"
_DATA_DIR = "data"
_V_FMT = "v%012d.json"


class CommitConflict(Exception):
    """Another writer committed the version this transaction targeted."""


def _txn_path(table: str) -> str:
    return os.path.join(table, _TXN_DIR)


def _versions(table: str) -> list[int]:
    d = _txn_path(table)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("v") and f.endswith(".json"):
            out.append(int(f[1:-5]))
    return sorted(out)


def latest_version(table: str) -> int:
    vs = _versions(table)
    if not vs:
        raise FileNotFoundError(f"{table}: not a transactional table")
    return vs[-1]


def _load_snapshot(table: str, version: int) -> dict:
    with open(os.path.join(_txn_path(table), _V_FMT % version)) as f:
        return json.load(f)


def _write_data_files(df: DataFrame, table: str) -> list[str]:
    """Write ``df`` as immutable part files under a fresh txn dir and
    return their table-relative paths. Runs BEFORE the commit exists, so
    a crash here leaves only unreferenced garbage for vacuum."""
    txn_id = uuid.uuid4().hex[:12]
    target = os.path.join(table, _DATA_DIR, txn_id)
    df.write.mode("errorifexists").parquet(target)
    rel = os.path.join(_DATA_DIR, txn_id)
    return sorted(
        os.path.join(rel, f) for f in os.listdir(target)
        if f.endswith(".parquet") and not f.startswith("_"))


def _try_commit(table: str, version: int, snapshot: dict) -> None:
    """Atomically publish ``snapshot`` as ``version``; exactly one
    writer can win a given version number (O_EXCL create)."""
    os.makedirs(_txn_path(table), exist_ok=True)
    path = os.path.join(_txn_path(table), _V_FMT % version)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as e:
        raise CommitConflict(f"{table}: version {version} already committed") from e
    with os.fdopen(fd, "w") as f:
        json.dump(snapshot, f, indent=2)


def _commit_with_retry(table: str, op: str, files: list[str],
                       schema_json: dict, *, parent: int | None,
                       merge: bool, txn: dict | None = None,
                       max_retries: int = 20) -> int:
    """Optimistic-concurrency commit loop.

    ``merge=True`` (append-shaped ops): on conflict, rebase onto the new
    latest — visible files = new latest's files + ours — and retry.
    ``merge=False`` (overwrite/rollback/delete): on conflict against an
    UNSEEN parent, fail — the caller's read-modify-write premise broke.
    ``txn`` is application transaction metadata recorded verbatim in the
    snapshot (the Delta ``txn``-action pattern: a streaming sink stores
    (stream_id, epoch_id) so replayed micro-batches are detectable).
    """
    attempt_parent = parent
    for _ in range(max_retries):
        base_files: list[str] = []
        if merge and attempt_parent is not None and attempt_parent >= 0:
            base_files = _load_snapshot(table, attempt_parent)["files"]
        snapshot = {
            "version": (attempt_parent if attempt_parent is not None else -1) + 1,
            "parent": attempt_parent,
            "operation": op,
            "files": sorted(set(base_files) | set(files)) if merge else sorted(files),
            "schema": schema_json,
            "timestamp": time.time(),
        }
        if txn is not None:
            snapshot["txn"] = txn
        try:
            _try_commit(table, snapshot["version"], snapshot)
            return snapshot["version"]
        except CommitConflict:
            new_latest = latest_version(table)
            if not merge and parent is not None and new_latest != parent:
                raise
            attempt_parent = new_latest
    raise CommitConflict(f"{table}: gave up after {max_retries} retries")


def create_or_overwrite(df: DataFrame, table: str) -> int:
    """Full-snapshot write: the new version's file list is exactly this
    write's files. Concurrent overwrites serialize — the loser errors
    rather than silently clobbering a snapshot it never saw."""
    files = _write_data_files(df, table)
    parent = _versions(table)[-1] if _versions(table) else None
    return _commit_with_retry(table, "overwrite", files,
                              df.schema.jsonValue(), parent=parent,
                              merge=False)


def append(df: DataFrame, table: str, *, txn: dict | None = None) -> int:
    """Blind append: always safe to rebase, so conflicts auto-retry and
    N concurrent appenders all land (each as its own version). Creates
    the table on first append (parent None). ``txn`` metadata rides the
    snapshot for idempotent-writer protocols."""
    files = _write_data_files(df, table)
    vs = _versions(table)
    parent = vs[-1] if vs else None
    return _commit_with_retry(table, "append", files,
                              df.schema.jsonValue(), parent=parent,
                              merge=True, txn=txn)


def last_committed_epoch(table: str, stream_id: str) -> int | None:
    """Highest epoch_id committed by ``stream_id``, or None. Scans the
    version log newest-first and stops at the first match — O(versions
    since that stream's last commit), metadata-sized either way."""
    for v in reversed(_versions(table)):
        t = _load_snapshot(table, v).get("txn")
        if t and t.get("stream_id") == stream_id:
            return int(t["epoch_id"])
    return None


def read(spark: SparkSession, table: str, *, version: int | None = None,
         as_of: float | None = None) -> DataFrame:
    """Snapshot read. ``version`` pins an explicit snapshot (time
    travel); ``as_of`` picks the newest snapshot committed at or before
    a wall-clock timestamp; default is latest. The returned DataFrame
    scans a FROZEN file list — concurrent commits cannot change it."""
    if version is None:
        vs = _versions(table)
        if not vs:
            raise FileNotFoundError(f"{table}: not a transactional table")
        if as_of is not None:
            eligible = [v for v in vs
                        if _load_snapshot(table, v)["timestamp"] <= as_of]
            if not eligible:
                raise ValueError(f"{table}: no snapshot at or before {as_of}")
            version = eligible[-1]
        else:
            version = vs[-1]
    snap = _load_snapshot(table, version)
    if not snap["files"]:
        return spark.createDataFrame(
            [], schema=_schema_from_json(snap["schema"]))
    paths = [os.path.join(table, f) for f in snap["files"]]
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(
            f"{table}@v{version}: {len(missing)} data files vacuumed; "
            f"oldest retained snapshot is newer than this one")
    # The SNAPSHOT's schema is authoritative, not parquet inference:
    # after schema evolution the file list mixes widths, and inference
    # would take whichever footer it probes first — pinning the
    # recorded schema makes old files surface NULLs for added columns
    # deterministically (test_acid_stream.py::test_schema_evolution_*).
    return spark.read.schema(_schema_from_json(snap["schema"])) \
        .parquet(*paths)


def _schema_from_json(schema_json: dict):
    from pyspark.sql.types import StructType
    return StructType.fromJson(schema_json)


def delete_where(spark: SparkSession, table: str, predicate: str) -> int:
    """Copy-on-write delete: rewrite ONLY the files that contain
    matching rows; untouched files carry over by reference (at scale
    this is the difference between rewriting a partition and rewriting
    100 TB). NULL-predicate rows are kept (coalesce(pred, false))."""
    from pyspark.sql import functions as F

    parent = latest_version(table)
    snap = _load_snapshot(table, parent)
    all_paths = [os.path.join(table, f) for f in snap["files"]]
    # ONE distributed pass finds the affected files (input_file_name per
    # matching row, distinct at file granularity — O(matched files) rows
    # to the driver, never O(rows)); parquet footer stats prune clean
    # files from the scan itself.
    hit_uris = {
        r[0] for r in spark.read.parquet(*all_paths)
        .filter(f"coalesce(({predicate}), false)")
        .select(F.input_file_name()).distinct().collect()}
    hit_names = {os.path.basename(u) for u in hit_uris}
    keep_files = [f for f in snap["files"]
                  if os.path.basename(f) not in hit_names]
    rewrite_files = [f for f in snap["files"]
                     if os.path.basename(f) in hit_names]
    if not rewrite_files:
        return parent  # nothing matched: no new version needed
    survivors = spark.read.parquet(
        *[os.path.join(table, f) for f in rewrite_files]).filter(
        f"NOT coalesce(({predicate}), false)")
    new_files = _write_data_files(survivors, table) if survivors.limit(1).count() else []
    return _commit_with_retry(table, "delete", keep_files + new_files,
                              snap["schema"], parent=parent, merge=False)


def changes(spark: SparkSession, table: str, from_version: int,
            to_version: int | None = None) -> DataFrame:
    """Change-data-feed between two snapshots: every row inserted or
    deleted, tagged ``_change_type`` ('insert' | 'delete') — the Delta
    CDF analog, derived from the log alone (no change journal needed
    because data files are immutable).

    File-pruned by construction: only files ADDED or REMOVED between
    the versions are scanned; files carried over by reference are never
    touched, so the cost tracks the size of the change, not the table.
    A copy-on-write rewrite (delete_where) moves surviving rows into
    new files — they appear on both sides and cancel via exceptAll
    (multiset semantics, so duplicate rows cancel one-for-one)."""
    if to_version is None:
        to_version = latest_version(table)
    a = set(_load_snapshot(table, from_version)["files"])
    b_snap = _load_snapshot(table, to_version)
    b = set(b_snap["files"])
    added = sorted(b - a)
    removed = sorted(a - b)
    schema = _schema_from_json(b_snap["schema"])

    def read_files(files: list[str]) -> DataFrame:
        if not files:
            return spark.createDataFrame([], schema=schema)
        return spark.read.schema(schema).parquet(
            *[os.path.join(table, f) for f in files])

    new_rows = read_files(added)
    old_rows = read_files(removed)
    from pyspark.sql import functions as F
    inserts = new_rows.exceptAll(old_rows) \
        .withColumn("_change_type", F.lit("insert"))
    deletes = old_rows.exceptAll(new_rows) \
        .withColumn("_change_type", F.lit("delete"))
    return inserts.unionByName(deletes)


def rollback(table: str, to_version: int) -> int:
    """Restore an old snapshot as a NEW version (history stays
    append-only; an audit sees both the mistake and the fix)."""
    snap = _load_snapshot(table, to_version)
    parent = latest_version(table)
    return _commit_with_retry(table, f"rollback(v{to_version})",
                              snap["files"], snap["schema"],
                              parent=parent, merge=False)


def history(table: str) -> list[dict]:
    """Version log, oldest first: (version, operation, n_files, ts,
    txn — the (stream_id, epoch_id) marker for streaming commits)."""
    return [{k: s[k] for k in ("version", "parent", "operation", "timestamp")}
            | {"n_files": len(s["files"]), "txn": s.get("txn")}
            for v in _versions(table)
            for s in [_load_snapshot(table, v)]]


def vacuum(table: str, retain_last: int = 1) -> int:
    """Delete data files unreachable from the newest ``retain_last``
    snapshots; returns the number removed. Time travel beyond the
    retained window stops working (read() raises a clear error)."""
    vs = _versions(table)
    retained = vs[-retain_last:] if retain_last else []
    live: set[str] = set()
    for v in retained:
        live |= set(_load_snapshot(table, v)["files"])
    removed = 0
    data_root = os.path.join(table, _DATA_DIR)
    for txn in os.listdir(data_root) if os.path.isdir(data_root) else []:
        d = os.path.join(data_root, txn)
        for f in os.listdir(d):
            rel = os.path.join(_DATA_DIR, txn, f)
            full = os.path.join(d, f)
            if f.endswith(".parquet") and rel not in live:
                os.remove(full)
                removed += 1
            elif f.startswith("_") or f.endswith(".crc"):
                os.remove(full)  # write markers; never referenced
        if not os.listdir(d):
            os.rmdir(d)
    return removed


def merge_upsert(spark: SparkSession, updates: DataFrame, table: str,
                 key_cols: list[str], *, txn: dict | None = None) -> int:
    """MERGE INTO (the Delta/Iceberg upsert): target rows matching an
    update row on ``key_cols`` are REPLACED by it, unmatched update
    rows are INSERTED. Copy-on-write at FILE granularity (the
    delete_where device): one distributed semi-join pass finds the
    files containing a matched key (input_file_name per hit, distinct
    at file granularity — O(matched files) rows to the driver, never
    O(rows)); only those files rewrite, with their non-matched rows
    surviving verbatim, and every untouched file carries over by
    reference — at 100 TB the difference between rewriting a few
    key-clustered files and rewriting the table. Commits with
    merge=False optimistic concurrency: a concurrent writer invalidates
    this merge's read-modify-write premise, so the conflict surfaces
    instead of silently rebasing (the Delta serializable-MERGE rule).
    """
    from pyspark.sql import functions as F

    parent = latest_version(table)
    snap = _load_snapshot(table, parent)
    if not snap["files"]:  # empty target: every update row inserts
        new_files = _write_data_files(updates, table)
        return _commit_with_retry(table, "merge", new_files,
                                  snap["schema"], parent=parent,
                                  merge=False, txn=txn)
    all_paths = [os.path.join(table, f) for f in snap["files"]]
    cur = spark.read.parquet(*all_paths)
    # r14: the update batch feeds THREE consumers (the matched-file
    # probe's semi-join keys, the survivor anti-join keys, and the
    # rewrite union) — without a persist each one re-runs the caller's
    # full update derivation (for the gate: an orders scan + aggregate
    # + join). The probe collect below is the eager fill; unpersisted
    # after the rewrite files are written.
    updates = updates.persist()
    keys = updates.select(*key_cols).distinct()
    # the _metadata.file_name hidden column, NOT input_file_name():
    # the expression form rejects multi-source plans, and the matched-
    # key probe is inherently a join (delete_where gets away with
    # input_file_name because its predicate keeps the scan single-
    # source)
    hit_uris = {
        r[0] for r in spark.read.parquet(*all_paths)
        .select(*key_cols, F.col("_metadata.file_path").alias("__file"))
        .join(keys, key_cols, "left_semi")
        .select("__file").distinct().collect()}
    # Suffix-match the full URI against each table-relative snapshot
    # path (ADVICE r10): basenames collide across txn dirs, and a
    # collision would silently pull an extra file into the rewrite
    # set, degrading the file-granular CoW guarantee.
    def _hit(rel: str) -> bool:
        return any(u.endswith("/" + rel) for u in hit_uris)
    keep_files = [f for f in snap["files"] if not _hit(f)]
    rewrite_files = [f for f in snap["files"] if _hit(f)]
    fresh = updates.select(*cur.columns)
    if rewrite_files:
        survivors = (spark.read.parquet(
            *[os.path.join(table, f) for f in rewrite_files])
            .join(keys, key_cols, "left_anti"))
        fresh = survivors.select(*cur.columns).unionByName(fresh)
    try:
        new_files = _write_data_files(fresh, table)
    finally:
        updates.unpersist()
    return _commit_with_retry(table, "merge", keep_files + new_files,
                              snap["schema"], parent=parent, merge=False,
                              txn=txn)
