"""Transactional-table (sources/acid.py) semantics: snapshot isolation,
time travel, optimistic concurrency, copy-on-write delete, rollback,
vacuum. These are the Delta-shaped guarantees SURVEY.md §2.2 lists under
"sinks" — tested on the same commit protocol that would run against an
object store at 100 TB (O(1)-metadata commits, immutable data files).
"""

from __future__ import annotations

import os

import pytest

from new_data_pipeline_spark.sources import acid


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, val string")


def test_create_append_read(spark, table):
    v0 = acid.create_or_overwrite(_df(spark, [(1, "a"), (2, "b")]), table)
    v1 = acid.append(_df(spark, [(3, "c")]), table)
    assert (v0, v1) == (0, 1)
    got = sorted(acid.read(spark, table).collect())
    assert [(r.id, r.val) for r in got] == [(1, "a"), (2, "b"), (3, "c")]


def test_time_travel_and_snapshot_isolation(spark, table):
    acid.create_or_overwrite(_df(spark, [(1, "old")]), table)
    snapshot = acid.read(spark, table)  # frozen file list at v0
    acid.create_or_overwrite(_df(spark, [(9, "new")]), table)
    # the pre-overwrite handle still reads v0 (immutable files)
    assert [(r.id, r.val) for r in snapshot.collect()] == [(1, "old")]
    # explicit time travel
    assert [(r.id, r.val) for r in acid.read(spark, table, version=0).collect()] \
        == [(1, "old")]
    assert [(r.id, r.val) for r in acid.read(spark, table).collect()] \
        == [(9, "new")]


def test_as_of_timestamp(spark, table):
    acid.create_or_overwrite(_df(spark, [(1, "v0")]), table)
    t0 = acid.history(table)[-1]["timestamp"]
    acid.create_or_overwrite(_df(spark, [(2, "v1")]), table)
    assert [r.val for r in acid.read(spark, table, as_of=t0).collect()] == ["v0"]
    with pytest.raises(ValueError):
        acid.read(spark, table, as_of=t0 - 1000)


def test_concurrent_appends_both_land(spark, table):
    """Two appenders racing from the same parent: the O_EXCL commit
    makes one win v1; the loser rebases and lands v2 — no lost update."""
    acid.create_or_overwrite(_df(spark, [(0, "base")]), table)
    # stage both writers' data files against parent v0
    files_a = acid._write_data_files(_df(spark, [(1, "a")]), table)
    files_b = acid._write_data_files(_df(spark, [(2, "b")]), table)
    schema = _df(spark, [(0, "x")]).schema.jsonValue()
    va = acid._commit_with_retry(table, "append", files_a, schema,
                                 parent=0, merge=True)
    vb = acid._commit_with_retry(table, "append", files_b, schema,
                                 parent=0, merge=True)  # stale parent → rebase
    assert (va, vb) == (1, 2)
    vals = sorted(r.val for r in acid.read(spark, table).collect())
    assert vals == ["a", "b", "base"]


def test_concurrent_overwrite_conflict_raises(spark, table):
    """Overwrite is read-modify-write: a second overwrite targeting a
    version that no longer exists must fail, not clobber."""
    acid.create_or_overwrite(_df(spark, [(0, "base")]), table)
    files_a = acid._write_data_files(_df(spark, [(1, "a")]), table)
    files_b = acid._write_data_files(_df(spark, [(2, "b")]), table)
    schema = _df(spark, [(0, "x")]).schema.jsonValue()
    acid._commit_with_retry(table, "overwrite", files_a, schema,
                            parent=0, merge=False)
    with pytest.raises(acid.CommitConflict):
        acid._commit_with_retry(table, "overwrite", files_b, schema,
                                parent=0, merge=False)
    # winner's snapshot intact
    assert [r.val for r in acid.read(spark, table).collect()] == ["a"]


def test_delete_where_copy_on_write(spark, table):
    acid.create_or_overwrite(_df(spark, [(1, "keep")]), table)
    acid.append(_df(spark, [(2, "drop"), (3, "keep2")]), table)
    before = set(acid._load_snapshot(table, acid.latest_version(table))["files"])
    acid.delete_where(spark, table, "val = 'drop'")
    after = set(acid._load_snapshot(table, acid.latest_version(table))["files"])
    # the untouched first file carries over BY REFERENCE (copy-on-write)
    assert before & after, "clean files must not be rewritten"
    vals = sorted(r.val for r in acid.read(spark, table).collect())
    assert vals == ["keep", "keep2"]


def test_delete_where_null_predicate_keeps_rows(spark, table):
    acid.create_or_overwrite(
        spark.createDataFrame([(1,), (None,)], "id bigint"), table)
    acid.delete_where(spark, table, "id = 1")
    ids = [r.id for r in acid.read(spark, table).collect()]
    assert ids == [None], "NULL-predicate row must be kept"


def test_delete_where_no_match_is_noop(spark, table):
    acid.create_or_overwrite(_df(spark, [(1, "a")]), table)
    v = acid.delete_where(spark, table, "val = 'zzz'")
    assert v == acid.latest_version(table) == 0  # no new version


def test_rollback(spark, table):
    acid.create_or_overwrite(_df(spark, [(1, "good")]), table)
    acid.create_or_overwrite(_df(spark, [(2, "bad")]), table)
    v = acid.rollback(table, to_version=0)
    assert v == 2  # history is append-only
    assert [r.val for r in acid.read(spark, table).collect()] == ["good"]
    ops = [h["operation"] for h in acid.history(table)]
    assert ops == ["overwrite", "overwrite", "rollback(v0)"]


def test_vacuum_removes_unreachable_keeps_latest(spark, table):
    acid.create_or_overwrite(_df(spark, [(1, "v0")]), table)
    acid.create_or_overwrite(_df(spark, [(2, "v1")]), table)
    removed = acid.vacuum(table, retain_last=1)
    assert removed > 0
    # latest still readable; vacuumed snapshot raises a CLEAR error
    assert [r.val for r in acid.read(spark, table).collect()] == ["v1"]
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        acid.read(spark, table, version=0)


def test_crash_before_commit_leaves_table_untouched(spark, table):
    """Data files written but no version file = invisible garbage, not
    a torn table (the write-ahead ordering the swap-based sink lacked)."""
    acid.create_or_overwrite(_df(spark, [(1, "a")]), table)
    acid._write_data_files(_df(spark, [(99, "crash")]), table)  # no commit
    assert [r.val for r in acid.read(spark, table).collect()] == ["a"]
    removed = acid.vacuum(table, retain_last=1)
    assert removed > 0  # the orphan is collectible


def test_merge_upsert_semantics(spark, table):
    """Matched keys replaced, unmatched updates inserted, untouched rows
    survive, no key duplicated."""
    acid.create_or_overwrite(
        _df(spark, [(1, "a"), (2, "b"), (3, "c")]), table)
    acid.merge_upsert(
        spark, _df(spark, [(2, "B2"), (9, "new")]), table, ["id"])
    got = {r.id: r.val for r in acid.read(spark, table).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 9: "new"}
    assert acid.history(table)[-1]["operation"] == "merge"


def test_merge_upsert_is_file_granular_cow(spark, table):
    """Files with no matched key carry over BY REFERENCE (same file
    name in the new snapshot), files with a hit are rewritten."""
    acid.create_or_overwrite(_df(spark, [(1, "a")]), table)
    acid.append(_df(spark, [(2, "b")]), table)  # second, disjoint file
    before = set(acid._load_snapshot(table, acid.latest_version(table))
                 ["files"])
    acid.merge_upsert(spark, _df(spark, [(2, "B2")]), table, ["id"])
    after = set(acid._load_snapshot(table, acid.latest_version(table))
                ["files"])
    carried = before & after
    assert carried, "the unmatched file must carry over by reference"
    # the carried file is the one holding id=1: its content survived
    got = {r.id: r.val for r in acid.read(spark, table).collect()}
    assert got == {1: "a", 2: "B2"}
    assert after - before, "the matched file must be rewritten as new"


def test_merge_upsert_all_inserts_touches_no_files(spark, table):
    acid.create_or_overwrite(_df(spark, [(1, "a")]), table)
    before = set(acid._load_snapshot(table, acid.latest_version(table))
                 ["files"])
    acid.merge_upsert(spark, _df(spark, [(7, "x"), (8, "y")]), table,
                      ["id"])
    after = set(acid._load_snapshot(table, acid.latest_version(table))
                ["files"])
    assert before <= after, "all-insert merge must rewrite nothing"
    assert len(acid.read(spark, table).collect()) == 3
