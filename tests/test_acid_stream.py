"""Exactly-once streaming→ACID gates: idempotent epoch commits (direct
replay, kill-and-restart, whole-stream re-delivery) must leave the
transactional table holding every source row exactly once, with the
(stream_id, epoch_id) txn trail in the commit log."""

from __future__ import annotations

import datetime
import time

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.sources import acid
from new_data_pipeline_spark.streaming.acid_sink import (
    idempotent_epoch_writer, run_ingest)
from tests.conftest import SMOKE_DIR


def _rows(spark, table):
    return sorted(tuple(r) for r in acid.read(spark, table).collect())


def test_epoch_writer_is_idempotent(spark, tmp_path):
    """Direct replay: committing the same epoch twice is a no-op; the
    next epoch lands; the txn trail records both commits."""
    table = str(tmp_path / "t")
    df0 = spark.range(5).toDF("id")
    df1 = spark.range(5, 8).toDF("id")
    w = idempotent_epoch_writer(table, "s1")

    w(df0, 0)
    v_after_first = acid.latest_version(table)
    w(df0, 0)                       # replayed micro-batch
    assert acid.latest_version(table) == v_after_first
    assert acid.read(spark, table).count() == 5

    w(df1, 1)
    assert acid.read(spark, table).count() == 8
    assert acid.last_committed_epoch(table, "s1") == 1
    assert acid.last_committed_epoch(table, "other-stream") is None
    ops = [h["operation"] for h in acid.history(table)]
    assert ops == ["append", "append"]


def test_change_data_feed_between_versions(spark, tmp_path):
    """changes() must report exactly the logical row diff between two
    snapshots: pure appends → inserts only; a copy-on-write delete →
    deletes only (rewrite survivors cancel); a rollback → the inverse
    of the rolled-back span."""
    table = str(tmp_path / "t")
    v0 = acid.create_or_overwrite(
        spark.range(0, 10).toDF("id").coalesce(2), table)
    v1 = acid.append(spark.range(10, 15).toDF("id"), table)

    cdf = acid.changes(spark, table, v0, v1).collect()
    assert {(r["id"], r["_change_type"]) for r in cdf} == {
        (i, "insert") for i in range(10, 15)}

    v2 = acid.delete_where(spark, table, "id % 2 = 1 AND id < 10")
    cdf2 = acid.changes(spark, table, v1, v2).collect()
    assert {(r["id"], r["_change_type"]) for r in cdf2} == {
        (i, "delete") for i in range(1, 10, 2)}, (
        "rewrite survivors must cancel out of the diff")

    v3 = acid.rollback(table, v1)
    cdf3 = acid.changes(spark, table, v2, v3).collect()
    assert {(r["id"], r["_change_type"]) for r in cdf3} == {
        (i, "insert") for i in range(1, 10, 2)}

    # whole-history diff: v0 -> v3 equals the surviving appends
    whole = acid.changes(spark, table, v0, v3).collect()
    assert {(r["id"], r["_change_type"]) for r in whole} == {
        (i, "insert") for i in range(10, 15)}


def test_kill_restart_exactly_once(spark, tmp_path):
    """Kill the ingest mid-input, restart from the checkpoint: the
    table must hold every source row exactly once — source replay is
    absorbed by the txn-log skip, resumption by the checkpoint."""
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    batch = catalog.load(spark, SMOKE_DIR, "events")
    batch.repartition(6).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def stream():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(src))

    q = run_ingest(stream(), table, ckpt, stream_id="kill-test",
                   available_now=False)
    deadline = time.time() + 60
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in q.recentProgress):
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()

    run_ingest(stream(), table, ckpt, stream_id="kill-test")

    got = acid.read(spark, table)
    assert got.count() == batch.count()
    assert (got.select("event_id").distinct().count()
            == batch.select("event_id").distinct().count())


def test_schema_evolution_add_column(spark, tmp_path):
    """Appending a frame with an ADDED column evolves the snapshot
    schema: new reads surface the column (old files yield NULLs), and
    time travel to the pre-evolution version still serves the original
    schema — the add-column half of Delta-style schema evolution that
    the immutable-file + per-snapshot-schema design gives for free."""
    table = str(tmp_path / "t")
    v1 = acid.create_or_overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string"),
        table)
    acid.append(
        spark.createDataFrame([(3, "c", 30.0)],
                              "id bigint, s string, score double"),
        table)

    latest = acid.read(spark, table)
    assert set(latest.columns) == {"id", "s", "score"}
    got = {r["id"]: r["score"] for r in latest.collect()}
    assert got == {1: None, 2: None, 3: 30.0}

    old = acid.read(spark, table, version=v1)
    assert set(old.columns) == {"id", "s"}
    assert old.count() == 2


def test_available_now_matches_microbatch_mode(spark, tmp_path):
    """VERDICT r4 #7: the same ingest run under Trigger.AvailableNow
    and under micro-batch processingTime must leave IDENTICAL table
    contents and the same (stream_id, epoch) txn-trail shape — the
    commit protocol is trigger-agnostic."""
    src = str(tmp_path / "src")
    batch = catalog.load(spark, SMOKE_DIR, "events")
    batch.repartition(4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def stream():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(src))

    t_avail = str(tmp_path / "t_avail")
    run_ingest(stream(), t_avail, str(tmp_path / "ck_a"),
               stream_id="s", available_now=True)

    t_micro = str(tmp_path / "t_micro")
    q = run_ingest(stream(), t_micro, str(tmp_path / "ck_m"),
                   stream_id="s", available_now=False)
    deadline = time.time() + 60
    n = batch.count()
    while time.time() < deadline:
        try:
            if acid.read(spark, t_micro).count() >= n:
                break
        except FileNotFoundError:
            pass  # first epoch not committed yet
        time.sleep(0.3)
    q.stop()
    q.awaitTermination()

    assert _rows(spark, t_avail) == _rows(spark, t_micro)
    trail_a = sorted((h["txn"]["stream_id"], h["txn"]["epoch_id"])
                     for h in acid.history(t_avail) if h.get("txn"))
    trail_m = sorted((h["txn"]["stream_id"], h["txn"]["epoch_id"])
                     for h in acid.history(t_micro) if h.get("txn"))
    assert trail_a == trail_m


def test_full_redelivery_all_epochs_skipped(spark, tmp_path):
    """Deterministic worst-case replay: run the whole stream, then run
    it AGAIN with a fresh checkpoint but the same stream_id — every
    epoch re-delivers from zero and every one must be skipped by the
    txn log, leaving the table byte-identical."""
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    batch = catalog.load(spark, SMOKE_DIR, "events")
    batch.repartition(4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def stream():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(src))

    run_ingest(stream(), table, str(tmp_path / "ckpt1"),
               stream_id="replay-test")
    first = _rows(spark, table)
    v_first = acid.latest_version(table)

    run_ingest(stream(), table, str(tmp_path / "ckpt2"),
               stream_id="replay-test")
    assert acid.latest_version(table) == v_first  # zero new commits
    assert _rows(spark, table) == first
    assert first and len(first) == batch.count()


def test_merge_apply_replayed_epoch_is_noop(spark, tmp_path):
    """A re-delivered micro-batch (same epoch_id) must not re-merge."""
    from new_data_pipeline_spark.streaming.acid_sink import (
        merge_apply_writer)

    table = str(tmp_path / "state")
    seed = ("user_id bigint, last_ts timestamp, last_event_id bigint, "
            "last_type string, last_value double")
    acid.create_or_overwrite(spark.createDataFrame([], seed), table)
    batch = spark.createDataFrame(
        [(1, 7, datetime.datetime(2024, 1, 2), "click", 5.0)],
        "user_id bigint, event_id bigint, ts timestamp, "
        "event_type string, value double")
    w = merge_apply_writer(spark, table, "s1")
    w(batch, 0)
    v_after_first = acid.latest_version(table)
    w(batch, 0)  # replay: must be a no-op, no new version
    assert acid.latest_version(table) == v_after_first
    assert acid.read(spark, table).count() == 1


def test_merge_apply_stale_update_rejected(spark, tmp_path):
    """An out-of-order batch carrying OLDER events for a user must not
    overwrite the newer state row (last-writer-wins by data)."""
    from new_data_pipeline_spark.streaming.acid_sink import (
        merge_apply_writer)

    table = str(tmp_path / "state")
    seed = ("user_id bigint, last_ts timestamp, last_event_id bigint, "
            "last_type string, last_value double")
    acid.create_or_overwrite(spark.createDataFrame([], seed), table)
    schema = ("user_id bigint, event_id bigint, ts timestamp, "
              "event_type string, value double")
    newer = spark.createDataFrame(
        [(1, 9, datetime.datetime(2024, 1, 5), "purchase", 9.0)], schema)
    older = spark.createDataFrame(
        [(1, 3, datetime.datetime(2024, 1, 1), "view", 1.0),
         (2, 4, datetime.datetime(2024, 1, 1), "click", 2.0)], schema)
    w = merge_apply_writer(spark, table, "s1")
    w(newer, 0)
    w(older, 1)  # user 1 stale (dropped); user 2 new (inserted)
    got = {r.user_id: (r.last_type, r.last_event_id)
           for r in acid.read(spark, table).collect()}
    assert got == {1: ("purchase", 9), 2: ("click", 4)}
