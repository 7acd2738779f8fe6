"""Exactly-once streaming ingestion into the transactional table
(sources/acid.py): foreachBatch + idempotent epoch commits — the
Delta-txn pattern, closing the loop the reference's poll-until-done
orchestration approximated (reference server.py:176-205 marks a job
done only after its sink write returns; it has no replay protection
because its LMDB sink dies with the process).

Why exactly-once needs BOTH logs: Structured Streaming's checkpoint
makes the SOURCE side replayable (a killed query re-delivers the
in-flight micro-batch), but foreachBatch itself is at-least-once — the
sink write can succeed and the checkpoint advance can still be lost to
a crash in between. The fix is transactional de-dup on the SINK side:
every ACID append records (stream_id, epoch_id) in its snapshot, and
the writer skips any epoch at or below the stream's last committed one.
Re-delivered epoch → seen in the log → no-op; never-delivered epoch →
append. Loss is impossible (checkpoint replays), duplication is
impossible (the txn log filters) — exactly-once end to end.

Scale: the epoch check reads snapshot JSON newest-first (metadata-
sized); the append itself is the O(1)-commit protocol of acid.py. One
stream writing 100 TB commits the same way it commits 100 MB.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.functions.exact import money
from new_data_pipeline_spark.registry import register
from new_data_pipeline_spark.sources import acid


def idempotent_epoch_writer(table: str, stream_id: str):
    """foreachBatch callback: append the micro-batch to ``table`` under
    (stream_id, epoch_id), skipping epochs already in the commit log.
    Epochs of one stream arrive in increasing order, so "at or below
    last committed" detects every replay.

    Assumptions (the Delta-txn contract, stated explicitly): ONE live
    writer per ``stream_id``, and a stable (source, checkpoint) pairing
    — epoch numbers only identify batch CONTENT relative to the
    checkpoint that produced them. Restarting against a FRESH checkpoint
    (or changed batching config, e.g. another maxFilesPerTrigger) with
    the same stream_id reuses epoch numbers for different rows and this
    filter would silently drop them: use a new stream_id per
    (source, checkpoint) lineage. The check-then-append is likewise not
    atomic across concurrent writers sharing a stream_id — concurrency
    comes from many stream_ids, not shared ones.
    """
    def write(batch_df: DataFrame, epoch_id: int) -> None:
        last = acid.last_committed_epoch(table, stream_id)
        if last is not None and epoch_id <= last:
            return  # replayed micro-batch: sink already holds it
        acid.append(batch_df, table,
                    txn={"stream_id": stream_id, "epoch_id": int(epoch_id)})
    return write


def run_ingest(stream_df: DataFrame, table: str, checkpoint: str,
               stream_id: str, *, available_now: bool = True):
    """Start (and for available_now=True, run to completion) an ingest
    of ``stream_df`` into the ACID table. Returns the StreamingQuery."""
    q = (stream_df.writeStream
         .foreachBatch(idempotent_epoch_writer(table, stream_id))
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True) if available_now else
         stream_df.writeStream
         .foreachBatch(idempotent_epoch_writer(table, stream_id))
         .option("checkpointLocation", checkpoint)
         .trigger(processingTime="0 seconds"))
    query = q.start()
    if available_now:
        query.awaitTermination()
    return query


@register(
    "stream_acid_ingest",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
             AS total_value
    FROM events
    GROUP BY event_type
    """,
    tags=("streaming", "acid", "sink", "exactly-once"),
)
def stream_acid_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the exactly-once pipeline: REALLY stream the
    events table (file source, several micro-batches) through the
    idempotent foreachBatch writer into a fresh ACID table, then answer
    an aggregate FROM the table. A hash match proves the
    stream→txn-log→snapshot-read path moved every row exactly once —
    the oracle aggregates the raw source directly.
    """
    # Workdir key includes the pid: two concurrent invocations for the
    # same sf_dir (parallel test workers, bench overlapping correctness)
    # must not rmtree each other's live source/checkpoint mid-stream
    # (ADVICE r5). Same-process reruns still reuse + reset one dir, so
    # repeated gate runs cannot leak an unbounded dir-per-call.
    token = hashlib.md5(
        f"acid_ingest:{sf_dir}:{os.getpid()}".encode()).hexdigest()[:12]
    work = os.path.join(tempfile.gettempdir(), f"ndp_acid_ingest_{token}")
    shutil.rmtree(work, ignore_errors=True)  # rerun isolation, no leak
    # The returned DataFrame reads the table lazily, so the workdir must
    # outlive this call — reclaim it at process exit instead (ADVICE r6:
    # without this, every distinct pid leaks one dir forever).
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    src = os.path.join(work, "src")
    table = os.path.join(work, "table")
    ckpt = os.path.join(work, "ckpt")
    events = catalog.load(spark, sf_dir, "events")
    events.repartition(4).write.mode("overwrite").parquet(src)
    clean = spark.read.parquet(src)
    stream = (spark.readStream.schema(clean.schema)
              .option("maxFilesPerTrigger", "2").parquet(src))
    run_ingest(stream, table, ckpt, stream_id="events-ingest")
    return (acid.read(spark, table)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.countDistinct("user_id").cast("bigint")
                 .alias("n_users"),
                 F.sum(money("value")).cast("double")
                 .alias("total_value")))


def newer_than_current(upd: DataFrame, cur: DataFrame) -> DataFrame:
    """CDC conflict resolution: keep an update row only if its
    (last_ts, last_event_id) beats the current table row for the same
    user (or the user is new). Makes the apply LAST-WRITER-WINS BY DATA
    rather than by micro-batch arrival order — the property that makes
    the whole stream's outcome independent of file-source batching."""
    c = cur.select(F.col("user_id"),
                   F.col("last_ts").alias("cur_ts"),
                   F.col("last_event_id").alias("cur_eid"))
    j = upd.join(c, "user_id", "left")
    newer = (F.col("cur_ts").isNull()
             | (F.col("last_ts") > F.col("cur_ts"))
             | ((F.col("last_ts") == F.col("cur_ts"))
                & (F.col("last_event_id") > F.col("cur_eid"))))
    return j.filter(newer).select(*upd.columns)


def merge_apply_writer(spark: SparkSession, table: str, stream_id: str):
    """foreachBatch callback: reduce the micro-batch to its per-user
    LAST event (max over a (ts, event_id, ...) struct — map-side
    combinable, no window), drop rows the table already supersedes
    (newer_than_current), and MERGE the rest under an idempotent
    (stream_id, epoch_id) txn — the streaming CDC-apply loop
    (Debezium→Delta "apply changes" shape) on this repo's own
    merge_upsert."""
    def write(batch_df: DataFrame, epoch_id: int) -> None:
        last = acid.last_committed_epoch(table, stream_id)
        if last is not None and epoch_id <= last:
            return  # replayed micro-batch
        upd = (batch_df.groupBy("user_id")
               .agg(F.max(F.struct(
                   F.col("ts").alias("last_ts"),
                   F.col("event_id").alias("last_event_id"),
                   F.col("event_type").alias("last_type"),
                   F.col("value").alias("last_value"))).alias("s"))
               .select("user_id", "s.last_ts", "s.last_event_id",
                       "s.last_type", "s.last_value"))
        newer = newer_than_current(upd, acid.read(spark, table))
        acid.merge_upsert(
            spark, newer, table, ["user_id"],
            txn={"stream_id": stream_id, "epoch_id": int(epoch_id)})
    return write


@register(
    "stream_merge_apply",
    oracle="""
    WITH last AS (
      SELECT user_id, event_type, ts,
             CAST(value AS DECIMAL(12,2)) AS value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rk
      FROM events
    )
    SELECT event_type AS last_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(value) AS DOUBLE) AS total_last_value,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS max_last_ts
    FROM last WHERE rk = 1
    GROUP BY 1 ORDER BY 1
    """,
    tags=("streaming", "acid", "merge", "cdc"),
)
def stream_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply: REALLY stream the events table (file
    source, several micro-batches) through a foreachBatch that reduces
    each batch to per-user last events and MERGEs them into an ACID
    state table (file-granular copy-on-write upsert, idempotent epoch
    txns), then answer an aggregate FROM the post-apply table. The
    oracle computes last-event-per-user straight from the raw source,
    so a hash match proves the whole batched read-reduce-merge loop
    converges to exactly the one-shot answer — no lost update, no stale
    overwrite, no duplicated user — regardless of how the source files
    were batched (conflict resolution is by (ts, event_id), not by
    arrival order).

    Scale: each micro-batch costs one batch-sized aggregate, one join
    against the CURRENT state (user-keyed; at 100 TB this is the
    standard CDC-apply join and the state table is bucketable by the
    merge key), and one file-granular merge commit. State never grows
    past |users|."""
    token = hashlib.md5(
        f"merge_apply:{sf_dir}:{os.getpid()}".encode()).hexdigest()[:12]
    work = os.path.join(tempfile.gettempdir(), f"ndp_merge_apply_{token}")
    shutil.rmtree(work, ignore_errors=True)  # rerun isolation, no leak
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    src = os.path.join(work, "src")
    table = os.path.join(work, "table")
    ckpt = os.path.join(work, "ckpt")
    events = catalog.load(spark, sf_dir, "events")
    events.repartition(4).write.mode("overwrite").parquet(src)
    clean = spark.read.parquet(src)

    seed_schema = ("user_id bigint, last_ts timestamp, "
                   "last_event_id bigint, last_type string, "
                   "last_value double")
    acid.create_or_overwrite(spark.createDataFrame([], seed_schema), table)

    stream = (spark.readStream.schema(clean.schema)
              .option("maxFilesPerTrigger", "2").parquet(src))
    q = (stream.writeStream
         .foreachBatch(merge_apply_writer(spark, table, "events-cdc"))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    return (acid.read(spark, table)
            .groupBy(F.col("last_type"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
                 F.sum(money("last_value")).cast("double")
                 .alias("total_last_value"),
                 F.date_format(F.max("last_ts"), "yyyy-MM-dd HH:mm:ss")
                 .alias("max_last_ts"))
            .orderBy("last_type"))
