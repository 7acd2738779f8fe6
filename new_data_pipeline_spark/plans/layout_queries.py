"""Oracle-gated queries for the physical-layout strategies
(plans/physical.py): bucketed co-located joins, Z-order clustering,
small-file compaction, and targeted deletion.

None of these layouts may change query RESULTS — that invariant is
exactly what the DuckDB gate proves here (the oracle runs on the
original parquet and never sees the relaid-out copy). The plan-level
properties (no Exchange under a bucketed join, footer-stat pruning
under Z-order, file counts under compaction) are asserted separately in
tests/test_physical.py; this module gives the layer driver exposure.

Reference contrast (SURVEY.md §4): the reference's store is one LMDB
file per box with no layout choices to make (reference serialize.py
:403-405); at 100 TB layout IS the query optimizer's raw material.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.plans import physical
from new_data_pipeline_spark.registry import register


def _token(sf_dir: str) -> str:
    """STABLE per-dataset token (VERDICT r7 #2): md5, not Python's
    per-process-salted hash() — pid/salt-suffixed names meant every new
    process minted fresh scratch dirs and bucketed tables that no later
    run's DROP/rmtree guard could name, leaking a full table copy per
    run. With stable names, each rerun overwrites the previous
    generation, bounding on-disk artifacts to one generation."""
    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]


def _workdir(op: str, sf_dir: str) -> str:
    """Per-dataset scratch dir, recreated on every call so reruns never
    read a stale layout (and prior runs' dirs get collected, because the
    name no longer varies by process)."""
    path = os.path.join(tempfile.gettempdir(),
                        f"ndp_layout_{op}_{_token(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    return path


SWEEP_MIN_AGE_S = 3600  # only collect entries untouched for an hour


def _sweep_stale_bucketed(spark: SparkSession, keep: set[str],
                          prefixes: tuple[str, ...]) -> None:
    """Collect bucketed-table directories left in spark-warehouse by
    pre-r8 pid-named generations (and any foreign generation): every
    entry under THIS gate's ``prefixes`` not named by THIS run and not
    touched within SWEEP_MIN_AGE_S is stale. The age gate (ADVICE r8)
    is what keeps a CONCURRENT session — or a run against a different
    sf_dir — from losing its live bucketed table mid-query: a live
    table was written minutes ago, a leaked one sits for hours. Scoped
    by prefix so different bucketed gates never collect each other's
    tables."""
    import time

    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    if not wh or not os.path.isdir(wh):
        return
    keep_l = {k.lower() for k in keep}
    now = time.time()
    for d in os.listdir(wh):
        if (d.startswith(tuple(p.lower() for p in prefixes))
                and d.lower() not in keep_l):
            path = os.path.join(wh, d)
            try:
                if now - os.path.getmtime(path) < SWEEP_MIN_AGE_S:
                    continue
            except OSError:
                pass  # vanished or unreadable: removal attempt is safe
            shutil.rmtree(path, ignore_errors=True)


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("layout", "bucketing", "join"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pay-the-shuffle-once join: persist orders and lineitem
    bucketed by order key (8 buckets, same spec both sides), then join
    the CATALOG tables — Catalyst plans a SortMergeJoin with no
    Exchange on either side, each task zipping matching bucket files.

    At 100 TB this converts the recurring 600 GB lineitem re-shuffle
    into a one-time write cost; the gate proves the bucketed copies
    join to exactly what the un-bucketed originals join to.
    (No-shuffle plan property asserted in tests/test_physical.py.)
    """
    orders, lineitem = catalog.load_tables(spark, sf_dir,
                                           "orders", "lineitem")
    token = _token(sf_dir)
    ot, lt = f"ndp_b_orders_{token}", f"ndp_b_lineitem_{token}"
    _sweep_stale_bucketed(spark, keep={ot, lt},
                          prefixes=("ndp_b_orders_", "ndp_b_lineitem_"))
    physical.write_bucketed(
        orders.select("o_orderkey", "o_orderpriority"), ot, "o_orderkey")
    physical.write_bucketed(
        lineitem.select("l_orderkey", "l_quantity"), lt, "l_orderkey")
    joined = physical.bucketed_join(spark, ot, lt,
                                    "o_orderkey", "l_orderkey")
    return (joined.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum(F.col("l_quantity").cast("bigint"))
                  .alias("total_qty")))


@register(
    "layout_zorder_scan",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
             AS value_milli
    FROM events
    WHERE user_id BETWEEN 100 AND 220 AND event_id BETWEEN 1000 AND 9000
    GROUP BY event_type
    """,
    tags=("layout", "zorder", "data-skipping"),
)
def layout_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering: rewrite events interleaving
    (user_id, event_id) bits so file footers carry tight bounding boxes
    in BOTH dimensions, then answer a 2-D range predicate from the
    relaid copy. A 1-D sort serves only its own column; Z-order is what
    lets one layout serve user-sliced AND id-sliced scans at 100 TB.

    The gate proves layout neutrality (same answer as the original
    parquet); the footer-stat pruning win is asserted file-by-file in
    tests/test_physical.py. FLOOR (not CAST) bridges double→bigint
    identically on both engines — Spark CAST truncates, DuckDB rounds.
    """
    events = catalog.load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value")
    out = _workdir("zorder", sf_dir)
    physical.write_morton_sorted(events, out, "user_id", "event_id")
    relaid = spark.read.parquet(out)
    return (relaid
            .filter(F.col("user_id").between(100, 220)
                    & F.col("event_id").between(1000, 9000))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.floor(F.col("value") * 1000).cast("bigint"))
                  .alias("value_milli")))


@register(
    "store_compaction_scan",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
    tags=("layout", "compaction", "maintenance"),
)
def store_compaction_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction as a gated op: explode documents into 64
    splinter files (the streaming-sink failure mode), compact to 4
    doc_id-sorted files via the staged-swap rewrite, and aggregate the
    compacted store. Compaction must be invisible to readers — the
    oracle never sees the detour. (Atomic-swap crash safety and file
    counts are unit-tested in tests/test_physical.py.)
    """
    docs = catalog.load(spark, sf_dir, "documents")
    out = _workdir("compact", sf_dir)
    docs.repartition(64).write.parquet(out)
    physical.compact(spark, out, target_files=4, sort_within_by="doc_id")
    return (spark.read.parquet(out)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars")))


@register(
    "store_delete_rows",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE NOT COALESCE(lang = 'de', FALSE)
    GROUP BY source
    """,
    tags=("layout", "delete", "gdpr"),
)
def store_delete_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten as a gated op: copy documents, delete the
    lang='de' rows with the copy-on-write rewrite, aggregate the
    survivor store. The oracle applies the same predicate logically —
    including the NULL-keeps rule (a NULL lang did NOT match the
    delete predicate and must survive; a bare ``lang <> 'de'`` would
    silently drop it on both engines).
    """
    docs = catalog.load(spark, sf_dir, "documents")
    out = _workdir("delete", sf_dir)
    docs.write.parquet(out)
    physical.delete_rows(spark, out, "lang = 'de'")
    return (spark.read.parquet(out)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars")))
