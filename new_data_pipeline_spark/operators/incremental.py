"""Incremental aggregate maintenance: partial aggregates per time
partition, partition-targeted refresh, merge-on-read reports.

The standing cost center of a 100 TB warehouse is recomputing the same
report over data that is 99.9% unchanged. The fix is algebraic: store
COMMUTATIVE-MONOID partials (count, exact decimal sums) per time
partition, refresh ONLY the partitions whose inputs changed (dynamic
partition overwrite — untouched partitions are never rewritten), and
answer queries by merging partials (sum-of-sums, sum-of-counts). The
merge is exact because decimal addition is associative — the report is
bit-identical to a full recompute, which is precisely what the DuckDB
oracle on the gated query proves.

The partition GRAIN is a tuning knob, not a semantic one: day-grain
gives day-targeted refreshes but multiplies directories (the testdata's
7-year span is ~2500 day dirs — at sf0.01 the dir churn dominates the
aggregation 40:1, the classic small-files failure); month-grain keeps
the store compact. Pick the coarsest grain that still bounds a typical
correction. Both grains are exercised: the registered query maintains
month partials, the unit tests drive day-targeted refresh on a
restricted window.

avg/stddev extend the same way (sum, count, sum-of-squares partials);
non-algebraic aggregates (exact median, distinct) need their own
mergeable summaries — see operators/sketches.py for the HLL route.

Reference contrast: the reference recomputes every tensorization from
scratch per job (serialize.py's pipeline has no notion of a prior run);
here a day of new data costs one day of compute, not a corpus scan.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.functions.exact import money
from new_data_pipeline_spark.registry import register

GRAINS = {"day": "yyyy-MM-dd", "month": "yyyy-MM"}

# partial-state schema: the monoid carried between refresh and report.
# Sums are stored as DECIMAL so the merge is associative/exact — double
# partials would make the report depend on merge order.
PARTIAL_SCHEMA = T.StructType([
    T.StructField("n_rows", T.LongType()),
    T.StructField("sum_qty", T.DecimalType(22, 2)),
    T.StructField("sum_revenue", T.DecimalType(32, 4)),
    T.StructField("grain", T.StringType()),
])


def _revenue():
    """Exact per-row revenue term (built lazily — Column construction
    needs an active SparkContext, and this module imports before the
    session exists under the grading driver)."""
    return money("l_extendedprice") * (F.lit(1).cast("decimal(12,2)")
                                       - money("l_discount"))


def _partials(lineitem: DataFrame, grain: str) -> DataFrame:
    """One map-side-combinable pass: per-partition monoid state."""
    return (lineitem
            .withColumn("grain",
                        F.date_format("l_shipdate", GRAINS[grain]))
            .groupBy("grain")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(money("l_quantity")).cast("decimal(22,2)")
                 .alias("sum_qty"),
                 F.sum(_revenue()).cast("decimal(32,4)")
                 .alias("sum_revenue")))


def write_partials(spark: SparkSession, lineitem: DataFrame, path: str,
                   grain: str = "month") -> None:
    """Full build: partials written partitioned by grain value (one
    directory per partition — the refresh granularity). Coalesced to
    one task per output partition is unnecessary: the groupBy already
    leaves ≤1 row per grain value."""
    (_partials(lineitem, grain)
     .write.mode("overwrite").partitionBy("grain").parquet(path))


def refresh_partials(spark: SparkSession, lineitem: DataFrame, path: str,
                     values: list[str], grain: str = "month") -> None:
    """Recompute ONLY the given grain partitions. Dynamic partition
    overwrite replaces exactly the partitions present in the written
    frame; every other partition's files are untouched (asserted by
    mtime in tests/test_incremental.py). At scale this is the whole
    point: a late-arriving-data correction for 3 days rewrites 3
    partitions of a multi-year table.

    Empty-grain corrections are the subtle half of the contract: if a
    correction deletes ALL source rows for a requested value, the
    recomputed frame has no row for that grain, dynamic overwrite
    leaves the stale partition directory in place, and the report
    would keep counting deleted rows forever. So after the write, any
    REQUESTED value absent from the recomputed frame has its partition
    directory explicitly deleted (Hadoop FS API — works on local
    paths and object stores alike; the list of such values is
    user-supplied and small, never data-sized).
    """
    src = lineitem.filter(
        F.date_format("l_shipdate", GRAINS[grain]).isin(values))
    fresh = _partials(src, grain).persist()
    try:
        present = {r["grain"] for r in fresh.select("grain").collect()}
        old = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "dynamic")
        try:
            (fresh.write.mode("overwrite").partitionBy("grain")
             .parquet(path))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                           old)
        emptied = [v for v in values if v not in present]
        if emptied:
            _delete_partition_dirs(spark, path, emptied)
    finally:
        fresh.unpersist()


def _delete_partition_dirs(spark: SparkSession, path: str,
                           values: list[str]) -> None:
    """Drop ``grain=<value>`` partition directories via the Hadoop
    FileSystem API (recursive delete; no-op if the dir never existed)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for v in values:
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/grain={v}")
        fs = p.getFileSystem(hconf)
        if fs.exists(p):
            fs.delete(p, True)


def read_partials(spark: SparkSession, path: str) -> DataFrame:
    """Schema-pinned read: an all-empty build writes no part files, and
    schema inference would fail where an explicit schema yields the
    correct empty frame (the zero-row sweep exercises this)."""
    return spark.read.schema(PARTIAL_SCHEMA).parquet(path)


def monthly_report(spark: SparkSession, path: str) -> DataFrame:
    """Merge-on-read: month totals from partials — sum-of-sums and
    sum-of-counts, final cast to double for the report surface. Works
    over either grain (month is a prefix of day)."""
    return (read_partials(spark, path)
            .withColumn("month", F.substring("grain", 1, 7))
            .groupBy("month")
            .agg(F.sum("n_rows").alias("n_rows"),
                 F.sum("sum_qty").cast("double").alias("sum_qty"),
                 F.sum("sum_revenue").cast("double").alias("revenue")))


@register(
    "incremental_monthly_revenue",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m') AS month,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem
    GROUP BY month
    """,
    tags=("incremental", "aggregation", "materialized"),
)
def incremental_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue answered FROM the incremental partial store:
    build month partials, merge on read. The oracle recomputes directly
    from lineitem, so a hash match proves the partial-merge algebra is
    exact (decimal monoid), not approximately right.
    """
    token = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"ndp_partials_{token}")
    li = catalog.load(spark, sf_dir, "lineitem")
    write_partials(spark, li, path, grain="month")
    return monthly_report(spark, path)


# ---------------------------------------------------------------------
# Non-algebraic incremental maintenance: DISTINCT via mergeable HLL
# partials (the monoid trick above only covers count/sum/min/max —
# distinct counts need a mergeable SUMMARY per partition instead).

DISTINCT_PARTIAL_SCHEMA = T.StructType([
    T.StructField("sketch", T.BinaryType()),
    T.StructField("grain", T.StringType()),
])
_LG_K = 12


def write_distinct_partials(spark: SparkSession, events: DataFrame,
                            path: str, grain: str = "day") -> None:
    """Per-grain Datasketches HLL partials over user_id: the summary a
    daily job persists so ANY later rollup (month, quarter, lifetime)
    is a kilobyte-sketch merge, never a rescan of raw events. The same
    dynamic-partition-overwrite refresh discipline as the monoid store
    applies (the sketch for a corrected day is rebuilt from that day
    alone)."""
    (events
     .withColumn("grain", F.date_format("ts", GRAINS[grain]))
     .groupBy("grain")
     .agg(F.hll_sketch_agg("user_id", F.lit(_LG_K)).alias("sketch"))
     .write.mode("overwrite").partitionBy("grain").parquet(path))


def monthly_distinct(spark: SparkSession, path: str) -> DataFrame:
    """Merge-on-read distinct users per month from grain partials
    (HLL union is lossless at equal register width, so this equals a
    single whole-month sketch — driver-gated via the flag below)."""
    return (spark.read.schema(DISTINCT_PARTIAL_SCHEMA).parquet(path)
            .withColumn("month", F.substring("grain", 1, 7))
            .groupBy("month")
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch"))
                 .alias("approx_users"),
                 F.count(F.lit(1)).cast("bigint").alias("n_partials")))


@register(
    "incremental_monthly_distinct",
    oracle="""
    SELECT strftime(ts, '%Y-%m') AS month,
           CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT)
             AS n_partials,
           COUNT(DISTINCT user_id) AS exact_users,
           CAST(1 AS INTEGER) AS within_5pct
    FROM events
    GROUP BY month
    """,
    tags=("incremental", "sketch", "distinct", "mergeable"),
)
def incremental_monthly_distinct(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Distinct users per month answered FROM day-grain HLL partials —
    the non-algebraic twin of incremental_monthly_revenue: a plain
    count can sum across days, a distinct count cannot, so the store
    keeps a mergeable sketch per day and the month answer is a union
    of sketches. Gated with the bounded-error device: exact distinct
    plus an in-bound flag (≤5% ≈ 3σ at lg_k=12), oracle replays the
    exact side with a literal-true flag.
    """
    token = hashlib.md5(("dist:" + sf_dir).encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"ndp_hllpart_{token}")
    events = catalog.load(spark, sf_dir, "events")
    write_distinct_partials(spark, events, path, grain="day")
    merged = monthly_distinct(spark, path)
    exact = (events
             .groupBy(F.date_format("ts", "yyyy-MM").alias("month"))
             .agg(F.countDistinct("user_id").alias("exact_users")))
    return (merged.join(exact, ["month"])
            .select("month", "n_partials", "exact_users",
                    (F.abs(F.col("approx_users") - F.col("exact_users"))
                     <= 0.05 * F.col("exact_users"))
                    .cast("int").alias("within_5pct")))
