"""Sketch aggregates: HyperLogLog distinct-count sketches, including the
merge path that makes them the right tool at 100 TB.

No reference analog (the reference's only "statistic" is a row count,
reference serialize.py:665-667). At scale, COUNT(DISTINCT) is a full
shuffle of every distinct value; an HLL sketch is a few KB per group,
map-side combinable, and — critically — *mergeable after the fact*:
pre-aggregated per-partition/per-day sketches roll up to any coarser
grain without touching raw data again. Estimates are approximate, so
these are rows-only queries; the error bound is gated by unit test
(tests/test_sketches.py) against exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

LG_K = 12  # 2^12 registers → ~1.6% relative standard error


@register(
    "agg_hll_sketch",
    oracle=None,  # estimate; error bound gated in tests/test_sketches.py
    tags=("aggregate", "sketch", "approx"),
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via a Datasketches HLL sketch,
    alongside the exact count the unit test compares against."""
    events = catalog.load(spark, sf_dir, "events")
    return (events.groupBy("event_type")
            .agg(F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(LG_K)))
                .alias("approx_users"),
                F.count_distinct("user_id").alias("exact_users"))
            .orderBy("event_type"))


@register(
    "agg_hll_mergeable_rollup",
    oracle=None,  # estimate; merge-consistency gated in tests/test_sketches.py
    tags=("aggregate", "sketch", "approx", "rollup"),
)
def agg_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch *merge* path: build one HLL sketch per (event_type,
    day) — the grain a daily ingest job would persist — then union the
    binary sketches up to per-event_type totals without rescanning rows.

    This two-level plan is the 100 TB pattern: the expensive pass over
    raw events happens once at the fine grain; every coarser rollup
    (type, week, global…) is a cheap merge of kilobyte sketches. The
    unit test checks the merged estimate equals the single-pass estimate
    (HLL union is lossless over the same register width).
    """
    events = catalog.load(spark, sf_dir, "events")
    daily = (events
             .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
             .agg(F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("sketch")))
    return (daily.groupBy("event_type")
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch"))
                 .alias("approx_users"),
                 F.count(F.lit(1)).alias("n_days_merged"))
            .orderBy("event_type"))
