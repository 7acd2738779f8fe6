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
    # Bounded-error oracle (same device as the ANN and
    # approx_count_distinct gates): the Datasketches estimate is
    # engine-specific, so the query emits the EXACT count plus an
    # in-bound flag (≤5% ≈ 3σ at lg_k=12) and the oracle replays the
    # exact count with a literal-true flag.
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           CAST(1 AS INTEGER) AS within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("aggregate", "sketch", "approx"),
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via a Datasketches HLL sketch,
    driver-gated through the bounded-error device (exact count +
    in-bound flag); the raw-estimate error bound stays unit-gated."""
    events = catalog.load(spark, sf_dir, "events")
    approx = F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(LG_K)))
    exact = F.count_distinct("user_id")
    return (events.groupBy("event_type")
            .agg(exact.alias("exact_users"),
                 (F.abs(approx - exact) <= 0.05 * exact)
                 .cast("int").alias("within_5pct"))
            .orderBy("event_type"))


@register(
    "agg_hll_mergeable_rollup",
    # The merge path under the same bounded-error gate: the MERGED
    # estimate (union of per-day sketches) must honor the 5% bound
    # against the exact count. NOTE the gate is deliberately NOT
    # "union == single whole-pass sketch": that equality held at
    # sf0.01 but broke at the sf0.1 10x-scale audit — Datasketches
    # sketches promote sparse→dense at a cardinality threshold, and
    # per-day sketches cross it at different points than one whole-pass
    # sketch, so their union is near-but-not-bit-equal once groups
    # outgrow sparse mode. The production guarantee is the error bound
    # on the merged path, which is what this gates.
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT date_trunc('day', ts)) AS n_days_merged,
           COUNT(DISTINCT user_id) AS exact_users,
           CAST(1 AS INTEGER) AS within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("aggregate", "sketch", "approx", "rollup"),
)
def agg_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch *merge* path: build one HLL sketch per (event_type,
    day) — the grain a daily ingest job would persist — then union the
    binary sketches up to per-event_type totals without rescanning rows.

    This two-level plan is the 100 TB pattern: the expensive pass over
    raw events happens once at the fine grain; every coarser rollup
    (type, week, global…) is a cheap merge of kilobyte sketches.
    """
    events = catalog.load(spark, sf_dir, "events")
    daily = (events
             .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
             .agg(F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("sketch")))
    merged = (daily.groupBy("event_type")
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch"))
                   .alias("approx_users"),
                   F.count(F.lit(1)).cast("bigint").alias("n_days_merged")))
    exact = (events.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("exact_users")))
    return (merged.join(exact, ["event_type"])
            .select("event_type", "n_days_merged", "exact_users",
                    (F.abs(F.col("approx_users") - F.col("exact_users"))
                     <= 0.05 * F.col("exact_users"))
                    .cast("int").alias("within_5pct"))
            .orderBy("event_type"))
