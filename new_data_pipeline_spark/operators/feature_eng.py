"""ML feature engineering: the fit-then-transform preprocessing ops a
training pipeline runs between curation and tensorization — expressed
as pure aggregates + broadcast joins so "fit" never leaves the cluster
and "transform" is map-only (the same broadcast-model shape as
model_score.py's logistic inference).

- Quantile binning (Spark ML's QuantileDiscretizer, made exact and
  engine-portable): decile boundaries from EXACT interpolated
  percentiles — computed once as a 1-row aggregate, broadcast, and
  applied with a higher-order filter count. No global sort, no NTILE
  (which would be an unpartitioned window — banned repo-wide).
- Target encoding with additive smoothing (the classic high-cardinality
  categorical device): enc(seg) = (Σ_seg target + m·μ) / (n_seg + m),
  m = 50 — per-segment sums as exact decimals, the global mean entering
  as a 1-row cross join.

Parity devices: percentile boundaries rounded to 6 dp on BOTH engines
(Spark percentile vs DuckDB quantile_cont differ in last-ulp
interpolation — the agg_corr_regression device); bin assignment
compares raw doubles against the ROUNDED boundaries, identical
comparisons on identical values; all sums are DECIMAL(12,2) money
sums; the smoothing formula is single IEEE ops on identical operands,
rounded 6 dp at the boundary.

Reference analog: none — the reference tensorizes raw columns
(serialize.py:200-240) with no preprocessing stage; SURVEY.md §2.2
extension territory beside T2/T3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

N_BINS = 10
SMOOTHING = 50


@register(
    "ml_quantile_binning",
    oracle=f"""
    WITH b AS (
      SELECT [ROUND(q, 6) for q in
              quantile_cont(o_totalprice,
                            [x * 1.0 / {N_BINS} for x in
                             range(1, {N_BINS})])] AS bounds
      FROM orders
    ), binned AS (
      SELECT o_totalprice,
             1 + len(list_filter(b.bounds, x -> x < o_totalprice))
               AS bin
      FROM orders, b
    )
    SELECT bin, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
             AS total_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM binned GROUP BY bin
    """,
    tags=("ml", "feature", "binning"),
)
def ml_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-decile binning of order totals: fit = one percentile
    aggregate (9 boundaries, rounded 6 dp), transform = broadcast the
    boundary array and count boundaries strictly below each value."""
    orders = catalog.load(spark, sf_dir, "orders")
    qs = [i / N_BINS for i in range(1, N_BINS)]
    bounds = orders.agg(F.expr(
        "transform(percentile(o_totalprice, array("
        + ", ".join(str(q) for q in qs)
        + ")), q -> round(q, 6))").alias("bounds"))
    binned = (orders.crossJoin(bounds)
              .select("o_totalprice",
                      (F.lit(1) + F.size(F.filter(
                          "bounds",
                          lambda x: x < F.col("o_totalprice"))))
                      .alias("bin")))
    return (binned.groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
                 .cast("double").alias("total_price"),
                 F.min("o_totalprice").alias("min_price"),
                 F.max("o_totalprice").alias("max_price")))


@register(
    "ml_target_encoding",
    oracle=f"""
    WITH j AS (
      SELECT c.c_mktsegment AS segment, o.o_totalprice AS target
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), g AS (
      SELECT CAST(SUM(CAST(target AS DECIMAL(12,2))) AS DOUBLE) AS gsum,
             COUNT(*) AS gn
      FROM j
    ), seg AS (
      SELECT segment,
             CAST(SUM(CAST(target AS DECIMAL(12,2))) AS DOUBLE) AS ssum,
             COUNT(*) AS n
      FROM j GROUP BY segment
    )
    SELECT seg.segment, seg.n,
           ROUND(seg.ssum / seg.n, 6) AS raw_mean,
           ROUND((seg.ssum + {SMOOTHING} * (g.gsum / g.gn))
                 / (seg.n + {SMOOTHING}), 6) AS encoded
    FROM seg, g
    """,
    tags=("ml", "feature", "target-encoding"),
)
def ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of market segment against order total:
    per-segment decimal-exact sums blended with the global mean under
    additive smoothing (m = 50) — rare categories shrink toward the
    prior, the high-cardinality-categorical workhorse."""
    orders = catalog.load(spark, sf_dir, "orders")
    customer = catalog.load(spark, sf_dir, "customer")
    j = (orders.join(customer,
                     orders["o_custkey"] == customer["c_custkey"])
         .select(F.col("c_mktsegment").alias("segment"),
                 F.col("o_totalprice").alias("target")))
    dec = F.col("target").cast("decimal(12,2)")
    g = j.agg(F.sum(dec).cast("double").alias("gsum"),
              F.count(F.lit(1)).alias("gn"))
    seg = (j.groupBy("segment")
           .agg(F.sum(dec).cast("double").alias("ssum"),
                F.count(F.lit(1)).alias("n")))
    return (seg.crossJoin(g)
            .select("segment", "n",
                    F.round(F.col("ssum") / F.col("n"), 6)
                    .alias("raw_mean"),
                    F.round((F.col("ssum")
                             + SMOOTHING * (F.col("gsum") / F.col("gn")))
                            / (F.col("n") + SMOOTHING), 6)
                    .alias("encoded")))
