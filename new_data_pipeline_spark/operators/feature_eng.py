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
from new_data_pipeline_spark.functions.exact import money
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


# Shared Cramer denominators for the OLS normal equations (3×3, two
# features + intercept). Named so the Spark expression tree and the
# oracle SQL spell the SAME operand order — IEEE double arithmetic is
# deterministic but not associative, so parity requires identical
# expression shape, not just identical math (the agg_corr_regression
# device, one matrix size up).
_OLS_SUFFICIENT = """
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx1,
             CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sx2,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx11,
             CAST(SUM(CAST(l_discount AS DECIMAL(12,2))
                      * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sx22,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sx12,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               AS sx1y,
             CAST(SUM(CAST(l_discount AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               AS sx2y,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               AS syy
      FROM lineitem GROUP BY l_returnflag
"""


@register(
    "ml_ols_regression",
    oracle=f"""
    WITH s AS ({_OLS_SUFFICIENT}
    ), m AS (
      SELECT *,
             sx11 * sx22 - sx12 * sx12 AS ma,
             sx1 * sx22 - sx12 * sx2  AS mb,
             sx1 * sx12 - sx11 * sx2  AS mc,
             sx1y * sx22 - sx12 * sx2y AS md,
             sx1y * sx12 - sx11 * sx2y AS me,
             sx1 * sx2y - sx1y * sx2  AS mg,
             sx11 * sx2y - sx1y * sx12 AS mh
      FROM s
    ), c AS (
      SELECT *,
             (sy * ma - sx1 * md + sx2 * me)
               / (n * ma - sx1 * mb + sx2 * mc) AS b0,
             (n * md - sy * mb + sx2 * mg)
               / (n * ma - sx1 * mb + sx2 * mc) AS b1,
             (n * mh - sx1 * mg + sy * mc)
               / (n * ma - sx1 * mb + sx2 * mc) AS b2
      FROM m
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           ROUND(b0, 6) AS intercept,
           ROUND(b1, 6) AS beta_qty,
           ROUND(b2, 6) AS beta_disc,
           ROUND(1 - (syy - b0 * sy - b1 * sx1y - b2 * sx2y)
                 / (syy - sy * sy / n), 6) AS r2
    FROM c ORDER BY l_returnflag
    """,
    tags=("ml", "regression", "trained-by-aggregation"),
)
def ml_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form multiple linear regression (extendedprice on
    quantity + discount, per return flag) trained BY AGGREGATION: one
    pass collects the ten exact sufficient statistics (integer sums
    for quantity, DECIMAL(12,2) sums for the money columns — exact and
    associative at any scale), the 3×3 normal equations solve via
    Cramer's rule on the driver-free 3-row frame, and R² falls out of
    the same sums (SSE = Σy² − b·Σxy needs no second pass).

    This is the distributed-OLS textbook pattern (X'X is mergeable, so
    the "fit" is map-side combinable all the way down): at 100 TB the
    only shuffle is the 3-group aggregate, and the solve itself costs
    nothing because it runs inside the projection of a 3-row frame —
    no driver collect, no iteration, no Spark-ML dependency.

    Parity: sums exact → cast double once → BOTH engines evaluate the
    literally identical Cramer expression tree (minors named ma..mh in
    the oracle, same operand order here) → round 6 dp at the boundary.
    """
    li = catalog.load(spark, sf_dir, "lineitem")
    x1 = F.col("l_quantity").cast("bigint")
    x2 = F.col("l_discount").cast("decimal(12,2)")
    y = money("l_extendedprice")
    s = (li.groupBy("l_returnflag")
         .agg(F.count(F.lit(1)).cast("double").alias("n"),
              F.sum(x1).cast("double").alias("sx1"),
              F.sum(x2).cast("double").alias("sx2"),
              F.sum(x1 * x1).cast("double").alias("sx11"),
              F.sum(x2 * x2).cast("double").alias("sx22"),
              F.sum(x1 * x2).cast("double").alias("sx12"),
              F.sum(y).cast("double").alias("sy"),
              F.sum(x1 * y).cast("double").alias("sx1y"),
              F.sum(x2 * y).cast("double").alias("sx2y"),
              F.sum(y * y).cast("double").alias("syy")))
    n, sx1, sx2 = F.col("n"), F.col("sx1"), F.col("sx2")
    sx11, sx22, sx12 = F.col("sx11"), F.col("sx22"), F.col("sx12")
    sy, sx1y, sx2y, syy = (F.col("sy"), F.col("sx1y"),
                           F.col("sx2y"), F.col("syy"))
    m = s.withColumns({
        "ma": sx11 * sx22 - sx12 * sx12,
        "mb": sx1 * sx22 - sx12 * sx2,
        "mc": sx1 * sx12 - sx11 * sx2,
        "md": sx1y * sx22 - sx12 * sx2y,
        "me": sx1y * sx12 - sx11 * sx2y,
        "mg": sx1 * sx2y - sx1y * sx2,
        "mh": sx11 * sx2y - sx1y * sx12,
    })
    ma, mb, mc = F.col("ma"), F.col("mb"), F.col("mc")
    md, me, mg, mh = F.col("md"), F.col("me"), F.col("mg"), F.col("mh")
    det = n * ma - sx1 * mb + sx2 * mc
    c = m.withColumns({
        "b0": (sy * ma - sx1 * md + sx2 * me) / det,
        "b1": (n * md - sy * mb + sx2 * mg) / det,
        "b2": (n * mh - sx1 * mg + sy * mc) / det,
    })
    b0, b1, b2 = F.col("b0"), F.col("b1"), F.col("b2")
    return (c.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        F.round(b0, 6).alias("intercept"),
        F.round(b1, 6).alias("beta_qty"),
        F.round(b2, 6).alias("beta_disc"),
        F.round(1 - (syy - b0 * sy - b1 * sx1y - b2 * sx2y)
                / (syy - sy * sy / n), 6).alias("r2"))
        .orderBy("l_returnflag"))
