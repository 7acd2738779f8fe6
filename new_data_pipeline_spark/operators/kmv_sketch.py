"""KMV (k-minimum-values) theta sketches: set-INTERSECTION cardinality
estimation across segments — the sketch family HLL cannot provide
(HLL unions; intersections need inclusion-exclusion with compounding
error). One KMV sketch per segment supports union, intersection, and
difference estimates, the "theta sketch" workhorse of audience-overlap
/ cross-segment-reach analytics (Beyer et al. 2007; the Apache
DataSketches theta sketch is this idea productionized).

The estimator: hash every element uniformly into [0, 2^48); keep the k
smallest distinct hashes per segment. For a pair (A, B) let
θ = min(kth_A, kth_B) (or the full range when a sketch holds its whole
set — the exact regime). Every intersection element hashing below θ is
necessarily in BOTH sketches, so
|A∩B| ≈ |{h in both sketches : h < θ}| · 2^48/θ.

Execution shape at 100 TB:
- distinct (segment, element) then distinct hashes: two
  map-side-combinable shuffles on the segment/hash keys;
- per-segment k-smallest via a window PARTITIONED by segment (each
  partition sorts only its own hashes; k rows survive per segment);
- everything after sketching is k·|segments|-sized — pair scoring costs
  nothing regardless of corpus size. Sketches are mergeable: a
  per-partition k-smallest pre-pass (the same two-level shape as the
  KLL rollup in quantile_sketch.py) drops the shuffle to k rows per
  partition when segments are few and huge.

Parity devices: the hash family is md5 (first 12 hex chars = 48 bits,
double-exact below 2^53), so DuckDB replays the ENTIRE pipeline —
sketch contents, θ, and the estimate are all hash-gated, not
recall-gated (the r3 LSH/IVF device). The estimate's float arithmetic
is c · (2^48/θ): exact operands, two IEEE ops in parenthesized order,
rounded to 6 dp. A unit test separately pins the estimator's accuracy
against the exact intersection so a correctly-replayed-but-wrong
formula cannot hide.

Reference analog: none — SURVEY.md §2.2 aggregation-extension
territory alongside HLL (operators/sketches.py) and KLL
(functions/kll.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

K = 128
HASH_SPACE = 2**48  # 12 hex chars of md5; exact as a double (< 2^53)


def segment_elements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(seg, elem): one row per distinct (event_type, user-day) — the
    'audience member on a day' grain whose cross-segment overlap the
    query estimates."""
    ev = catalog.load(spark, sf_dir, "events")
    return (ev.select(F.col("event_type").alias("seg"),
                      F.concat_ws("|", F.col("user_id"),
                                  F.to_date("ts").cast("string"))
                      .alias("elem"))
            .distinct())


def kmv_sketches(elements: DataFrame, k: int = K) -> DataFrame:
    """(seg, h): the k smallest distinct 48-bit hashes per segment."""
    hashed = (elements.select(
        "seg",
        F.expr("CAST(conv(substring(md5(elem), 1, 12), 16, 10) AS BIGINT)")
        .alias("h"))
        .distinct())  # absorb (astronomically unlikely) hash collisions
    w = Window.partitionBy("seg").orderBy("h")
    return (hashed.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k).drop("rk"))


@register(
    "agg_theta_intersection",
    oracle=f"""
    WITH el AS (
      SELECT DISTINCT event_type AS seg,
             user_id || '|' || CAST(CAST(ts AS DATE) AS VARCHAR) AS elem
      FROM events
    ), h AS (
      SELECT DISTINCT seg,
             CAST(('0x' || substr(md5(elem), 1, 12)) AS BIGINT) AS h
      FROM el
    ), sk AS (
      SELECT seg, h FROM (
        SELECT seg, h,
               ROW_NUMBER() OVER (PARTITION BY seg ORDER BY h) AS rk
        FROM h)
      WHERE rk <= {K}
    ), summ AS (
      SELECT seg, COUNT(*) AS cnt, MAX(h) AS kth FROM sk GROUP BY seg
    ), pairs AS (
      SELECT a.seg AS seg_a, b.seg AS seg_b,
             LEAST(CASE WHEN a.cnt < {K} THEN {HASH_SPACE} ELSE a.kth END,
                   CASE WHEN b.cnt < {K} THEN {HASH_SPACE} ELSE b.kth END)
               AS theta
      FROM summ a JOIN summ b ON a.seg < b.seg
    ), common AS (
      SELECT a.seg AS seg_a, b.seg AS seg_b, COUNT(*) AS c
      FROM sk a
      JOIN sk b ON a.h = b.h AND a.seg < b.seg
      JOIN pairs p ON p.seg_a = a.seg AND p.seg_b = b.seg
      WHERE a.h < p.theta
      GROUP BY 1, 2
    ), exact AS (
      SELECT a.seg AS seg_a, b.seg AS seg_b, COUNT(*) AS x
      FROM el a JOIN el b ON a.elem = b.elem AND a.seg < b.seg
      GROUP BY 1, 2
    )
    SELECT p.seg_a, p.seg_b,
           ROUND(CAST(COALESCE(c.c, 0) AS DOUBLE)
                 * (CAST({HASH_SPACE} AS DOUBLE) / p.theta), 6)
             AS est_intersection,
           CAST(COALESCE(e.x, 0) AS BIGINT) AS exact_intersection
    FROM pairs p
    LEFT JOIN common c ON c.seg_a = p.seg_a AND c.seg_b = p.seg_b
    LEFT JOIN exact e ON e.seg_a = p.seg_a AND e.seg_b = p.seg_b
    """,
    tags=("agg", "sketch", "theta", "intersection"),
)
def agg_theta_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap of every event-type pair at the user-day grain:
    KMV estimate next to the exact intersection (the exact column is
    the gate's witness; production would drop it)."""
    el = segment_elements(spark, sf_dir)
    sk = kmv_sketches(el).persist()
    summ = sk.groupBy("seg").agg(F.count(F.lit(1)).alias("cnt"),
                                 F.max("h").alias("kth"))
    theta = F.when(F.col("cnt") < K, F.lit(HASH_SPACE)).otherwise(F.col("kth"))
    a = summ.select(F.col("seg").alias("seg_a"), theta.alias("ta"))
    b = summ.select(F.col("seg").alias("seg_b"), theta.alias("tb"))
    pairs = (a.join(b, F.col("seg_a") < F.col("seg_b"))
             .select("seg_a", "seg_b",
                     F.least("ta", "tb").alias("theta")))
    ska = sk.select(F.col("seg").alias("sa"), "h")
    skb = sk.select(F.col("seg").alias("sb"), F.col("h").alias("hb"))
    common = (ska.join(skb, (F.col("h") == F.col("hb"))
                       & (F.col("sa") < F.col("sb")))
              .join(pairs, (F.col("sa") == F.col("seg_a"))
                    & (F.col("sb") == F.col("seg_b")))
              .filter(F.col("h") < F.col("theta"))
              .groupBy("seg_a", "seg_b")
              .agg(F.count(F.lit(1)).alias("c")))
    ea = el.select(F.col("seg").alias("xa"), "elem")
    eb = el.select(F.col("seg").alias("xb"), F.col("elem").alias("elem_b"))
    exact = (ea.join(eb, (F.col("elem") == F.col("elem_b"))
                     & (F.col("xa") < F.col("xb")))
             .groupBy(F.col("xa").alias("seg_a"), F.col("xb").alias("seg_b"))
             .agg(F.count(F.lit(1)).alias("x")))
    return (pairs
            .join(common, ["seg_a", "seg_b"], "left")
            .join(exact, ["seg_a", "seg_b"], "left")
            .select("seg_a", "seg_b",
                    F.round(F.coalesce(F.col("c"), F.lit(0)).cast("double")
                            * (F.lit(float(HASH_SPACE)) / F.col("theta")), 6)
                    .alias("est_intersection"),
                    F.coalesce(F.col("x"), F.lit(0)).cast("bigint")
                    .alias("exact_intersection")))
