"""KMV theta-sketch gates: exact-regime identity (sketch smaller than
the set ⇒ estimate IS the exact intersection), estimator accuracy on
the real event segments (so a correctly-replayed-but-wrong formula
can't hide behind the oracle), and partitioning invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from new_data_pipeline_spark.operators.kmv_sketch import (
    K, agg_theta_intersection, kmv_sketches, segment_elements)

from tests.conftest import SF_DIR


def test_exact_regime_estimate_equals_exact(spark):
    # both segments have < K distinct elements -> sketches hold the
    # whole sets, theta = full range, estimate must be exactly |A∩B|
    rows = ([("A", f"e{i}") for i in range(50)]
            + [("B", f"e{i}") for i in range(25, 75)])
    el = spark.createDataFrame(rows, "seg string, elem string")
    sk = kmv_sketches(el)
    assert sk.groupBy("seg").count().filter(F.col("count") >= K).count() == 0
    a = sk.filter(F.col("seg") == "A").select("h")
    b = sk.filter(F.col("seg") == "B").select("h")
    common = a.intersect(b).count()
    assert common == 25  # md5 is injective on this tiny domain


def test_estimator_accuracy_on_event_segments(spark):
    rows = agg_theta_intersection(spark, SF_DIR).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        est, exact = r["est_intersection"], r["exact_intersection"]
        assert exact > 0
        # k=128 -> sigma ~ 1/sqrt(k-1) ~ 8.9%; 4 sigma + small-count slack
        assert abs(est - exact) <= max(0.36 * exact, 10), r


def test_sketch_is_partitioning_invariant(spark):
    el = segment_elements(spark, SF_DIR)
    one = kmv_sketches(el.coalesce(1)).collect()
    many = kmv_sketches(el.repartition(16)).collect()
    assert sorted((r["seg"], r["h"]) for r in one) == \
           sorted((r["seg"], r["h"]) for r in many)


def test_sketch_size_capped_at_k(spark):
    el = segment_elements(spark, SF_DIR)
    sizes = kmv_sketches(el).groupBy("seg").count().collect()
    assert sizes and all(r["count"] <= K for r in sizes)
    # real segments exceed K distinct elements, so the sketch regime
    # (not the exact regime) is what the oracle gate exercises
    assert all(r["count"] == K for r in sizes)
