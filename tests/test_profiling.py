"""Profiling-operator unit tests (the oracle-parity replay covers the
registered gates; these pin driver-side exact replays and bounds)."""

from __future__ import annotations

from pyspark.sql import functions as F

def test_gini_concentration_bounds_and_replay(spark):
    """Gini must land in [0, 1), equal a driver-side exact replay, and
    the plan must rank via the range-partition device (no single-task
    global window)."""
    from decimal import Decimal

    from new_data_pipeline_spark import catalog
    from new_data_pipeline_spark.operators.profiling import (
        profile_gini_concentration)
    from tests.conftest import SF_DIR

    row = profile_gini_concentration(spark, SF_DIR).collect()[0]
    assert 0.0 <= row["gini"] < 1.0
    revs = sorted(
        (Decimal(str(r["rev"])), r["o_custkey"]) for r in
        catalog.load(spark, SF_DIR, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
             .alias("rev")).collect())
    n = len(revs)
    tot = sum(x for x, _ in revs)
    wsum = sum((i + 1) * x for i, (x, _) in enumerate(revs))
    want = round(2.0 * float(wsum) / (n * float(tot)) - (n + 1.0) / n, 6)
    assert row["n_customers"] == n
    assert abs(row["gini"] - want) < 1e-9
    spark.catalog.clearCache()
