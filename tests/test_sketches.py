"""Error and merge-consistency gates for the sketch aggregates
(operators/sketches.py). The registered queries now carry bounded-error
flags for the driver gate; these tests recompute the RAW estimates so a
broken flag can't vouch for itself."""

from __future__ import annotations

from pyspark.sql import functions as F

import new_data_pipeline_spark as engine
from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.operators.sketches import LG_K
from tests.conftest import SF_DIR

engine.load_all()


def _raw_sketch_rows(spark):
    events = catalog.load(spark, SF_DIR, "events")
    return (events.groupBy("event_type")
            .agg(F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(LG_K)))
                .alias("approx_users"),
                F.count_distinct("user_id").alias("exact_users"))
            .collect())


def test_hll_estimate_within_error(spark):
    """HLL at lg_k=12 has ~1.6% RSE; gate at 5% against exact counts,
    and the registered query's flags must agree."""
    rows = _raw_sketch_rows(spark)
    assert rows
    for r in rows:
        rel_err = abs(r["approx_users"] - r["exact_users"]) / r["exact_users"]
        assert rel_err < 0.05, (
            f"{r['event_type']}: estimate {r['approx_users']} vs "
            f"exact {r['exact_users']} (err {rel_err:.3f})")
    for r in engine.QUERIES["agg_hll_sketch"].fn(spark, SF_DIR).collect():
        assert r["within_5pct"] == 1, r


def test_hll_merge_tracks_single_pass(spark):
    """Union of per-day sketches must track a single whole-pass sketch
    per event_type. NOT asserted as equality: per-day sketches cross
    the Datasketches sparse→dense promotion at different cardinalities
    than one whole-pass sketch, so their union is near-but-not-equal
    once groups outgrow sparse mode (found by the sf0.1 parity audit,
    round 3). The guarantee worth holding is closeness to the single
    pass and the error bound vs exact."""
    single = {r["event_type"]: r["approx_users"]
              for r in _raw_sketch_rows(spark)}
    events = catalog.load(spark, SF_DIR, "events")
    daily = (events
             .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
             .agg(F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("sketch")))
    merged = (daily.groupBy("event_type")
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch"))
                   .alias("approx_users"),
                   F.count(F.lit(1)).alias("n_days_merged"))
              .collect())
    assert merged
    for r in merged:
        s = single[r["event_type"]]
        assert abs(r["approx_users"] - s) <= 0.02 * max(s, 1), (
            f"{r['event_type']}: merged {r['approx_users']} "
            f"vs single-pass {s}")
        assert r["n_days_merged"] > 1  # the rollup actually merged sketches
    for r in engine.QUERIES["agg_hll_mergeable_rollup"].fn(spark, SF_DIR) \
            .collect():
        assert r["within_5pct"] == 1, r


def test_bloom_membership_no_false_negatives(spark):
    """Every actual member must be claimed by the filter (the Bloom
    guarantee), and the probe set must exercise both member and
    non-member rows so the gate isn't vacuous."""
    from new_data_pipeline_spark.operators.sketches import (
        agg_bloom_membership)
    from tests.conftest import SF_DIR

    rows = agg_bloom_membership(spark, SF_DIR).collect()
    assert len(rows) == 30
    assert all(r["no_false_negative"] == 1 for r in rows)
    kinds = {r["actually_member"] for r in rows}
    assert kinds == {0, 1}, "probes must include members AND non-members"
