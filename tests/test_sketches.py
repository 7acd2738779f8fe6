"""Error and merge-consistency gates for the sketch aggregates
(operators/sketches.py) — the checks the DuckDB oracle can't express."""

from __future__ import annotations

import new_data_pipeline_spark as engine
from tests.conftest import SF_DIR

engine.load_all()


def test_hll_estimate_within_error(spark):
    """HLL at lg_k=12 has ~1.6% RSE; gate at 5% against exact counts."""
    rows = engine.QUERIES["agg_hll_sketch"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        rel_err = abs(r["approx_users"] - r["exact_users"]) / r["exact_users"]
        assert rel_err < 0.05, (
            f"{r['event_type']}: estimate {r['approx_users']} vs "
            f"exact {r['exact_users']} (err {rel_err:.3f})")


def test_hll_merge_matches_single_pass(spark):
    """Union of per-day sketches must estimate the same as one global
    sketch per event_type (HLL union is lossless at equal lg_k)."""
    single = {r["event_type"]: r["approx_users"]
              for r in engine.QUERIES["agg_hll_sketch"].fn(spark, SF_DIR).collect()}
    merged = engine.QUERIES["agg_hll_mergeable_rollup"].fn(spark, SF_DIR).collect()
    assert merged
    for r in merged:
        assert r["approx_users"] == single[r["event_type"]], (
            f"{r['event_type']}: merged {r['approx_users']} "
            f"!= single-pass {single[r['event_type']]}")
        assert r["n_days_merged"] > 1  # the rollup actually merged sketches
