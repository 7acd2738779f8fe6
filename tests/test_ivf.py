"""Recall gate for the IVF-flat approximate similarity path
(operators/similarity.py sim_ivf_topk) against the exact brute-force
baseline — the check the DuckDB oracle can't express."""

from __future__ import annotations

import new_data_pipeline_spark as engine
from tests.conftest import SF_DIR

engine.load_all()


def _topk_pairs(spark, name):
    return {(r["query_id"], r["candidate_id"])
            for r in engine.QUERIES[name].fn(spark, SF_DIR).collect()}


def test_ivf_recall_vs_bruteforce(spark):
    """nprobe=3 over ~16 data-adapted cells must recover well above the
    random baseline (3/16 ≈ 19%) of exact top-5 neighbors."""
    exact = _topk_pairs(spark, "sim_bruteforce_topk")
    approx = _topk_pairs(spark, "sim_ivf_topk")
    assert exact, "brute-force baseline returned nothing"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall {recall:.2f} not above random baseline"


def test_ivf_assigns_each_query_once(spark):
    """Every query id surfaces with at most TOP_K ranked neighbors and
    rank values are 1..k without gaps (the window was per-query)."""
    from collections import defaultdict
    rows = engine.QUERIES["sim_ivf_topk"].fn(spark, SF_DIR).collect()
    by_q = defaultdict(list)
    for r in rows:
        by_q[r["query_id"]].append(r["rn"])
    assert by_q
    for q, rns in by_q.items():
        assert sorted(rns) == list(range(1, len(rns) + 1)), (q, sorted(rns))
