"""Prefix-filter set-similarity join gates: LOSSLESSNESS against a
Python brute-force all-pairs pass (the property the oracle gate also
proves, pinned here on a corpus small enough to enumerate), and
pruning effectiveness (the prefix join must generate strictly fewer
candidates than the naive any-shared-shingle join)."""

from __future__ import annotations

import itertools

import pytest

from new_data_pipeline_spark.operators.setsim_join import (
    TAU, join_set_similarity, prefix_candidates, shingle_sets)

from tests.conftest import SF_DIR, SMOKE_DIR


def _brute_force(sh_rows):
    out = {}
    for (da, ga), (db, gb) in itertools.combinations(
            sorted(sh_rows, key=lambda r: r[0]), 2):
        inter = len(set(ga) & set(gb))
        union = len(ga) + len(gb) - inter
        if union and inter / union >= TAU:
            out[(da, db)] = inter / union
    return out


def test_lossless_vs_bruteforce(spark):
    sh = shingle_sets(spark.read.parquet(f"{SMOKE_DIR}/documents.parquet"))
    rows = [(r["doc_id"], tuple(r["grams"])) for r in sh.collect()]
    expected = _brute_force(rows)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in join_set_similarity(spark, SMOKE_DIR).collect()}
    assert set(got) == set(expected)
    for pair, jac in expected.items():
        assert got[pair] == pytest.approx(jac, abs=2e-6)


def test_prefix_filter_prunes_candidates(spark):
    sh = shingle_sets(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    sh = sh.persist()
    filtered = prefix_candidates(sh).count()
    from pyspark.sql import functions as F
    tok = sh.select("doc_id", F.explode("grams").alias("g"))
    a = tok.select(F.col("doc_id").alias("doc_a"), "g")
    b = tok.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("gb"))
    naive = (a.join(b, (F.col("g") == F.col("gb"))
                    & (F.col("doc_a") < F.col("doc_b")))
             .select("doc_a", "doc_b").distinct().count())
    sh.unpersist()
    assert filtered < naive
    # and the filter keeps every true pair (subset of what verification
    # then confirms): true pairs == 25 planted near-dups at sf0.01
    assert filtered >= join_set_similarity(spark, SF_DIR).count()


def test_candidates_superset_of_results(spark):
    cand = {(r["doc_a"], r["doc_b"]) for r in prefix_candidates(
        shingle_sets(spark.read.parquet(
            f"{SF_DIR}/documents.parquet"))).collect()}
    res = {(r["doc_a"], r["doc_b"])
           for r in join_set_similarity(spark, SF_DIR).collect()}
    assert res <= cand
