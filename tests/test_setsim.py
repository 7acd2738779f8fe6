"""Set-similarity join gates: LOSSLESSNESS of the prefix-filter
strategy against a Python brute-force all-pairs pass, equality of the
two registered physical strategies, and pruning effectiveness (the
positional-filtered prefix join must generate strictly fewer
candidates than the naive any-shared-shingle join)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from new_data_pipeline_spark.operators.setsim_join import (
    TAU, join_set_similarity, join_set_similarity_prefix,
    prefix_candidates, shingle_sets)

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
    rows = [(r["doc_id"], tuple(r["hs"])) for r in sh.collect()]
    expected = _brute_force(rows)
    for fn in (join_set_similarity, join_set_similarity_prefix):
        got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
               for r in fn(spark, SMOKE_DIR).collect()}
        assert set(got) == set(expected), fn.__name__
        for pair, jac in expected.items():
            assert got[pair] == pytest.approx(jac, abs=2e-6), fn.__name__


def test_both_strategies_agree_at_sf001(spark):
    count_rows = {(r["doc_a"], r["doc_b"]): r["jaccard"]
                  for r in join_set_similarity(spark, SF_DIR).collect()}
    prefix_rows = {(r["doc_a"], r["doc_b"]): r["jaccard"]
                   for r in join_set_similarity_prefix(
                       spark, SF_DIR).collect()}
    assert count_rows == prefix_rows
    assert len(count_rows) > 0


def test_prefix_filter_prunes_candidates(spark):
    sh = shingle_sets(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    sh = sh.persist()
    filtered = prefix_candidates(sh).count()
    tok = sh.select("doc_id", F.explode("hs").alias("h"))
    a = tok.select(F.col("doc_id").alias("doc_a"), "h")
    b = tok.select(F.col("doc_id").alias("doc_b"), F.col("h").alias("hb"))
    naive = (a.join(b, (F.col("h") == F.col("hb"))
                    & (F.col("doc_a") < F.col("doc_b")))
             .select("doc_a", "doc_b").distinct().count())
    sh.unpersist()
    assert filtered < naive
    # and the filter keeps every true pair (subset of what verification
    # then confirms)
    assert filtered >= join_set_similarity_prefix(spark, SF_DIR).count()


def test_candidates_superset_of_results(spark):
    cand = {(r["doc_a"], r["doc_b"]) for r in prefix_candidates(
        shingle_sets(spark.read.parquet(
            f"{SF_DIR}/documents.parquet"))).collect()}
    res = {(r["doc_a"], r["doc_b"])
           for r in join_set_similarity_prefix(spark, SF_DIR).collect()}
    assert res <= cand
