"""Bigram-LM scorer gates: counts and the smoothed score verified
against a hand-computed corpus (the oracle proves Spark==DuckDB; this
proves both equal the intended add-0.5 bigram model)."""

from __future__ import annotations

import math

import pytest

from new_data_pipeline_spark.operators.lm_score import (
    score_documents, train_bigram_counts)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_counts_on_hand_corpus(spark):
    docs = _docs(spark, [(1, "a b a"), (2, "a b")])
    c2, c1, vocab = train_bigram_counts(docs)
    assert {(r["w1"], r["w2"]): r["c2"] for r in c2.collect()} == {
        ("a", "b"): 2, ("b", "a"): 1}
    assert {r["w1"]: r["c1"] for r in c1.collect()} == {"a": 2, "b": 1}
    assert vocab.collect()[0]["v"] == 2


def test_scores_on_hand_corpus(spark):
    # c2(a,b)=2 c2(b,a)=1 c1(a)=2 c1(b)=1 V=2  (add-0.5 smoothing)
    lp_ab = round(math.log((2 * 2 + 1) / (2 * 2 + 2)), 6)   # ln(5/6)
    lp_ba = round(math.log((2 * 1 + 1) / (2 * 1 + 2)), 6)   # ln(3/4)
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
           for r in score_documents(
               _docs(spark, [(1, "a b a"), (2, "a b")])).collect()}
    assert got[1][0] == 2 and got[2][0] == 1
    assert got[1][1] == pytest.approx(-(lp_ab + lp_ba) / 2, abs=2e-6)
    assert got[2][1] == pytest.approx(-lp_ab, abs=2e-6)


def test_rare_bigrams_score_worse(spark):
    # doc 3 is one unique bigram soup; docs 1-2 share all their bigrams.
    # The LM must find the outlier doc less likely per token.
    docs = _docs(spark, [(1, "x y x y x y x y"), (2, "x y x y x y"),
                         (3, "q r s t u v w z")])
    got = {r["doc_id"]: r["avg_nll"] for r in score_documents(docs).collect()}
    assert got[3] > got[1] and got[3] > got[2]


def test_single_token_docs_are_excluded(spark):
    docs = _docs(spark, [(1, "solo"), (2, "a pair")])
    got = {r["doc_id"] for r in score_documents(docs).collect()}
    assert got == {2}
