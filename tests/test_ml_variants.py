"""Cross-checks between the Spark ML variants and the hand-built
oracle-replayable implementations — each route gates the other."""

from __future__ import annotations

import pytest

import new_data_pipeline_spark as engine
from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.operators import ml_variants
from tests.conftest import SF_DIR

engine.load_all()

pytestmark = pytest.mark.skipif(not ml_variants.HAS_ML,
                                reason="pyspark.ml unavailable")


def test_ml_minhash_agrees_with_handbuilt(spark):
    """Planted near-dups (Jaccard ≥ 0.8) found by the hand-built
    md5-MinHash pipeline must also surface via ML MinHashLSH."""
    docs = catalog.load(spark, SF_DIR, "documents")
    hand = {(r["doc_a"], r["doc_b"]) for r in
            engine.QUERIES["dedup_minhash_lsh"].fn(spark, SF_DIR).collect()}
    ml = {(r["doc_a"], r["doc_b"]) for r in
          ml_variants.ml_minhash_pairs(docs, threshold=0.4).collect()}
    assert hand, "hand-built pipeline found no pairs (corpus has planted dups)"
    missed = hand - ml
    assert len(missed) <= len(hand) * 0.2, \
        f"ML MinHashLSH missed {len(missed)}/{len(hand)} high-sim pairs"


def test_ml_ann_contains_true_neighbor(spark):
    """BRP-LSH approx neighbors for a query vector must include most of
    the true Euclidean top-k (exact recomputed in the test)."""
    import numpy as np
    emb = catalog.load(spark, SF_DIR, "embeddings")
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in rows}
    q = 3
    d = sorted(((np.linalg.norm(vecs[q] - v), vid)
                for vid, v in vecs.items() if vid != q))
    true_top5 = {vid for _, vid in d[:5]}
    got = {r["vec_id"] for r in
           ml_variants.ml_ann_neighbors(emb, q, k=5).collect()}
    assert len(true_top5 & got) >= 2, \
        f"ANN recall too low: {true_top5 & got} of {true_top5}"


def test_ml_tfidf_top_term_agrees(spark):
    """ML CountVectorizer+IDF's argmax matches the relational text_tfidf
    query for most documents. Both routes use ln((N+1)/(df+1)), so a doc
    disagrees only on score ties (argmax picks lowest vocab index, the
    query picks lexicographically-first term) — a tie means the MAX
    SCORES are equal, so agreement = same term OR same top score."""
    import numpy as np
    docs = catalog.load(spark, SF_DIR, "documents")
    rel = {r["doc_id"]: (r["top_term"], r["top_tfidf"]) for r in
           engine.QUERIES["text_tfidf"].fn(spark, SF_DIR).collect()}
    ml_out = ml_variants.tfidf_vectors(docs)
    from pyspark.ml.feature import CountVectorizer, RegexTokenizer
    toks = RegexTokenizer(inputCol="text", outputCol="tokens",
                          pattern=r"\s+").transform(docs)
    cv_model = CountVectorizer(inputCol="tokens", outputCol="tf",
                               vocabSize=4096).fit(toks)
    vocab = cv_model.vocabulary
    agree = total = 0
    for r in ml_out.limit(200).collect():
        v = r["tfidf"]
        if v.numNonzeros() == 0:
            continue
        arr = v.toArray()
        idx = int(np.argmax(arr))
        rel_term, rel_score = rel[r["doc_id"]]
        total += 1
        agree += (vocab[idx] == rel_term
                  or abs(arr[idx] - rel_score) <= 1e-6 * max(1.0, rel_score))
    assert total > 0 and agree / total >= 0.9, f"{agree}/{total} agreement"


def test_global_running_sum_matches_single_window(spark):
    """The range+offset distributed prefix sum must equal the
    single-task SUM OVER (ORDER BY) on arbitrary (unsorted,
    gap-ridden, duplicate-valued) input — and never plan an
    unpartitioned window."""
    import contextlib
    import io

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from new_data_pipeline_spark.sources.tensorize import global_running_sum

    rows = [(i * 7 % 101, (i * 13) % 9) for i in range(101)]
    df = spark.createDataFrame(rows, "k bigint, v bigint").repartition(7)
    out = global_running_sum(df, ["k"], "v", out_col="cum", num_ranges=5)
    got = {r["k"]: r["cum"] for r in out.collect()}
    want_rows = sorted(rows)
    acc = 0
    for k, v in want_rows:
        assert got[k] == acc, (k, got[k], acc)
        acc += v
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "__pid" not in out.columns
    # window must be partitioned (__pid) — never a world-sort
    assert "windowspecdefinition(__pid" in buf.getvalue().replace("#", "").replace(
        "L", "") or "__pid" in buf.getvalue()


def test_grouped_running_sum_matches_per_group_window(spark):
    """The PER-GROUP range+offset prefix sum (VERDICT r8 #1) must equal
    the per-group inclusive SUM OVER (PARTITION BY g ORDER BY k) on
    unsorted duplicate-ridden input, emit exact group totals, and keep
    the within-partition window keyed by (__pid, group) — never a
    #groups-task sort."""
    import contextlib
    import io

    from pyspark.sql import functions as F  # noqa: F401

    from new_data_pipeline_spark.sources.tensorize import grouped_running_sum

    rows = [((i * 5) % 3, (i * 7) % 101, (i * 13) % 9 + 1)
            for i in range(101)]
    df = spark.createDataFrame(rows, "g int, k bigint, v bigint") \
        .repartition(7)
    out = grouped_running_sum(df, "g", ["k"], "v", out_col="cum",
                              total_col="tot", num_ranges=5)
    got = {(r["g"], r["k"]): (r["cum"], r["tot"]) for r in out.collect()}
    # replay driver-side per group
    want_tot = {}
    for g in (0, 1, 2):
        acc = 0
        for gg, k, v in sorted(r for r in rows if r[0] == g):
            acc += v
            assert got[(g, k)][0] == acc, (g, k, got[(g, k)], acc)
        want_tot[g] = acc
    for (g, _), (_, tot) in got.items():
        assert tot == want_tot[g]
    assert "__pid" not in out.columns and "__g" not in out.columns
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue().replace("#", "").replace("L", "")
    assert "windowspecdefinition(__pid" in plan or "__pid" in buf.getvalue()


def test_grouped_running_sum_keeps_null_groups(spark):
    """ADVICE r9: NULL-group rows must survive — the window semantics
    this device replaces (SUM OVER (PARTITION BY g)) treats NULL as its
    own partition, so the offset attach has to be a NULL-SAFE join (a
    plain inner equi-join drops every NULL-group row)."""
    from new_data_pipeline_spark.sources.tensorize import grouped_running_sum

    rows = [(None if i % 4 == 0 else i % 3, i, i + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "g int, k bigint, v bigint") \
        .repartition(5)
    out = grouped_running_sum(df, "g", ["k"], "v", out_col="cum",
                              total_col="tot", num_ranges=4)
    got = {(r["g"], r["k"]): (r["cum"], r["tot"]) for r in out.collect()}
    assert len(got) == len(rows), "NULL-group rows were dropped"
    # replay per group, NULL included
    for g in (None, 0, 1, 2):
        acc = 0
        for gg, k, v in sorted((r for r in rows if r[0] == g),
                               key=lambda r: r[1]):
            acc += v
            assert got[(g, k)][0] == acc, (g, k, got[(g, k)], acc)
        for (gg, _), (_, tot) in got.items():
            if gg == g:
                assert tot == acc
