"""Online ANN serving: score MICRO-BATCHES of query vectors against a
static IVF index — the Structured-Streaming face of the similarity
family (similarity.py builds and gates the index; this module is the
request path a deployed retrieval service runs).

Execution shape per micro-batch: the batch's query vectors broadcast-
join the C centroids (O(batch·C), no shuffle of anything corpus-sized),
take their IVF_NPROBE nearest cells, equi-join the cell-keyed index
(when the index is the bucketed catalog table of
sim_ivf_bucketed_probe, the index side scans shuffle-free — the
pay-the-shuffle-once layout), score exact cosine, rank top-k. Because
each query is scored independently against the SAME static index, the
union of micro-batch answers equals the batch answer — the equivalence
tests/test_streaming_ann.py pins.

Reference analog: none — SURVEY.md §2.2 extension territory
(similarity-search serving).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from new_data_pipeline_spark.operators.similarity import (IVF_NPROBE,
                                                          TOP_K, _DOT)


def ivf_serve_batch(queries: DataFrame, cents: DataFrame,
                    assigned: DataFrame, top_k: int = TOP_K,
                    nprobe: int = IVF_NPROBE) -> DataFrame:
    """Top-``top_k`` IVF answers for one micro-batch of queries.

    ``queries``: (query_id, qv array<double>, qn double) — the batch.
    ``cents``: (cent_id, cent_v, cent_n) — the coarse quantizer.
    ``assigned``: (candidate_id, label, cell, cv, cn) — the inverted
    lists (in-memory frame or the bucketed catalog table).
    Same ranking contract as sim_ivf_topk (cos desc, candidate_id asc).
    """
    cent_cos = (F.expr(
        "aggregate(zip_with(qv, cent_v, (x, y) -> x * y), 0D, "
        "(acc, x) -> acc + x)") / (F.col("qn") * F.col("cent_n")))
    scored_cells = (queries.join(F.broadcast(cents))
                    .withColumn("ccos", cent_cos))
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("cent_id"))
    probes = (scored_cells
              .withColumn("prn", F.row_number().over(w_probe))
              .filter(F.col("prn") <= nprobe)
              .select("query_id", F.col("cent_id").alias("cell"),
                      "qv", "qn"))
    scored = (probes.join(assigned, "cell")
              .filter(F.col("query_id") != F.col("candidate_id"))
              .withColumn("cos", F.expr(_DOT)
                          / (F.col("qn") * F.col("cn"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("candidate_id"))
    return (scored
            .withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= top_k)
            .select("query_id", "candidate_id", "label",
                    F.round("cos", 4).alias("cosine"), "rn"))
