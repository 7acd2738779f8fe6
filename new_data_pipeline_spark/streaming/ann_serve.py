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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.operators.similarity import (
    _IVF_ORACLE, IVF_NPROBE, N_QUERIES, TOP_K, _DOT,
    _ivf_index_parts, _normalized)
from new_data_pipeline_spark.registry import register


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


# Fixed micro-batch count for the driver gate: enough splits that the
# union really exercises per-batch serving, few enough that the gate
# stays cheap. The splits partition the query set exactly
# (query_id % _SERVE_BATCHES), so the union is the whole answer.
_SERVE_BATCHES = 4


@register(
    "sim_ivf_serve_batches",
    # THE serving contract: the union of per-micro-batch answers over a
    # static index equals the one-shot batch answer, so the oracle is
    # sim_ivf_topk's oracle verbatim — the driver certifies the serving
    # semantics, not just the unit suite (VERDICT r12 #6).
    oracle=_IVF_ORACLE,
    tags=("similarity", "ivf", "serving", "streaming-twin"),
)
def sim_ivf_serve_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The online serving path driven as a batch twin: the N_QUERIES
    query vectors are split into _SERVE_BATCHES fixed micro-batches
    (query_id mod 4 — what maxFilesPerTrigger does to a tailed
    directory, made deterministic), each batch is answered by
    ``ivf_serve_batch`` against the SAME static IVF index, and the
    answers are unioned. Because each query scores independently
    against a static index, the union must equal ``sim_ivf_topk``'s
    one-shot answer — tests/test_streaming_ann.py pins the same
    equivalence through a real foreachBatch stream; this gate lets the
    DRIVER certify it against DuckDB every round.

    Scale: the index (cents + assigned inverted lists) is built ONCE
    and persisted with an eager fill (cache-discipline rule: the four
    batch subtrees are non-identical consumers, so a cold cache would
    rebuild the index per batch — the incremental-LSH lesson); per
    batch the work is O(batch·C) centroid scoring + the cell-key
    equi-join, exactly the deployed request path.
    """
    n = _normalized(catalog.load(spark, sf_dir, "embeddings"))
    # centroid selection has exactly ONE definition (_ivf_index_parts;
    # ADVICE r13): the serving gate probes the same cents frame the
    # index was assigned from, and the second embeddings load + count
    # the inline rebuild paid is gone.
    cents, assigned, _probes = _ivf_index_parts(spark, sf_dir)
    cents = cents.persist()
    cents.count()  # eager fill before the 4-way fan-out
    assigned = assigned.persist()
    assigned.count()  # eager fill before the 4-way fan-out
    queries = (n.filter(F.col("vec_id") < N_QUERIES)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("v").alias("qv"), F.col("nrm").alias("qn")))
    out: DataFrame | None = None
    for b in range(_SERVE_BATCHES):
        batch = queries.filter(F.col("query_id") % _SERVE_BATCHES == b)
        ans = ivf_serve_batch(batch, cents, assigned)
        out = ans if out is None else out.unionAll(ans)
    return out
