"""Online ANN serving (streaming/ann_serve.py): query vectors arriving
over MULTIPLE micro-batches, each probing the same static IVF index via
foreachBatch, must union to exactly the batch answer of sim_ivf_topk —
the serving-path equivalence that makes the gated batch index usable
online."""

from __future__ import annotations

from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.operators.similarity import (
    IVF_CENT_RESIDUE, N_QUERIES, _ivf_assign_and_probes, _normalized,
    ivf_mod, sim_ivf_topk)
from new_data_pipeline_spark.streaming.ann_serve import ivf_serve_batch
from tests.conftest import SMOKE_DIR


def test_streamed_queries_union_to_batch_ivf_answer(spark, tmp_path):
    # --- static index (built once, batch-side: the gated build) ---
    n = _normalized(catalog.load(spark, SMOKE_DIR, "embeddings"))
    mod = ivf_mod(catalog.load(spark, SMOKE_DIR, "embeddings").count())
    res = IVF_CENT_RESIDUE % mod
    cents = (n.filter(F.col("vec_id") % mod == res)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("v").alias("cent_v"),
                     F.col("nrm").alias("cent_n")).persist())
    assigned = _ivf_assign_and_probes(spark, SMOKE_DIR)[0].persist()
    assigned.count()

    # --- query stream: the N_QUERIES vectors spread over 3 files,
    # tailed one file per trigger -> >=3 micro-batches ---
    qsrc = str(tmp_path / "queries")
    (n.filter(F.col("vec_id") < N_QUERIES)
     .select(F.col("vec_id").alias("query_id"),
             F.col("v").alias("qv"), F.col("nrm").alias("qn"))
     .repartition(3).write.mode("overwrite").parquet(qsrc))
    schema = spark.read.parquet(qsrc).schema

    got: list[tuple] = []
    batches: list[int] = []

    def serve(batch_df, epoch_id):
        rows = ivf_serve_batch(batch_df, cents, assigned).collect()
        if rows:
            batches.append(len(rows))
        got.extend((r["query_id"], r["candidate_id"], r["label"],
                    r["cosine"], r["rn"]) for r in rows)

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1).parquet(qsrc)
         .writeStream.foreachBatch(serve).start())
    q.processAllAvailable()
    q.stop()

    want = sorted((r["query_id"], r["candidate_id"], r["label"],
                   r["cosine"], r["rn"])
                  for r in sim_ivf_topk(spark, SMOKE_DIR).collect())
    assert sorted(got) == want
    # the serving path really ran incrementally, not as one batch
    assert len(batches) >= 2, batches
    spark.catalog.clearCache()
