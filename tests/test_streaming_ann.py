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


def test_serve_from_bucketed_catalog_index_is_shuffle_free(spark):
    """The serve builder must answer identically from the PERSISTED
    bucketed index (the production layout), and the index side of the
    per-batch plan must carry no Exchange — the pay-the-shuffle-once
    property the bucketed-probe family gates, now pinned on the
    serving path."""
    import hashlib

    from new_data_pipeline_spark.plans import physical
    from new_data_pipeline_spark.plans.layout_queries import (
        _sweep_stale_bucketed)

    n = _normalized(catalog.load(spark, SMOKE_DIR, "embeddings"))
    mod = ivf_mod(catalog.load(spark, SMOKE_DIR, "embeddings").count())
    res = IVF_CENT_RESIDUE % mod
    cents = (n.filter(F.col("vec_id") % mod == res)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("v").alias("cent_v"),
                     F.col("nrm").alias("cent_n")))
    assigned = _ivf_assign_and_probes(spark, SMOKE_DIR)[0]
    tbl = ("ndp_b_annsrv_"
           + hashlib.md5(SMOKE_DIR.encode()).hexdigest()[:8])
    _sweep_stale_bucketed(spark, keep={tbl}, prefixes=("ndp_b_annsrv_",))
    physical.write_bucketed(assigned, tbl, "cell")
    idx = spark.table(tbl)
    queries = (n.filter(F.col("vec_id") < N_QUERIES)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("v").alias("qv"), F.col("nrm").alias("qn")))

    served = ivf_serve_batch(queries, cents, idx)
    want = sorted(tuple(r) for r in
                  ivf_serve_batch(queries, cents, assigned).collect())
    assert sorted(tuple(r) for r in served.collect()) == want

    # pin the AT-SCALE plan shape: at smoke scale the compacted
    # bucketed index estimates under the auto-broadcast threshold and
    # Spark (correctly) broadcasts it — disable that to expose the
    # over-threshold plan the guarantee is about (the
    # test_physical.py bucketed-probe device)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        served = ivf_serve_batch(queries, cents, idx)
        served.collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        served.explain("formatted")
    plan = buf.getvalue()
    assert tbl in plan
    # The pay-the-shuffle-once guarantee is about the INDEX side: no
    # Exchange may sit between the bucketed index scan and its join
    # (the probe side and the rank window are free to exchange — r14's
    # scan-spread adds a repartition on the embeddings-derived probe
    # side, which made the former global exchange COUNT bound both
    # wrong and beside the point). JVM-tree walk, the
    # test_physical.py device.
    from tests.test_physical import _ancestors_of_scan
    for name in _ancestors_of_scan(served, tbl):
        assert "Exchange" not in name, \
            f"exchange above the bucketed index scan: {name}"
        if "Join" in name:
            break
    spark.catalog.clearCache()
