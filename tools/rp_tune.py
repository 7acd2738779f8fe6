"""Measure rp_ivf recall across (RP_DIM, NPROBE) configs (VERDICT r12
#3): the gated eval exposed sim_rp_ivf_topk at ~5% recall@10 — this
sweep quantifies how much of the loss is the 16-d projection vs the
3-cell probe budget, against the same brute-force truth the eval uses.

Usage: python tools/rp_tune.py [sf_dir]
Prints one line per config: rp_dim, nprobe, recall_bp, plus the exact
IVF (no projection) reference row.
"""
from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from new_data_pipeline_spark import catalog  # noqa: E402
from new_data_pipeline_spark.operators.similarity import (  # noqa: E402
    IVF_CENT_RESIDUE, ivf_mod)

IN_DIM = 64
RP_QUERIES = 8
RP_TOP_K = 10


def _signs(rp_dim: int) -> list[list[int]]:
    # same construction as random_projection.SIGNS: rows j >= 16 extend
    # the fixed matrix, rows < 16 are bit-identical to the operator's
    def sign(i, j):
        return 1 if hashlib.md5(
            f"rp:{i}:{j}".encode()).hexdigest()[0] < "8" else -1
    return [[sign(i, j) for i in range(IN_DIM)] for j in range(rp_dim)]


def rp_ivf_variant(spark: SparkSession, sf_dir: str, rp_dim: int,
                   nprobe: int) -> DataFrame:
    """sim_rp_ivf_topk with parameterized projection dims and probe
    count (mirrors operators/random_projection.sim_rp_ivf_topk)."""
    signs = _signs(rp_dim)

    def proj_expr(j):
        arr = ", ".join(f"{s}.0D" for s in signs[j])
        return (f"aggregate(zip_with(v, array({arr}), (x, s) -> x * s),"
                f" 0D, (acc, x) -> acc + x)")

    emb = (catalog.load(spark, sf_dir, "embeddings")
           .select("vec_id", "label",
                   F.col("embedding").cast("array<double>").alias("v")))
    proj = emb.select(
        "vec_id", "label", "v",
        F.array(*[F.expr(proj_expr(j)) for j in range(rp_dim)])
        .alias("pvec"))
    n = proj.select(
        "vec_id", "label", "v", "pvec",
        F.sqrt(F.expr("aggregate(pvec, 0D, (acc, x) -> acc + x * x)"))
        .alias("pnrm"))
    mod = ivf_mod(catalog.load(spark, sf_dir, "embeddings").count())
    res = IVF_CENT_RESIDUE % mod
    cents = (n.filter(F.col("vec_id") % mod == res)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("pvec").alias("cent_pv"),
                     F.col("pnrm").alias("cent_pn")))
    ccos = (F.expr("aggregate(zip_with(pvec, cent_pv, (x, y) -> x * y),"
                   " 0D, (acc, x) -> acc + x)")
            / (F.col("pnrm") * F.col("cent_pn")))
    scored_cells = n.join(F.broadcast(cents)).withColumn("ccos", ccos)
    assigned = (scored_cells.groupBy("vec_id")
                .agg(F.expr("max_by(struct(pvec, pnrm, cent_id), "
                            "struct(ccos, -cent_id))").alias("b"))
                .select(F.col("vec_id").alias("candidate_id"),
                        F.col("b.cent_id").alias("cell"),
                        F.col("b.pvec").alias("cpv"),
                        F.col("b.pnrm").alias("cpn")))
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cent_id"))
    probes = (scored_cells.filter(F.col("vec_id") < RP_QUERIES)
              .withColumn("rn", F.row_number().over(w_assign))
              .filter(F.col("rn") <= nprobe)
              .select(F.col("vec_id").alias("query_id"),
                      F.col("cent_id").alias("cell"),
                      F.col("pvec").alias("qp"),
                      F.col("pnrm").alias("qpn")))
    pcos = (F.expr("aggregate(zip_with(qp, cpv, (x, y) -> x * y), "
                   "0D, (acc, x) -> acc + x)")
            / (F.col("qpn") * F.col("cpn")))
    scored = (probes.join(assigned, on="cell")
              .filter(F.col("query_id") != F.col("candidate_id"))
              .select("query_id", "candidate_id", pcos.alias("pcos")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("pcos").desc(), "candidate_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= RP_TOP_K)
            .select("query_id", "candidate_id"))


def main() -> None:
    from new_data_pipeline_spark.operators.similarity import (
        sim_bruteforce_topk)

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (SparkSession.builder.master("local[16]")
             .appName("rp-tune")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    truth = {(r["query_id"], r["candidate_id"])
             for r in sim_bruteforce_topk(spark, sf_dir)
             .select("query_id", "candidate_id").collect()
             if r["query_id"] < RP_QUERIES}
    print(f"truth pairs: {len(truth)}  ({sf_dir})")
    for rp_dim, nprobe in [(16, 3), (16, 8), (32, 3), (32, 8),
                           (48, 8), (32, 16)]:
        got = {(r["query_id"], r["candidate_id"])
               for r in rp_ivf_variant(spark, sf_dir, rp_dim,
                                       nprobe).collect()}
        tp = len(got & truth)
        print(f"rp_dim={rp_dim:3d} nprobe={nprobe:3d} "
              f"recall_bp={10000 * tp // len(truth):5d} "
              f"({tp}/{len(truth)})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
