"""Johnson-Lindenstrauss random-projection ANN: project the 64-d
embedding corpus to RP_DIM dimensions with a FIXED ±1 sign matrix and
rank candidates by cosine in the projected space — the cheapest
dimensionality-reduction path to approximate similarity at 100 TB
(Achlioptas 2003: ±1 entries preserve pairwise distances within the JL
bound; no Gaussians needed, so the matrix is 1 bit per cell and the
projection is adds/subtracts).

Determinism: the sign matrix is a CONSTANT of the operator, derived
once in Python from md5("rp:<i>:<j>") and embedded as literals in BOTH
the Spark expressions and the oracle SQL — no engine-side randomness,
no engine-side hashing, bit-identical replays forever. Projection and
cosine use the fixed-order fold device (Spark aggregate(zip_with(...))
vs DuckDB ordered list comprehension + list_sum — both left-to-right),
the same parity device as sim_bruteforce_topk.

Scale: the projection is map-only (RP_DIM × IN_DIM multiply-adds per
row — at 100 TB this is the stage that turns a 256-byte vector into a
64-byte one BEFORE any shuffle or index build); the top-k skeleton is
the brute-force operator's (broadcast queries, per-query window), and
every index family in this repo (LSH/IVF/PQ) composes with projected
vectors unchanged. The output carries BOTH the projected and the exact
64-d cosine for each reported pair, so recall degradation is
observable in the result itself (and golden-gated in tests).

Reference analog: none — SURVEY.md §2.2 extension territory beside the
similarity family.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

IN_DIM = 64
RP_DIM = 16
RP_QUERIES = 8
RP_TOP_K = 10


def _sign(i: int, j: int) -> int:
    """±1 from the parity-neutral first hex nibble of md5("rp:i:j")."""
    return 1 if hashlib.md5(f"rp:{i}:{j}".encode()).hexdigest()[0] < "8" \
        else -1


SIGNS: list[list[int]] = [
    [_sign(i, j) for i in range(IN_DIM)] for j in range(RP_DIM)]


def _spark_proj_expr(j: int) -> str:
    arr = ", ".join(f"{s}.0D" for s in SIGNS[j])
    return (f"aggregate(zip_with(v, array({arr}), (x, s) -> x * s), "
            f"0D, (acc, x) -> acc + x)")


def _oracle_proj_expr(j: int) -> str:
    arr = ", ".join(str(s) for s in SIGNS[j])
    return (f"list_sum([v[i] * ([{arr}])[i] "
            f"for i in range(1, {IN_DIM} + 1)])")


_SQL_PROJ = ",\n             ".join(
    f"{_oracle_proj_expr(j)} AS p{j}" for j in range(RP_DIM))
_SQL_PLIST = "[" + ", ".join(f"p{j}" for j in range(RP_DIM)) + "]"


@register(
    "sim_random_projection_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ), p AS (
      SELECT vec_id, label, v,
             {_SQL_PROJ}
      FROM e
    ), pv AS (
      SELECT vec_id, label, v, {_SQL_PLIST} AS pvec FROM p
    ), n AS (
      SELECT vec_id, label, v, pvec,
             sqrt(list_sum([x * x for x in pvec])) AS pnrm,
             sqrt(list_sum([x * x for x in v])) AS nrm
      FROM pv
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS candidate_id, c.label,
             list_sum([q.pvec[i] * c.pvec[i]
                       for i in range(1, {RP_DIM} + 1)])
               / (q.pnrm * c.pnrm) AS pcos,
             list_sum([q.v[i] * c.v[i]
                       for i in range(1, {IN_DIM} + 1)])
               / (q.nrm * c.nrm) AS xcos
      FROM n q JOIN n c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {RP_QUERIES}
    ), ranked AS (
      SELECT query_id, candidate_id, label, pcos, xcos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY pcos DESC, candidate_id) AS rn
      FROM scored
    )
    SELECT query_id, candidate_id, label,
           round(pcos, 4) AS proj_cosine,
           round(xcos, 4) AS exact_cosine,
           CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {RP_TOP_K}
    """,
    tags=("similarity", "random-projection", "topk"),
)
def sim_random_projection_topk(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Approximate cosine top-{RP_TOP_K} in the {RP_DIM}-d JL-projected
    space, with the exact 64-d cosine reported beside it. See module
    docstring for the sign-matrix determinism and the map-only
    projection's role at scale."""
    from pyspark.sql.window import Window

    emb = (catalog.spread(  # r14: parallelize the md5 sign-matrix
                            # projection (guide §2.5)
            catalog.load(spark, sf_dir, "embeddings"))
           .select("vec_id", "label",
                   F.col("embedding").cast("array<double>").alias("v")))
    proj = emb.select(
        "vec_id", "label", "v",
        F.array(*[F.expr(_spark_proj_expr(j))
                  for j in range(RP_DIM)]).alias("pvec"))
    n = proj.select(
        "vec_id", "label", "v", "pvec",
        F.sqrt(F.expr("aggregate(pvec, 0D, (acc, x) -> acc + x * x)"))
         .alias("pnrm"),
        F.sqrt(F.expr("aggregate(v, 0D, (acc, x) -> acc + x * x)"))
         .alias("nrm"))
    q = (n.filter(F.col("vec_id") < RP_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("pvec").alias("qp"), F.col("pnrm").alias("qpn"),
                 F.col("v").alias("qv"), F.col("nrm").alias("qn")))
    pcos = (F.expr("aggregate(zip_with(qp, pvec, (x, y) -> x * y), "
                   "0D, (acc, x) -> acc + x)")
            / (F.col("qpn") * F.col("pnrm")))
    xcos = (F.expr("aggregate(zip_with(qv, v, (x, y) -> x * y), "
                   "0D, (acc, x) -> acc + x)")
            / (F.col("qn") * F.col("nrm")))
    scored = (n.crossJoin(F.broadcast(q))
              .filter(F.col("vec_id") != F.col("query_id"))
              .select("query_id",
                      F.col("vec_id").alias("candidate_id"), "label",
                      pcos.alias("pcos"), xcos.alias("xcos")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("pcos").desc(), "candidate_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= RP_TOP_K)
            .select("query_id", "candidate_id", "label",
                    F.round("pcos", 4).alias("proj_cosine"),
                    F.round("xcos", 4).alias("exact_cosine"),
                    F.col("rn").cast("bigint")))


def _rp_ivf_oracle() -> str:
    from new_data_pipeline_spark.operators.similarity import (
        IVF_C_TARGET, IVF_CENT_RESIDUE, IVF_NPROBE)
    return f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ), p AS (
      SELECT vec_id, label, v,
             {_SQL_PROJ}
      FROM e
    ), pv AS (
      SELECT vec_id, label, v, {_SQL_PLIST} AS pvec FROM p
    ), n AS (
      SELECT vec_id, label, v, pvec,
             sqrt(list_sum([x * x for x in pvec])) AS pnrm,
             sqrt(list_sum([x * x for x in v])) AS nrm
      FROM pv
    ), km AS (
      SELECT GREATEST(1, (COUNT(*) + {IVF_C_TARGET} - 1)
                         // {IVF_C_TARGET}) AS md
      FROM embeddings
    ), cents AS (
      SELECT vec_id AS cent_id, pvec AS cent_pv, pnrm AS cent_pn
      FROM n WHERE vec_id % (SELECT md FROM km)
                   = {IVF_CENT_RESIDUE} % (SELECT md FROM km)
    ), sc AS (
      SELECT n.vec_id, n.label, n.v, n.nrm, n.pvec, n.pnrm,
             cents.cent_id,
             list_sum([n.pvec[i] * cents.cent_pv[i]
                       for i in range(1, {RP_DIM} + 1)])
               / (n.pnrm * cents.cent_pn) AS ccos
      FROM n CROSS JOIN cents
    ), ra AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY ccos DESC, cent_id) AS arn
      FROM sc
    ), assigned AS (
      SELECT vec_id AS candidate_id, label, cent_id AS cell,
             pvec AS cpv, pnrm AS cpn, v AS cv, nrm AS cn
      FROM ra WHERE arn = 1
    ), probes AS (
      SELECT vec_id AS query_id, cent_id AS cell,
             pvec AS qp, pnrm AS qpn, v AS qv, nrm AS qn
      FROM ra WHERE vec_id < {RP_QUERIES} AND arn <= {IVF_NPROBE}
    ), scored AS (
      SELECT query_id, candidate_id, label,
             list_sum([qp[i] * cpv[i] for i in range(1, {RP_DIM} + 1)])
               / (qpn * cpn) AS pcos,
             list_sum([qv[i] * cv[i] for i in range(1, {IN_DIM} + 1)])
               / (qn * cn) AS xcos
      FROM probes JOIN assigned USING (cell)
      WHERE query_id <> candidate_id
    ), ranked AS (
      SELECT query_id, candidate_id, label, pcos, xcos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY pcos DESC, candidate_id) AS rn
      FROM scored
    )
    SELECT query_id, candidate_id, label,
           round(pcos, 4) AS proj_cosine,
           round(xcos, 4) AS exact_cosine,
           CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {RP_TOP_K}
    """


@register(
    "sim_rp_ivf_topk",
    oracle=_rp_ivf_oracle(),
    tags=("similarity", "random-projection", "ivf", "approx"),
)
def sim_rp_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL projection COMPOSED with the IVF index (VERDICT r10 #6: the
    module docstring's "every index family composes with projected
    vectors unchanged" made a gate instead of a claim): project 64→
    {RP_DIM} with the fixed ±1 sign matrix, build the IVF coarse
    quantizer ON the projected vectors (count-derived cell modulus,
    deterministic id-sampled centroids — similarity.py's exact build,
    just in the projected space), probe IVF_NPROBE cells per query,
    score candidates by PROJECTED cosine, and report the exact 64-d
    cosine beside it so the composed recall loss (projection × cell
    truncation) is observable in the result itself.

    Scale story: this is the 100 TB layout — the map-only projection
    shrinks every vector 4× BEFORE the index build, so centroid
    assignment (the O(N·C) scan), the cell shuffle, and the per-probe
    scoring all run on 16-d vectors; only the final exact-cosine
    report touches the 64-d originals, and only for the ≤ k·|queries|
    reported rows' candidates within probed cells. Same max_by
    map-side argmax as sim_ivf_topk (never a window over the N·C
    fan-out).
    """
    from pyspark.sql.window import Window

    from new_data_pipeline_spark.operators.similarity import (
        IVF_CENT_RESIDUE, IVF_NPROBE, ivf_mod)

    emb = (catalog.spread(  # r14: parallelize the md5 sign-matrix
                            # projection (guide §2.5)
            catalog.load(spark, sf_dir, "embeddings"))
           .select("vec_id", "label",
                   F.col("embedding").cast("array<double>").alias("v")))
    proj = emb.select(
        "vec_id", "label", "v",
        F.array(*[F.expr(_spark_proj_expr(j))
                  for j in range(RP_DIM)]).alias("pvec"))
    n = proj.select(
        "vec_id", "label", "v", "pvec",
        F.sqrt(F.expr("aggregate(pvec, 0D, (acc, x) -> acc + x * x)"))
         .alias("pnrm"),
        F.sqrt(F.expr("aggregate(v, 0D, (acc, x) -> acc + x * x)"))
         .alias("nrm"))
    mod = ivf_mod(catalog.load(spark, sf_dir, "embeddings").count())
    res = IVF_CENT_RESIDUE % mod
    cents = (n.filter(F.col("vec_id") % mod == res)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("pvec").alias("cent_pv"),
                     F.col("pnrm").alias("cent_pn")))
    ccos = (F.expr("aggregate(zip_with(pvec, cent_pv, (x, y) -> x * y), "
                   "0D, (acc, x) -> acc + x)")
            / (F.col("pnrm") * F.col("cent_pn")))
    scored_cells = n.join(F.broadcast(cents)).withColumn("ccos", ccos)
    assigned = (scored_cells.groupBy("vec_id")
                .agg(F.expr("max_by(struct(label, cent_id, pvec, pnrm, "
                            "v, nrm), struct(ccos, -cent_id))").alias("b"))
                .select(F.col("vec_id").alias("candidate_id"),
                        F.col("b.label").alias("label"),
                        F.col("b.cent_id").alias("cell"),
                        F.col("b.pvec").alias("cpv"),
                        F.col("b.pnrm").alias("cpn"),
                        F.col("b.v").alias("cv"),
                        F.col("b.nrm").alias("cn")))
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cent_id"))
    probes = (scored_cells.filter(F.col("vec_id") < RP_QUERIES)
              .withColumn("rn", F.row_number().over(w_assign))
              .filter(F.col("rn") <= IVF_NPROBE)
              .select(F.col("vec_id").alias("query_id"),
                      F.col("cent_id").alias("cell"),
                      F.col("pvec").alias("qp"),
                      F.col("pnrm").alias("qpn"),
                      F.col("v").alias("qv"), F.col("nrm").alias("qn")))
    pcos = (F.expr("aggregate(zip_with(qp, cpv, (x, y) -> x * y), "
                   "0D, (acc, x) -> acc + x)")
            / (F.col("qpn") * F.col("cpn")))
    xcos = (F.expr("aggregate(zip_with(qv, cv, (x, y) -> x * y), "
                   "0D, (acc, x) -> acc + x)")
            / (F.col("qn") * F.col("cn")))
    scored = (probes.join(assigned, on="cell")
              .filter(F.col("query_id") != F.col("candidate_id"))
              .select("query_id", "candidate_id", "label",
                      pcos.alias("pcos"), xcos.alias("xcos")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("pcos").desc(), "candidate_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= RP_TOP_K)
            .select("query_id", "candidate_id", "label",
                    F.round("pcos", 4).alias("proj_cosine"),
                    F.round("xcos", 4).alias("exact_cosine"),
                    F.col("rn").cast("bigint")))
