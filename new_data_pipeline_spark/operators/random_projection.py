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

    emb = (catalog.load(spark, sf_dir, "embeddings")
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
