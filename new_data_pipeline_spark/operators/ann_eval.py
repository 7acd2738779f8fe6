"""ANN recall evaluation (VERDICT r11 #7): the honest-recall gate for
the WHOLE approximate-similarity family, the `dedup_lsh_recall_eval`
pattern applied to vectors — every index family's final top-k is
compared against the brute-force exact top-k on the fixed query sample,
and recall@k lands IN the result (the observability number a production
ANN deployment tunes nprobe/bits/codebooks against).

Design:
- retrieved@k per family comes from the SAME registered callables the
  driver gates (`sim_lsh_topk`, `sim_ivf_topk`, `sim_pq_topk`,
  `sim_ivfpq_topk`, `sim_rp_ivf_topk`) — the eval measures the shipped
  paths, not re-implementations that could drift;
- the oracle is COMPOSED from those queries' registered oracle strings
  (each one a deterministic DuckDB replay — md5 hyperplanes,
  count-derived IVF modulus, fixed-seed codebooks), so the eval itself
  is hash-gated, not rows-only;
- recall is emitted in integer BASIS POINTS via integer division
  ((10000·tp) DIV n_truth on both engines) — no float division, no
  rounding edge, exact parity by construction.

Scale: the query sample is the fixed N_QUERIES id-prefix set, so each
family contributes O(sample · k) retrieved rows to the join against the
O(sample · k) truth set — the eval's own join is constant-size at any
corpus scale; its cost is the sum of the family pipelines it measures
(which are each individually scale-audited in BASELINE.md).

Reference analog: none — SURVEY.md §2.2 extension territory
(similarity-search observability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark.registry import QUERIES, register
from new_data_pipeline_spark.operators.pq import (sim_ivfpq_topk,
                                                  sim_pq_topk)
from new_data_pipeline_spark.operators.random_projection import (
    sim_rp_ivf_topk)
from new_data_pipeline_spark.operators.similarity import (
    sim_bruteforce_topk, sim_ivf_topk, sim_lsh_topk)

# family -> the registered in-memory callable (bucketed-probe twins are
# layout-identical by their own gates, so measuring one path suffices)
_FAMILIES = {
    "ivf": sim_ivf_topk,
    "ivfpq": sim_ivfpq_topk,
    "lsh": sim_lsh_topk,
    "pq": sim_pq_topk,
    "rp_ivf": sim_rp_ivf_topk,
}


def _eval_oracle() -> str:
    """Compose the registered family oracles into one recall query.
    Runs at module import inside load_all(), AFTER the family modules
    (import order pinned in new_data_pipeline_spark/__init__.py).

    The truth basis is PER FAMILY: truth pairs restricted to the query
    ids that family actually retrieves for (the rp family evaluates a
    smaller fixed query prefix than the others; charging it misses for
    queries it never ran would not measure its banding)."""
    truth = QUERIES["sim_bruteforce_topk"].oracle
    fams = ",\n    ".join(
        f"f_{fam} AS (SELECT query_id, candidate_id FROM "
        f"({QUERIES[_FAMILIES[fam].__name__].oracle}))"
        for fam in sorted(_FAMILIES))
    tagged = "\n      UNION ALL ".join(
        f"SELECT '{fam}' AS family, query_id, candidate_id FROM f_{fam}"
        for fam in sorted(_FAMILIES))
    return f"""
    WITH truth AS (
      SELECT query_id, candidate_id FROM ({truth})
    ), {fams},
    tagged AS (
      {tagged}
    ), fam_truth AS (
      SELECT fq.family, t.query_id, t.candidate_id
      FROM (SELECT DISTINCT family, query_id FROM tagged) fq
      JOIN truth t ON fq.query_id = t.query_id
    ), nt AS (
      SELECT family, CAST(COUNT(*) AS BIGINT) AS n_truth
      FROM fam_truth GROUP BY family
    ), nr AS (
      SELECT family, CAST(COUNT(*) AS BIGINT) AS n_retrieved
      FROM tagged GROUP BY family
    ), tps AS (
      SELECT g.family, CAST(COUNT(t.query_id) AS BIGINT) AS tp
      FROM tagged g
      JOIN truth t ON g.query_id = t.query_id
                  AND g.candidate_id = t.candidate_id
      GROUP BY g.family
    )
    SELECT nr.family, nr.n_retrieved,
           CAST(COALESCE(tps.tp, 0) AS BIGINT) AS tp,
           CAST(nt.n_truth - COALESCE(tps.tp, 0) AS BIGINT) AS fn,
           CAST((10000 * COALESCE(tps.tp, 0)) // nt.n_truth AS BIGINT)
             AS recall_bp
    FROM nr
    JOIN nt ON nr.family = nt.family
    LEFT JOIN tps ON nr.family = tps.family
    """


@register(
    "sim_ann_recall_eval",
    oracle=_eval_oracle(),
    tags=("similarity", "eval", "recall", "observability"),
)
def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of every ANN index family against the brute-force exact
    top-k, truth restricted per family to the queries it actually ran
    (see _eval_oracle): one row per family with the retrieved count,
    true positives, misses, and recall in basis points (integer
    arithmetic end to end — see module docstring)."""
    truth = (sim_bruteforce_topk(spark, sf_dir)
             .select("query_id", "candidate_id").persist())
    tagged: DataFrame | None = None
    for fam in sorted(_FAMILIES):
        part = (_FAMILIES[fam](spark, sf_dir)
                .select(F.lit(fam).alias("family"),
                        "query_id", "candidate_id"))
        tagged = part if tagged is None else tagged.unionAll(part)
    tagged = tagged.persist()
    # every frame below is O(|families| · queries · k): broadcast the
    # truth side of each tiny join
    fam_q = tagged.select("family", "query_id").distinct()
    nt = (fam_q.join(F.broadcast(truth), "query_id")
          .groupBy("family")
          .agg(F.count(F.lit(1)).cast("bigint").alias("n_truth")))
    nr = (tagged.groupBy("family")
          .agg(F.count(F.lit(1)).cast("bigint").alias("n_retrieved")))
    tp = (tagged.join(F.broadcast(truth), ["query_id", "candidate_id"])
          .groupBy("family")
          .agg(F.count(F.lit(1)).cast("bigint").alias("tp")))
    return (nr.join(nt, "family").join(tp, "family", "left")
            .select("family", "n_retrieved",
                    F.coalesce(F.col("tp"), F.lit(0)).cast("bigint")
                    .alias("tp"),
                    (F.col("n_truth")
                     - F.coalesce(F.col("tp"), F.lit(0))).cast("bigint")
                    .alias("fn"),
                    F.expr("CAST((10000 * COALESCE(tp, 0)) DIV n_truth "
                           "AS BIGINT)").alias("recall_bp")))
