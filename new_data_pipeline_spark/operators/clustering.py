"""Embedding clustering: distributed Lloyd k-means and SemDeDup-style
cluster-scoped semantic dedup.

The reference has no vector surface (its ImgData/VideoData protos stop
at tensor storage, reference serialize.py:60-94) — this is part of the
LLM-pipeline extension: clustering is the standard device for making
embedding-space curation tractable at corpus scale (SemDeDup, Abbas et
al. 2023: k-means cells first, pairwise similarity only WITHIN a cell —
the quadratic step is bounded by cell size instead of corpus size).

Scale design:
- Seed centroids are a deterministic modulo sample of the corpus
  (``vec_id % m == r`` with a count-derived modulus giving ~sqrt(N)
  cells) — no driver-side randomness, and
  the same rule is replayable in the DuckDB oracle, so even the
  "approximate" clustering queries are bit-checked end to end.
- Assignment is a broadcast of the (tiny) centroid table against one
  corpus scan — O(N·k) with no shuffle on the big side.
- The Lloyd update is a single groupBy over (cell, dim): map-side
  partial averages, k·d result rows. Centroids live on the driver
  between iterations (k·d doubles — the model, not the data; MLlib
  keeps its centers exactly the same way).
- SemDeDup's within-cell self-join is an equi-join on cell id; the
  quadratic term is Σ cell_size² — bounded by the clustering, and the
  production entry point can cap pathological cells with
  ``dedup.cap_hot_buckets`` (not applied in the gated query so the
  oracle replay stays exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

# Deterministic seed centroids: vec_id % m == 3 with a COUNT-DERIVED
# modulus m = max(1, N // floor(sqrt(N))), giving C ≈ sqrt(N) cells —
# sqrt is SemDeDup's balance point: assign cost N·C and within-cell
# pair cost Σ size² ≈ N²/C are both N^1.5 there, whereas the old fixed
# modulus (C ∝ N/29) made assign O(N²/29) — measured alpha=0.43 at 10x
# in the r6 scale audit, and the dominant term at 100x. floor(sqrt(·))
# runs through IEEE double sqrt on BOTH engines (Python math.sqrt ==
# DuckDB SQRT, correctly rounded), so the derived m is identical.
K_RESIDUE = 3  # base residue, taken mod the derived modulus


def cells_mod(n_rows: int) -> int:
    """max(1, N // floor(sqrt(N))) — exact twin of the oracle's
    ``GREATEST(1, cnt // GREATEST(1, CAST(FLOOR(SQRT(...)) AS BIGINT)))``."""
    import math
    root = max(1, int(math.floor(math.sqrt(float(n_rows)))))
    return max(1, n_rows // root)
SEMDEDUP_TAU = 0.3  # cosine threshold; testdata embeddings are
                    # near-isotropic (max pairwise cos ≈ 0.51), so 0.3
                    # yields a small, stable set of within-cell dup pairs

_ORACLE_ASSIGN = f"""
    e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, label, v, sqrt(list_sum([x * x for x in v])) AS nrm FROM e
    ), km AS (
      SELECT GREATEST(1, COUNT(*) // GREATEST(1,
               CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)))
               AS md
      FROM embeddings
    ), cents AS (
      SELECT vec_id AS cell, v AS cv, nrm AS cn
      FROM n WHERE vec_id % (SELECT md FROM km)
                   = {K_RESIDUE} % (SELECT md FROM km)
    ), sc AS (
      SELECT n.vec_id, n.label, n.v, n.nrm, cents.cell,
             list_sum([n.v[i] * cents.cv[i]
                       for i in range(1, len(n.v) + 1)])
               / (n.nrm * cents.cn) AS ccos
      FROM n CROSS JOIN cents
    ), assigned AS (
      SELECT vec_id, label, v, nrm, cell, ccos
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY ccos DESC, cell) AS arn
            FROM sc)
      WHERE arn = 1
    )"""


def normalized(emb: DataFrame) -> DataFrame:
    """float64 vectors + L2 norm (cast first: both engines upcast the
    float32 storage column before any arithmetic).

    r14: spread the single-file scan before the N·C assign dots
    serialize on one core (guide §2.5; catalog.spread docstring)."""
    return (catalog.spread(emb)
            .select("vec_id", "label",
                    F.col("embedding").cast("array<double>").alias("v"))
            .withColumn("nrm", F.sqrt(
                F.expr("aggregate(v, 0D, (acc, x) -> acc + x * x)"))))


def assign_cells(n: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid (max-cosine) assignment: broadcast the centroid
    table, score every (vector, centroid) pair, keep the argmax with a
    deterministic tiebreak on cell id.

    ``n`` columns: vec_id, label, v, nrm; ``cents``: cell, cv, cn.
    Output adds ``cell`` and ``ccos`` to every input row.

    The argmax is a ``max_by`` aggregate with lexicographic
    (ccos, -cell) ordering, NOT a row_number window: the aggregate
    partial-combines map-side, so the k-fanout collapses before the
    shuffle and only one row per vector crosses the exchange — a
    window would shuffle all N·k scored rows to sort them.
    """
    scored = (n.crossJoin(F.broadcast(cents))
              .withColumn("ccos", F.expr(
                  "aggregate(zip_with(v, cv, (x, y) -> x * y), "
                  "0D, (acc, x) -> acc + x)") / (F.col("nrm") * F.col("cn"))))
    return (scored.groupBy("vec_id")
            .agg(F.expr("max_by(struct(label, v, nrm, cell, ccos), "
                        "struct(ccos, -cell))").alias("b"))
            .select("vec_id", "b.label", "b.v", "b.nrm",
                    "b.cell", "b.ccos"))


def seed_centroids(n: DataFrame) -> DataFrame:
    """Deterministic modulo-sampled seed centroids (oracle-replayable):
    ~sqrt(N) cells via the count-derived modulus (module docstring).
    The count is a metadata-cheap action; both engines derive the same
    modulus from the same table."""
    mod = cells_mod(n.count())
    res = K_RESIDUE % mod
    return (n.filter(F.col("vec_id") % mod == res)
            .select(F.col("vec_id").alias("cell"),
                    F.col("v").alias("cv"), F.col("nrm").alias("cn")))


def kmeans_fit(spark: SparkSession, emb: DataFrame,
               max_iter: int = 5) -> tuple[DataFrame, list[float]]:
    """Distributed Lloyd k-means (cosine geometry): modulo-seeded
    centroids, then ``max_iter`` rounds of broadcast-assign +
    groupBy-mean update. Returns the final assignment DataFrame
    (vec_id, label, cell, ccos) and the per-iteration mean cosine to
    the assigned centroid (monotonically non-decreasing — Lloyd's
    convergence guarantee under the spherical objective; asserted in
    tests/test_clustering.py).

    The update step rebuilds each centroid as the element-wise mean of
    its members: posexplode to (cell, dim, x) rows → one partial-agg
    groupBy — k·d result rows, never a per-vector shuffle of the full
    arrays. Collecting k·d doubles to the driver per iteration is the
    model hand-off, not a data collect (same contract as MLlib KMeans).
    """
    n = normalized(emb).persist()
    cents = seed_centroids(n)
    history: list[float] = []
    assigned = None
    for _ in range(max_iter):
        assigned = assign_cells(n, cents)
        history.append(assigned.agg(F.avg("ccos")).first()[0])
        means = (assigned
                 .select("cell", F.posexplode("v").alias("dim", "x"))
                 .groupBy("cell", "dim").agg(F.avg("x").alias("m"))
                 .groupBy("cell")
                 .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("dim", "m"))),
                     lambda s: s["m"]).alias("cv"))
                 .withColumn("cn", F.sqrt(F.expr(
                     "aggregate(cv, 0D, (acc, x) -> acc + x * x)"))))
        cents = F.broadcast(means)
    n.unpersist()
    return assigned.select("vec_id", "label", "cell", "ccos"), history


@register(
    "cluster_kmeans_assign",
    oracle=f"""
    WITH {_ORACLE_ASSIGN}
    SELECT cell,
           COUNT(*) AS n_members,
           CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels,
           round(AVG(ccos), 4) AS avg_cos
    FROM assigned
    GROUP BY cell
    ORDER BY cell
    """,
    tags=("clustering", "kmeans"),
)
def cluster_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means assignment pass over the embeddings corpus with
    deterministic modulo-seeded centroids: per-cell membership count,
    label diversity, and mean cosine to the centroid.

    This is the one-pass gate of the k-means surface; the iterative
    loop is gated too — ``cluster_kmeans_lloyd`` below unrolls two
    full Lloyd rounds into one oracle (the pagerank/kcore unrolled-CTE
    device; round 11 retired this docstring's old claim that update
    rounds were not SQL-expressible), and ``kmeans_fit`` remains the
    open-round production loop, convergence-gated in unit tests.
    """
    n = normalized(catalog.load(spark, sf_dir, "embeddings"))
    assigned = assign_cells(n, seed_centroids(n))
    return (assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.countDistinct("label").cast("bigint").alias("n_labels"),
                 F.round(F.avg("ccos"), 4).alias("avg_cos"))
            .orderBy("cell"))


@register(
    "dedup_semdedup_cells",
    oracle=f"""
    WITH {_ORACLE_ASSIGN}, pairs AS (
      SELECT a.cell, a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)])
              / (a.nrm * b.nrm) > {SEMDEDUP_TAU}
    ), removed AS (
      SELECT DISTINCT cell, vec_b AS vec_id FROM pairs
    )
    SELECT m.cell, m.n_members,
           CAST(COALESCE(p.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed
    FROM (SELECT cell, COUNT(*) AS n_members FROM assigned GROUP BY cell) m
    LEFT JOIN (SELECT cell, COUNT(*) AS n_pairs FROM pairs GROUP BY cell) p
      USING (cell)
    LEFT JOIN (SELECT cell, COUNT(*) AS n_removed
               FROM removed GROUP BY cell) r
      USING (cell)
    ORDER BY m.cell
    """,
    tags=("dedup", "semdedup", "clustering"),
)
def dedup_semdedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means cells bound the pairwise
    search, then cosine > τ WITHIN a cell marks semantic duplicates;
    the lower vec_id of each pair is the keeper, every higher id seen
    in any pair is removed. Reported per cell: members, dup pairs,
    removals.

    Scale contrast with dedup_embedding_cosine (label-blocked brute
    force): cells come from the DATA, not a metadata column, so the
    method works on unlabeled corpora and the quadratic term is
    Σ cell² ≈ N²/k instead of N² — the whole point of SemDeDup.
    """
    n = normalized(catalog.load(spark, sf_dir, "embeddings"))
    assigned = (assign_cells(n, seed_centroids(n))
                .select("vec_id", "cell", "v", "nrm"))
    # Within-cell pairwise via applyInPandas, NOT a cell self-join: the
    # join would materialize Σ size² pair rows each dragging two 64-dim
    # arrays through the shuffle (measured 60.9 s at 10x with sqrt(N)
    # cells, alpha=1.59). Here the shuffle moves each vector ONCE
    # (grouped by cell) and the quadratic term runs as vectorized numpy
    # inside the task — the designated Spark shape for per-group dense
    # linear algebra. Arithmetic stays bit-identical to the oracle: the
    # Gram accumulation adds x_d*y_d in ascending dim order (the same
    # left fold DuckDB's list_sum replays), then one divide by na*nb.
    out_schema = ("cell bigint, n_members bigint, n_pairs bigint, "
                  "n_removed bigint")

    def _cell_pairs(pdf):
        import numpy as np
        import pandas as pd
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        m = len(pdf)
        V = np.stack([np.asarray(x, dtype=np.float64)
                      for x in pdf["v"]])
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)
        n_pairs = 0
        removed = np.zeros(m, dtype=bool)
        B = 2048  # column blocks bound peak memory to m x B doubles
        for j0 in range(0, m, B):
            j1 = min(j0 + B, m)
            g = np.zeros((m, j1 - j0))
            for d in range(V.shape[1]):  # ascending-dim left fold
                g += np.outer(V[:, d], V[j0:j1, d])
            cos = g / np.outer(nrm, nrm[j0:j1])
            tri = (np.arange(m)[:, None]
                   < np.arange(j0, j1)[None, :])  # vec_a < vec_b
            hit = (cos > SEMDEDUP_TAU) & tri
            n_pairs += int(hit.sum())
            removed[j0:j1] |= hit.any(axis=0)
        return pd.DataFrame({
            "cell": [int(pdf["cell"].iloc[0])], "n_members": [m],
            "n_pairs": [n_pairs], "n_removed": [int(removed.sum())]})

    # numbered repartition on the group key: AQE would coalesce this
    # small-byte shuffle onto ~2 partitions, serializing the per-cell
    # numpy work (the cost is CPU per cell, not bytes — same trap as
    # the CEP batch twin, streaming/cep.py)
    sc = assigned.sparkSession.sparkContext
    # r14: single-partition sort instead of orderBy — rangepartitioning
    # SAMPLES its child, and here the child is the pandas stage itself
    # (no shuffle boundary between them), so orderBy ran the whole
    # per-cell numpy pass TWICE (profiled as two 7.5 exec-s stage
    # twins). One row per cell comes out, so one sorted partition is
    # the right shape at any scale; the global order is identical.
    return (assigned.repartition(sc.defaultParallelism, "cell")
            .groupBy("cell").applyInPandas(_cell_pairs, out_schema)
            .repartition(1).sortWithinPartitions("cell"))


EMB_DIM = 64  # embeddings table dimension (driver-generated fixture)


def _oracle_lloyd() -> str:
    """Two unrolled Lloyd rounds as one oracle (the pagerank/kcore
    unrolled-CTE device applied to k-means — this upgrades the old
    'T update rounds are not expressible in one SQL oracle' claim):
    round 1 = the seeded assignment chain (_ORACLE_ASSIGN verbatim),
    then a decimal-exact centroid update and a second assignment."""
    return f"""
    WITH {_ORACLE_ASSIGN}, upd AS (
      SELECT cell, i AS dim,
             SUM(CAST(ROUND(v[i], 6) AS DECIMAL(12,6))) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM assigned, range(1, {EMB_DIM} + 1) AS r(i)
      GROUP BY 1, 2
    ), cents2 AS (
      SELECT cell,
             list(CAST(s AS DOUBLE) / n ORDER BY dim) AS cv
      FROM upd GROUP BY cell
    ), cents2n AS (
      SELECT cell, cv, sqrt(list_sum([x * x for x in cv])) AS cn
      FROM cents2
    ), sc2 AS (
      SELECT n.vec_id, cents2n.cell,
             list_sum([n.v[i] * cents2n.cv[i]
                       for i in range(1, len(n.v) + 1)])
               / (n.nrm * cents2n.cn) AS ccos
      FROM n CROSS JOIN cents2n
    ), assigned2 AS (
      SELECT vec_id, cell, ccos
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY ccos DESC, cell) AS arn
            FROM sc2)
      WHERE arn = 1
    ), moved AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_moved
      FROM assigned a JOIN assigned2 b USING (vec_id)
      WHERE a.cell <> b.cell
    )
    SELECT 1 AS round,
           CAST((SELECT COUNT(DISTINCT cell) FROM assigned) AS BIGINT)
             AS n_cells,
           CAST(0 AS BIGINT) AS n_moved,
           ROUND(CAST((SELECT SUM(CAST(ROUND(ccos, 6) AS DECIMAL(18,6)))
                       FROM assigned) AS DOUBLE)
                 / (SELECT COUNT(*) FROM assigned), 6) AS mean_cos
    UNION ALL
    SELECT 2,
           CAST((SELECT COUNT(DISTINCT cell) FROM assigned2) AS BIGINT),
           (SELECT n_moved FROM moved),
           ROUND(CAST((SELECT SUM(CAST(ROUND(ccos, 6) AS DECIMAL(18,6)))
                       FROM assigned2) AS DOUBLE)
                 / (SELECT COUNT(*) FROM assigned2), 6)
    """


@register(
    "cluster_kmeans_lloyd",
    oracle=_oracle_lloyd(),
    tags=("clustering", "kmeans", "iterative"),
)
def cluster_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO full Lloyd rounds, oracle-gated end to end — seeded
    assignment, decimal-exact centroid update, re-assignment — emitting
    the per-round trace (round, n_cells, n_moved, mean_cos):
    n_moved counts vectors whose cell changed between rounds (the
    convergence observable), mean_cos is the spherical Lloyd objective.

    Parity devices: the centroid update sums 6-dp-rounded components
    as DECIMAL(12,6) — order-independent — and divides once into a
    double, so round-2 centroids are bit-identical across engines;
    cosines then run on identical operands through the fixed-order
    fold; the per-round mean objective is a DECIMAL(18,6) sum of
    6-dp-rounded cosines (never a double AVG, whose reduce order
    would flip the hash).

    Scale: per round one broadcast assignment (O(N·C), C ≈ sqrt(N)
    count-derived) + one (cell, dim)-keyed partial-agg update of
    C·{EMB_DIM} rows; the n_moved join is vec_id-keyed. kmeans_fit
    remains the open-round production loop; this gate proves two full
    rounds of it bit-exactly.
    """
    emb = catalog.load(spark, sf_dir, "embeddings")
    n = normalized(emb).persist()
    n.count()  # consumed by both rounds' assignments
    a1 = assign_cells(n, seed_centroids(n)).persist()
    a1.count()  # consumed by update + n_moved + round-1 stats
    means = (a1.select("cell", F.posexplode("v").alias("pos", "x"))
             .select("cell", (F.col("pos") + 1).alias("dim"),
                     F.round("x", 6).cast("decimal(12,6)").alias("x6"))
             .groupBy("cell", "dim")
             .agg(F.sum("x6").alias("s"),
                  F.count(F.lit(1)).cast("bigint").alias("nn"))
             .groupBy("cell")
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct(
                     "dim", (F.col("s").cast("double") / F.col("nn"))
                     .alias("m")))),
                 lambda st: st["m"]).alias("cv"))
             .withColumn("cn", F.sqrt(F.expr(
                 "aggregate(cv, 0D, (acc, x) -> acc + x * x)"))))
    a2 = assign_cells(n, F.broadcast(means)).persist()
    a2.count()  # consumed by n_moved + round-2 stats

    def round_stats(a: DataFrame, rnd: int):
        return a.agg(
            F.lit(rnd).alias("round"),
            F.countDistinct("cell").cast("bigint").alias("n_cells"),
            F.round(F.sum(F.round("ccos", 6).cast("decimal(18,6)"))
                    .cast("double") / F.count(F.lit(1)), 6)
            .alias("mean_cos"))

    moved = (a1.select("vec_id", F.col("cell").alias("c1"))
             .join(a2.select("vec_id", F.col("cell").alias("c2")),
                   "vec_id")
             .agg(F.count_if(F.col("c1") != F.col("c2")).cast("bigint")
                  .alias("n_moved")))
    r1 = (round_stats(a1, 1)
          .select("round", "n_cells",
                  F.lit(0).cast("bigint").alias("n_moved"), "mean_cos"))
    r2 = (round_stats(a2, 2).crossJoin(moved)
          .select("round", "n_cells", "n_moved", "mean_cos"))
    return r1.unionAll(r2)
