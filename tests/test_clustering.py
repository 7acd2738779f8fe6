"""Clustering gates: Lloyd k-means convergence/determinism (the
iterative half that no single SQL oracle can express — the assignment
pass itself is oracle-gated via cluster_kmeans_assign), and SemDeDup
structural invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.operators import clustering
from tests.conftest import SF_DIR


def test_kmeans_fit_converges_monotonically(spark):
    """Lloyd under the spherical (cosine) objective: the mean cosine to
    the assigned centroid must never decrease across iterations, and
    the final assignment must be total and exclusive."""
    emb = catalog.load(spark, SF_DIR, "embeddings")
    assigned, history = clustering.kmeans_fit(spark, emb, max_iter=4)
    assert len(history) == 4
    for prev, cur in zip(history, history[1:]):
        assert cur >= prev - 1e-9, f"objective regressed: {history}"
    # strict improvement over the seed assignment somewhere (the seeds
    # are corpus rows, not optimized centers — one update must help)
    assert history[-1] > history[0]
    n_total = emb.count()
    assert assigned.count() == n_total           # total
    assert assigned.select("vec_id").distinct().count() == n_total  # exclusive


def test_kmeans_fit_deterministic(spark):
    """Same data → bit-identical assignment (modulo-sampled seeds, no
    rand(); retried stages must agree at scale)."""
    emb = catalog.load(spark, SF_DIR, "embeddings")
    a1, h1 = clustering.kmeans_fit(spark, emb, max_iter=2)
    a2, h2 = clustering.kmeans_fit(spark, emb, max_iter=2)
    assert h1 == h2
    assert a1.subtract(a2).count() == 0 and a2.subtract(a1).count() == 0


def test_semdedup_removed_bounded_by_pairs(spark):
    """Structural invariants: removals never exceed pairs, removals
    never exceed members - 1 (at least one keeper per cell), and every
    cell in the report exists in the assignment."""
    rep = clustering.dedup_semdedup_cells(spark, SF_DIR).collect()
    assert len(rep) > 0
    assert any(r["n_pairs"] > 0 for r in rep), "threshold found no pairs"
    for r in rep:
        assert r["n_removed"] <= r["n_pairs"]
        assert r["n_removed"] <= r["n_members"] - 1


def test_semdedup_survives_degenerate_hot_cell(spark):
    """Adversarial corpus: EVERY embedding identical → one cell holds
    everything and every pair is a duplicate. The report must stay
    correct (C(n,2) pairs, n-1 removals, one keeper) rather than
    crash or mis-count — the bounded-cell assumption is a performance
    property, never a correctness precondition."""
    import pyspark.sql.functions as F

    n = 40
    base = [float(i % 7 - 3) for i in range(64)]
    df = spark.createDataFrame(
        [(i, base, i % 3) for i in range(n)],
        "vec_id bigint, embedding array<float>, label int")
    norm = clustering.normalized(df)
    assigned = clustering.assign_cells(norm, clustering.seed_centroids(norm))
    cells = assigned.groupBy("cell").count().collect()
    assert len(cells) == 1 and cells[0]["count"] == n

    # replicate the pair/removal arithmetic of dedup_semdedup_cells
    a = assigned.select("cell", F.col("vec_id").alias("va"))
    b = assigned.select("cell", F.col("vec_id").alias("vb"))
    pairs = (a.join(b, ["cell"]).filter(F.col("va") < F.col("vb")))
    assert pairs.count() == n * (n - 1) // 2
    removed = pairs.select("vb").distinct().count()
    assert removed == n - 1  # exactly one keeper
