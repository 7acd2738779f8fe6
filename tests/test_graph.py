"""PageRank gates: the distributed scaled-integer recurrence must be
BIT-equal to a pure-Python reference of the same recurrence (the
oracle proves Spark==DuckDB; this proves both equal the intended
algorithm), plus structural sanity on a synthetic chain."""

from __future__ import annotations

from pyspark.sql import functions as F

from new_data_pipeline_spark.operators.graph import (
    ITERATIONS, PROB_SCALE, RANK_SCALE, build_nation_trade_edges, pagerank)

from tests.conftest import SF_DIR


def _py_pagerank(edges, nodes, n, iterations=ITERATIONS):
    base = (15 * RANK_SCALE) // (100 * n)
    rank = {v: RANK_SCALE // n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0 for v in nodes}
        for s, d, p in edges:
            contrib[d] += (rank[s] * p) // PROB_SCALE
        rank = {v: base + (85 * contrib[v]) // 100 for v in nodes}
    return rank


def test_matches_python_reference_on_trade_graph(spark):
    nation = (spark.read.parquet(f"{SF_DIR}/nation.parquet")
              .select(F.col("n_nationkey").alias("node")))
    nodes = [r["node"] for r in nation.collect()]
    edges_df = build_nation_trade_edges(spark, SF_DIR)
    edges = [(r["src"], r["dst"], r["p"]) for r in edges_df.collect()]
    expected = _py_pagerank(edges, nodes, len(nodes))
    got = {r["node"]: r["rank"]
           for r in pagerank(nation, edges_df, len(nodes)).collect()}
    assert got == expected


def test_chain_mass_flows_downstream(spark):
    # a -> b -> c: rank(c) > rank(b) > rank(a) after damping settles
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node int")
    edges = spark.createDataFrame(
        [(0, 1, PROB_SCALE), (1, 2, PROB_SCALE)], "src int, dst int, p long")
    got = {r["node"]: r["rank"] for r in pagerank(nodes, edges, 3).collect()}
    assert got[2] > got[1] > got[0]
    # leaky variant: total mass never exceeds the initial scale
    assert sum(got.values()) <= RANK_SCALE


def test_rank_mass_bounds_on_real_graph(spark):
    nation = (spark.read.parquet(f"{SF_DIR}/nation.parquet")
              .select(F.col("n_nationkey").alias("node")))
    n = nation.count()
    edges = build_nation_trade_edges(spark, SF_DIR)
    ranks = pagerank(nation, edges, n)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    base = (15 * RANK_SCALE) // (100 * n)
    # every node holds at least the teleport mass; the total never
    # exceeds the initial mass (truncating division only loses mass)
    assert ranks.filter(F.col("rank") < base).count() == 0
    assert total <= RANK_SCALE
