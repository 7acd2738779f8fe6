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


def test_count_triangles_exact_on_known_graph(spark):
    """_count_triangles must report the hand-countable census on a
    small fixed graph (two triangles sharing an edge + a pendant),
    independent of the n_edges metadata hint."""
    from new_data_pipeline_spark.operators.graph import _count_triangles
    # triangle (1,2,3), triangle (2,3,4) sharing edge (2,3), pendant 5
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)]
    e = spark.createDataFrame(edges, "u int, v int")
    deg = (e.select(F.col("u").alias("node"))
           .unionAll(e.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("d")))
    assert _count_triangles(e, deg, len(edges)).collect()[0][0] == 2
    # force the no-broadcast fallback: same answer
    assert _count_triangles(e, deg, 10**9).collect()[0][0] == 2


def test_doulion_estimate_scales_sampled_count(spark):
    """est_triangles must equal n_tri_sampled * (1/p)^3 and the sampled
    edge set must be the deterministic md5 subset of the full edges."""
    from new_data_pipeline_spark.operators.graph import (
        DOULION_INV_P, graph_triangle_doulion)
    import hashlib

    from new_data_pipeline_spark.operators.graph import _copurchase_edges
    row = graph_triangle_doulion(spark, SF_DIR).collect()[0]
    assert row["est_triangles"] == row["n_tri_sampled"] * DOULION_INV_P ** 3
    # replay the coin in pure python on the full edge list
    kept = 0
    for r in _copurchase_edges(spark, SF_DIR).collect():
        h = hashlib.md5(f"{r['u']}_{r['v']}".encode()).hexdigest()[:2]
        kept += h < "40"
    assert kept == row["n_edges_kept"]


def test_census_auto_dispatcher_pins_both_branches(spark):
    """VERDICT r9 #3: the size-gated dispatcher must run the EXACT
    census below the lineitem-count threshold and the DOULION estimate
    above it, each bit-equal to the standalone gate it dispatches to,
    and the registered default must replay the oracle's CASE branch
    (lineitem-count gate, not a graph stat — deciding must not cost a
    graph build)."""
    from new_data_pipeline_spark.operators.graph import (
        CENSUS_EXACT_LI_MAX, graph_triangle_census_auto,
        graph_triangle_doulion, graph_triangle_stats)
    from new_data_pipeline_spark import catalog

    n_li = catalog.load(spark, SF_DIR, "lineitem").count()

    # forced-exact branch
    row = graph_triangle_census_auto(spark, SF_DIR,
                                     exact_max=10**12).collect()[0]
    want_exact = graph_triangle_stats(spark, SF_DIR).collect()[0]
    assert row["method"] == "exact"
    assert row["n_lineitem"] == n_li
    assert row["est_triangles"] == want_exact["n_triangles"]

    # forced-doulion branch
    row = graph_triangle_census_auto(spark, SF_DIR,
                                     exact_max=0).collect()[0]
    want_est = graph_triangle_doulion(spark, SF_DIR).collect()[0]
    assert row["method"] == "doulion"
    assert row["est_triangles"] == want_est["est_triangles"]

    # the registered default takes the branch the oracle's CASE takes
    got = graph_triangle_census_auto(spark, SF_DIR).collect()[0]
    want_method = "exact" if n_li <= CENSUS_EXACT_LI_MAX else "doulion"
    assert got["method"] == want_method
    spark.catalog.clearCache()


def test_kcore_peeling_matches_driver_replay_and_converges(spark):
    """The fixed-round peel trace must (a) equal a driver-side replay
    of Matula-Beck peeling at the same count-derived k, (b) actually
    REMOVE something (a static trace would gate nothing), and (c)
    converge within the round budget (last two rounds equal) — the
    promise the fixed-round determinism device rests on."""
    from collections import Counter

    from new_data_pipeline_spark.operators.graph import (
        _copurchase_edges, graph_kcore_peeling)

    got = [(r["round"], r["n_nodes"], r["n_edges"])
           for r in graph_kcore_peeling(spark, SF_DIR).collect()]
    got.sort()
    edges = [(r["u"], r["v"])
             for r in _copurchase_edges(spark, SF_DIR).collect()]
    n_e, n_n = len(edges), len({x for e in edges for x in e})
    k = (14 * n_e + 8 * n_n - 1) // (8 * n_n)
    cur, want = edges, []
    for rnd in range(1, len(got) + 1):
        deg = Counter()
        for u, v in cur:
            deg[u] += 1
            deg[v] += 1
        keep = {n for n, d in deg.items() if d >= k}
        cur = [(u, v) for u, v in cur if u in keep and v in keep]
        want.append((rnd, len({x for e in cur for x in e}), len(cur)))
    assert got == want
    assert got[0][2] < n_e, "round 1 must peel something"
    assert got[-1] [1:] == got[-2][1:], \
        "peeling must converge within the round budget"
    spark.catalog.clearCache()


def test_kcore_auto_dispatcher_pins_both_branches(spark):
    """VERDICT r10 #2: the size-gated k-core dispatcher must replay the
    exact peel trace below the lineitem gate and the p=1/4 coin-sampled
    peel above it — each bit-equal to running _kcore_trace on the
    corresponding edge set — and the registered default must take the
    branch the oracle's COUNT(*) CASE takes."""
    from new_data_pipeline_spark import catalog
    from new_data_pipeline_spark.operators.graph import (
        KCORE_EXACT_LI_MAX, KCORE_SAMPLE_HEX_LIMIT, KCORE_SAMPLE_INV_P,
        _copurchase_edges, _copurchase_pairs, _kcore_trace,
        graph_kcore_auto, graph_kcore_peeling)

    def trace(df):
        return sorted((r["round"], r["n_nodes"], r["n_edges"])
                      for r in df.collect())

    # forced-exact branch == the standalone peeling gate
    got = graph_kcore_auto(spark, SF_DIR, exact_max=10**12)
    rows = got.collect()
    assert {r["method"] for r in rows} == {"exact"}
    assert all(r["est_edges"] == r["n_edges"] for r in rows)
    assert trace(got) == trace(graph_kcore_peeling(spark, SF_DIR))

    # forced-sampled branch == peeling the deterministic coin sample
    got = graph_kcore_auto(spark, SF_DIR, exact_max=0)
    rows = got.collect()
    assert {r["method"] for r in rows} == {"sampled"}
    assert all(r["est_edges"] == r["n_edges"] * KCORE_SAMPLE_INV_P
               for r in rows)
    coin = F.substring(
        F.md5(F.concat_ws("_", F.col("u").cast("string"),
                          F.col("v").cast("string")).cast("binary")), 1, 2)
    s = (_copurchase_pairs(spark, SF_DIR)
         .filter(coin < F.lit(KCORE_SAMPLE_HEX_LIMIT)).distinct())
    assert trace(got) == trace(_kcore_trace(s))
    # the sample must actually sparsify (the scale path's whole point)
    assert (s.count()
            < _copurchase_edges(spark, SF_DIR).count())

    # the registered default takes the oracle's CASE branch
    n_li = catalog.load(spark, SF_DIR, "lineitem").count()
    want = "exact" if n_li <= KCORE_EXACT_LI_MAX else "sampled"
    rows = graph_kcore_auto(spark, SF_DIR).collect()
    assert {r["method"] for r in rows} == {want}
    spark.catalog.clearCache()
