"""Iterative graph analytics: weighted PageRank over the trade graph.

The graph: one node per nation, one directed edge customer-nation →
supplier-nation per lineitem (edge weight = shipment count), built from
the same 4-table star the TPC-H suite joins. PageRank then ranks
nations by how much weighted trade flows INTO them from well-connected
partners — the canonical "iterative algorithm on a derived graph"
workload (the dedup family already covers connected components; this
adds the fixed-point / power-iteration class).

Execution shape, which is the point at 100 TB:
- the edge list is aggregated ONCE from the fact tables (the only
  scan-heavy stage) and persisted; each of the 5 power iterations then
  joins the node-sized rank table to the edge-sized transition table
  and partially aggregates contributions map-side — per-iteration cost
  is O(|E|) shuffle on the join key, never a rescan of lineitem;
- ranks live in a DataFrame keyed by node: at web scale both sides of
  the per-iteration join are hash-partitioned on the node key, so
  Catalyst reuses the same shuffle partitioning across iterations;
- no driver-side state: the one `.count()` fetches the node count
  (25), metadata-sized like tensorize's zipWithIndex count fetch.

Cross-engine parity device: ALL arithmetic is scaled-integer with
truncating division (Spark `DIV` == DuckDB `//` on positives), so five
unrolled iterations are BIT-exact against the DuckDB recursive
formulation — no float accumulates across rows or rounds. Ranks carry
scale 1e9; per-edge transition probabilities carry scale 1e6
(p = w*1e6 DIV w_out, bounded by 1e6, so rank*p ≤ 1e15 stays far
inside int64 at any data scale). The damping update is
rank' = (15·RS) DIV (100·N) + (85·contrib) DIV 100 — the "leaky"
PageRank variant (dangling-node mass is not redistributed), identical
on both engines by construction.

Reference analog: none — the reference has no graph surface; SURVEY.md
§2.2 capability-extension territory alongside connected components
(operators/dedup.py:254).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

RANK_SCALE = 10**9       # fixed-point scale of the rank vector
PROB_SCALE = 10**6       # fixed-point scale of edge transition probs
ITERATIONS = 5


def build_nation_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, p): customer-nation → supplier-nation transition
    table with fixed-point row-normalized weights."""
    li = catalog.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = catalog.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = catalog.load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = catalog.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    e0 = (li.join(orders, li.l_orderkey == orders.o_orderkey)
          .join(cust, orders.o_custkey == cust.c_custkey)
          .join(supp, li.l_suppkey == supp.s_suppkey)
          .groupBy(F.col("c_nationkey").alias("src"),
                   F.col("s_nationkey").alias("dst"))
          .agg(F.count(F.lit(1)).alias("w")))
    wout = e0.groupBy("src").agg(F.sum("w").alias("wout"))
    return (e0.join(wout, "src")
            .select("src", "dst",
                    F.expr(f"(w * {PROB_SCALE}) DIV wout").alias("p")))


DRIVER_PR_MAX_EDGES = 1_000_000  # below this the rank loop runs on the
# driver over the collected edge list — the _driver_union_find device:
# each distributed iteration costs 3 shuffle stages of pure scheduling
# overhead (measured: 36 jobs / 2.8 s wall for 3.5 s TOTAL executor
# time on the 25-node nation graph), while 1M (src, dst, p) rows are
# ~24 MB of longs on the driver. The arithmetic is the same scaled
# integer DIV on both paths, so the result is bit-identical and the
# shared SQL oracle replays either.


def pagerank(nodes: DataFrame, edges: DataFrame, n_nodes: int,
             iterations: int = ITERATIONS) -> DataFrame:
    """Scaled-integer damped PageRank; ``nodes`` has column ``node``,
    ``edges`` has (src, dst, p) with p at PROB_SCALE."""
    base = (15 * RANK_SCALE) // (100 * n_nodes)
    erows = edges.select("src", "dst", "p") \
        .limit(DRIVER_PR_MAX_EDGES + 1).collect()
    if len(erows) <= DRIVER_PR_MAX_EDGES:
        nrows = [r["node"] for r in nodes.select("node").collect()]
        rank = {n: RANK_SCALE // n_nodes for n in nrows}
        for _ in range(iterations):
            contrib: dict = {}
            for r in erows:
                rk = rank.get(r["src"])
                if rk is not None:  # inner-join semantics of the loop
                    contrib[r["dst"]] = contrib.get(r["dst"], 0) \
                        + (rk * r["p"]) // PROB_SCALE
            rank = {n: base + (85 * contrib.get(n, 0)) // 100
                    for n in nrows}
        id_type = nodes.schema["node"].dataType.simpleString()
        return nodes.sparkSession.createDataFrame(
            [(n, rank[n]) for n in nrows], f"node {id_type}, rank long")
    ranks = nodes.select(
        "node", F.lit(RANK_SCALE // n_nodes).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (edges.join(ranks, edges["src"] == ranks["node"])
                   .groupBy("dst")
                   .agg(F.sum(F.expr(f"(rank * p) DIV {PROB_SCALE}"))
                        .alias("contrib")))
        ranks = (nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
                 .select(nodes["node"],
                         (F.lit(base)
                          + F.expr("(85 * coalesce(contrib, 0L)) DIV 100"))
                         .cast("long").alias("rank")))
    return ranks


def _oracle() -> str:
    rs, ps = RANK_SCALE, PROB_SCALE
    its = [f"""
    r0 AS (
      SELECT n_nationkey AS node, {rs} // (SELECT n FROM nn) AS rank
      FROM nation
    )"""]
    for k in range(1, ITERATIONS + 1):
        its.append(f"""
    r{k} AS (
      SELECT r{k - 1}.node,
             {15 * rs} // (100 * (SELECT n FROM nn))
               + (85 * COALESCE(c.contrib, 0)) // 100 AS rank
      FROM r{k - 1}
      LEFT JOIN (
        SELECT e.dst AS node,
               CAST(SUM((r.rank * e.p) // {ps}) AS BIGINT) AS contrib
        FROM e JOIN r{k - 1} r ON e.src = r.node
        GROUP BY e.dst) c
      ON r{k - 1}.node = c.node
    )""")
    return f"""
    WITH e0 AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), wout AS (
      SELECT src, CAST(SUM(w) AS BIGINT) AS wout FROM e0 GROUP BY src
    ), e AS (
      SELECT e0.src, e0.dst, (e0.w * {ps}) // wout.wout AS p
      FROM e0 JOIN wout ON e0.src = wout.src
    ), nn AS (
      SELECT COUNT(*) AS n FROM nation
    ),{",".join(its)}
    SELECT r{ITERATIONS}.node AS nationkey, nat.n_name AS nation,
           CAST(r{ITERATIONS}.rank AS BIGINT) AS rank_scaled,
           ROUND(r{ITERATIONS}.rank / {float(rs)}, 6) AS rank_value
    FROM r{ITERATIONS} JOIN nation nat ON r{ITERATIONS}.node = nat.n_nationkey
    """


@register(
    "graph_pagerank",
    oracle=_oracle(),
    tags=("graph", "iterative", "pagerank"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped weighted PageRank (5 iterations) over the nation trade
    graph; scaled-integer arithmetic makes the fixed point bit-exact
    across engines."""
    nation = catalog.load(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    # edge aggregation is the one scan-heavy stage: persist so the five
    # iterations reuse it instead of re-joining the fact tables
    edges = build_nation_trade_edges(spark, sf_dir).persist()
    # driver metadata-sized (25 rows); `or 1` guards the degenerate
    # empty-catalog case — with zero nodes every frame is empty anyway,
    # the literal only keeps the integer formulas defined
    n_nodes = nation.count() or 1
    ranks = pagerank(nodes, edges, n_nodes)
    return (ranks.join(nation, ranks["node"] == nation["n_nationkey"])
            .select(F.col("n_nationkey").alias("nationkey"),
                    F.col("n_name").alias("nation"),
                    F.col("rank").cast("long").alias("rank_scaled"),
                    F.round(F.col("rank") / F.lit(float(RANK_SCALE)), 6)
                    .alias("rank_value")))


# Closing-probe strategy thresholds (measured, see _count_triangles):
# broadcast the oriented edge list only when the wedge stream it saves
# from shuffling is at least WEDGE_BCAST_RATIO× larger, and never past
# BCAST_EDGE_CAP edges (~1.2 GB at 24 B/row — the hard memory bound
# that keeps the |E|-linear broadcast from ever being attempted on a
# graph where it couldn't fit; past the cap the shuffle plan is the
# only correct one and DOULION sampling is the intended path anyway).
WEDGE_BCAST_RATIO = 16
BCAST_EDGE_CAP = 50_000_000
# Wedge-join sizing: the self-join's output is n_wedges_out rows — an
# intermediate the session's shuffle.partitions knows nothing about.
# Partition the join so each task handles ~WEDGE_ROWS_PER_PART wedge
# rows (never fewer partitions than the session default, capped so a
# pathological graph can't request millions of tiny tasks).
WEDGE_ROWS_PER_PART = 2_000_000
WEDGE_MAX_PARTS = 1024


def _count_triangles(e: DataFrame, deg: DataFrame,
                     n_edges: int) -> DataFrame:
    """1-row frame ``n_triangles`` for an undirected edge list ``e``
    (u < v, distinct) with degree table ``deg`` (node, d).

    Degree-ordered orientation (Cohen / Suri-Vassilvitskii): direct
    every edge from its lower-(degree, id) endpoint to the higher, then
    enumerate wedges only among OUT-neighbors — each triangle counted
    exactly once at its minimum-rank vertex, out-degrees bounded by
    O(sqrt(E)), wedge stream O(E^1.5) on ANY degree distribution.

    The closing probe picks broadcast vs shuffle from EXACT stats, not
    a fixed hint (round 9). The trade, measured at 10× scale: the
    broadcast's hash-table build is single-threaded and linear in |E|
    (3M-edge sampled graph: 13.9 s broadcast vs 6.9 s shuffle), while
    the shuffle moves the whole wedge stream (the 12M-edge census with
    a 33×-denser wedge stream: ~68 s broadcast vs ~98 s shuffle). So
    the decision variable is wedges-per-edge: broadcast only when
    W/E ≥ WEDGE_BCAST_RATIO — the wedge shuffle it avoids then repays
    the build — and never past BCAST_EDGE_CAP (memory; the r8 verdict's
    objection to the unconditional hint). Both stats are exact and
    cheap: n_edges arrives from the caller's cache-fill count, and W
    comes from one aggregate over the persisted oriented edge list —
    which this function persists anyway because o1/o2/closing are three
    NON-identical consumers of the orientation join (the repo's
    cold-cache-race rule; the cache is released to Spark's LRU).
    """
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ranked = e.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oe = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dt"))
    oe = oe.persist()
    # the wedge-count aggregate doubles as the eager cache fill: it is
    # a SINGLE consumer that materializes every partition before the
    # o1/o2/closing fan-out below, so the separate count() job the
    # cold-cache-race rule used to demand here was a redundant full
    # pass (r14: one fewer sequential job)
    n_wedges_out = int(
        oe.groupBy("s").agg(F.count(F.lit(1)).alias("od"))
        .agg(F.sum(F.expr("od * (od - 1) DIV 2")).alias("w"))
        .first()["w"] or 0)
    # size the wedge stage by its KNOWN output (the session default is
    # sized for the input tables, and a 10×-denser graph quadruples
    # the wedge stream: 32 partitions over 370M wedge rows spills).
    # The explicit repartition also pins the partition count against
    # AQE's byte-based coalescing, which cannot see the explode blowup.
    default_p = int(
        e.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    wp = min(WEDGE_MAX_PARTS,
             max(default_p, n_wedges_out // WEDGE_ROWS_PER_PART + 1))
    # Ordered out-wedges by groupBy + in-task combination explode (the
    # Suri–Vassilvitskii MR shape, the same device as
    # _copurchase_pairs): ONE shuffle of the oriented edge list instead
    # of the former o1/o2 self-join's two repartitions plus both
    # sort-merge legs (guide §2.4 "remove shuffles outright"; r14 A/B
    # at sf0.1 is wall-neutral — 3.75 vs 3.94 s medians, 18 vs 20 jobs
    # — and the shuffle-byte halving is the 100 TB claim). Sorting
    # neighbors by (dt, t) and pairing i < j reproduces the former
    # join's rank condition exactly; (dt, t) is unique within a group
    # because oe is distinct per (s, t). Per-group array size is the
    # out-degree, bounded O(sqrt E) by the degree-ordered orientation.
    nbrs = (oe.repartition(wp, "s").groupBy("s")
            .agg(F.sort_array(F.collect_list(F.struct("dt", "t")))
                 .alias("nbrs")))
    combos = F.expr(
        "flatten(transform(nbrs, (x, i) -> "
        "transform(slice(nbrs, i + 2, size(nbrs)), "
        "y -> struct(x.t AS t1, y.t AS t2))))")
    two_hop = (nbrs.select(F.explode(combos).alias("p"))
               .select(F.col("p.t1").alias("t1"),
                       F.col("p.t2").alias("t2")))
    closing = oe.select(F.col("s").alias("c1"), F.col("t").alias("c2"))
    if (n_edges <= BCAST_EDGE_CAP
            and n_wedges_out >= WEDGE_BCAST_RATIO * max(n_edges, 1)):
        closing = F.broadcast(closing)
    return (two_hop.join(closing, (F.col("t1") == F.col("c1"))
                         & (F.col("t2") == F.col("c2")))
            .agg(F.count(F.lit(1)).alias("n_triangles")))


def _copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw (u < v) part co-purchase pair stream, one row per unordered
    pair per order, NOT yet globally distinct.

    Generated by groupBy(order) → sorted distinct-part array →
    map-side combination explode, not a lineitem self-join: the
    self-join shuffles lineitem TWICE (both merge-join sides) and
    sorts each, while the groupBy shuffles it once (with a partial
    collect_set combine) and the k·(k-1)/2 blowup happens in the same
    task the group lands in — exactly where the join would have
    produced it anyway. Order baskets are small (TPC-H ≤ 7 items), so
    the per-group array is bounded; a pathological hot basket costs
    k²/2 rows in ONE task here versus k² rows through a shuffled join
    there, so the rewrite never loses. Array is sorted ascending, so
    struct(x, y) with x earlier in the array IS the u < v orientation
    (collect_set already dropped same-part repeats).
    """
    li = catalog.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    baskets = (li.groupBy("l_orderkey")
               .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps")))
    combos = F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))")
    return (baskets.select(F.explode(combos).alias("p"))
            .select(F.col("p.u").alias("u"), F.col("p.v").alias("v")))


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected (u < v) part co-purchase edges."""
    return _copurchase_pairs(spark, sf_dir).distinct()


@register(
    "graph_triangle_stats",
    oracle="""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
      GROUP BY node
    ), tri AS (
      SELECT COUNT(*) AS t
      FROM e e1
      JOIN e e2 ON e1.v = e2.u
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT SUM(d * (d - 1) // 2) FROM deg) AS BIGINT)
             AS n_wedges,
           CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles,
           ROUND(3.0 * (SELECT t FROM tri)
                 / (SELECT SUM(d * (d - 1) // 2) FROM deg), 6)
             AS clustering_coeff
    """,
    tags=("graph", "triangles", "clustering"),
)
def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph (parts bought in
    the same order share an edge): edge count, wedge count
    Σ C(deg, 2), triangle count via the DEGREE-ORDERED out-wedge join
    (each triangle counted exactly once, at its minimum-(degree, id)
    vertex), and the global clustering coefficient 3·triangles/wedges
    — four interlocking values in one row, so a miscount in any stage
    breaks the hash.

    Scale: the canonical distributed triangle count with the skew-proof
    orientation actually implemented (round 8): every edge points from
    its lower-(degree, id) endpoint to the higher, so out-degrees are
    bounded by O(sqrt(E)) and the enumerated wedge stream is O(E^1.5)
    on ANY degree distribution — a hub never anchors a quadratic
    fan-out. The triangle count is orientation-invariant, so the
    id-ordered SQL oracle replays the same number. The wedge aggregate
    is map-combinable; the closing probe is a plain equi-join (see
    _count_triangles for why it is never a forced broadcast).
    """
    e = _copurchase_edges(spark, sf_dir).persist()
    # Eagerly fill the edge cache BEFORE the plan fans out: deg, both
    # wedge sides, and the closing probe are NON-IDENTICAL consumers,
    # so nothing forces one computation of the expensive
    # lineitem-self-join+distinct subtree — a cold cache gets raced by
    # the independent stages (the incremental-LSH lesson, BASELINE.md
    # round 8). The count is O(1) driver metadata, no extra job.
    n_e = e.count()
    # r14: explode instead of union — ONE pass over the cached edge
    # list per degree build instead of two (the du/dv broadcast builds
    # each execute this subtree)
    deg = (e.select(F.explode(F.array("u", "v")).alias("node"))
           .groupBy("node").agg(F.count(F.lit(1)).alias("d"))
           .persist())
    wedges = deg.agg(F.sum(F.expr("d * (d - 1) DIV 2")).alias("n_wedges"))
    tri = _count_triangles(e, deg, n_e)
    edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (edges.crossJoin(wedges).crossJoin(tri)
            .select(F.col("n_edges").cast("bigint").alias("n_edges"),
                    F.col("n_wedges").cast("bigint").alias("n_wedges"),
                    F.col("n_triangles").cast("bigint")
                    .alias("n_triangles"),
                    F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"),
                            6).alias("clustering_coeff")))


# DOULION sampling probability: keep an edge iff the first two hex
# chars of md5(u || '_' || v) fall below 0x40 — p = 64/256 = 1/4.
# Deterministic in the edge, so the sample (and thus the estimate) is
# bit-reproducible and DuckDB replays it EXACTLY — the same device as
# every other sketch oracle in the repo (sampling.py:26).
DOULION_HEX_LIMIT = "40"
DOULION_INV_P = 4


@register(
    "graph_triangle_doulion",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), s AS (
      SELECT u, v FROM e
      WHERE substr(md5(CAST(u AS VARCHAR) || '_' || CAST(v AS VARCHAR)),
                   1, 2) < '{DOULION_HEX_LIMIT}'
    ), deg AS (  -- noqa: the Spark side samples BEFORE its distinct;
                 -- same set because the coin is a pure function of (u,v)
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT u AS node FROM s UNION ALL SELECT v AS node FROM s)
      GROUP BY node
    ), tri AS (
      SELECT COUNT(*) AS t
      FROM s e1
      JOIN s e2 ON e1.v = e2.u
      JOIN s e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_edges_kept,
           CAST((SELECT t FROM tri) AS BIGINT) AS n_tri_sampled,
           CAST((SELECT t FROM tri) * {DOULION_INV_P ** 3} AS BIGINT)
             AS est_triangles
    """,
    tags=("graph", "triangles", "sampling", "doulion"),
)
def graph_triangle_doulion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOULION triangle estimate (Tsourakakis et al., KDD'09) — the
    100 TB path the exact census' docstring promises: keep each edge
    with probability p = 1/4 (deterministic md5 coin, so both engines
    draw the SAME sample), count triangles on the sparsified graph with
    the degree-ordered orientation, scale by 1/p³ = 64. The expected
    wedge stream shrinks by p^1.5 ≈ 8× and the closing side by 4×;
    variance concentrates for any graph with Ω(1/p³) triangles. The
    exact census (graph_triangle_stats) stays registered as the
    verification baseline at test scales.

    The coin lands BEFORE the edge-dedup distinct: it is a pure
    function of (u, v), so filtering the raw co-purchase pair stream
    keeps exactly the pairs whose distinct edge would have been kept —
    and the distinct (the census' dominant shuffle) now moves p× the
    data. The full edge list is never materialized or counted; that is
    precisely the work the estimator exists to skip.
    """
    coin = F.substring(
        F.md5(F.concat_ws("_", F.col("u").cast("string"),
                          F.col("v").cast("string")).cast("binary")), 1, 2)
    s = (_copurchase_pairs(spark, sf_dir)
         .filter(coin < F.lit(DOULION_HEX_LIMIT))
         .distinct().persist())
    n_s = s.count()  # cache fill + O(1) result metadata
    # r14: explode instead of union — one cache pass per degree build
    deg = (s.select(F.explode(F.array("u", "v")).alias("node"))
           .groupBy("node").agg(F.count(F.lit(1)).alias("d")))
    tri = _count_triangles(s, deg, n_s)
    return tri.select(
        F.lit(n_s).cast("bigint").alias("n_edges_kept"),
        F.col("n_triangles").cast("bigint").alias("n_tri_sampled"),
        (F.col("n_triangles") * F.lit(DOULION_INV_P ** 3)).cast("bigint")
        .alias("est_triangles"))


# Stats gate for the census→DOULION dispatcher (VERDICT r9 #3): run the
# exact O(E^1.5) census only while the input stays below this many
# lineitem rows (a parquet-metadata count — FREE, no graph build needed
# to decide), and the 1/p³-scaled DOULION estimate above it. 250k puts
# sf0.01 (~60k rows, the oracle gate scale) on the exact branch and
# sf0.1+ (~600k rows, the bench/audit scales) on the sampled branch —
# the same adaptive move dedup's connected-components dispatcher makes
# at DRIVER_CC_MAX_EDGES, with the decision variable replayable by the
# oracle as a COUNT(*) scalar subquery.
CENSUS_EXACT_LI_MAX = 250_000


@register(
    "graph_triangle_census_auto",
    oracle=f"""
    WITH gate AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_li FROM lineitem
    ), e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), tri AS (
      SELECT COUNT(*) AS t
      FROM e e1
      JOIN e e2 ON e1.v = e2.u
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), s AS (
      SELECT u, v FROM e
      WHERE substr(md5(CAST(u AS VARCHAR) || '_' || CAST(v AS VARCHAR)),
                   1, 2) < '{DOULION_HEX_LIMIT}'
    ), tri_s AS (
      SELECT COUNT(*) AS t
      FROM s e1
      JOIN s e2 ON e1.v = e2.u
      JOIN s e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT CASE WHEN n_li <= {CENSUS_EXACT_LI_MAX}
                THEN 'exact' ELSE 'doulion' END AS method,
           n_li AS n_lineitem,
           CAST(CASE WHEN n_li <= {CENSUS_EXACT_LI_MAX}
                     THEN (SELECT t FROM tri)
                     ELSE (SELECT t FROM tri_s) * {DOULION_INV_P ** 3}
                END AS BIGINT) AS est_triangles
    FROM gate
    """,
    tags=("graph", "triangles", "sampling", "dispatcher"),
)
def graph_triangle_census_auto(spark: SparkSession, sf_dir: str,
                               exact_max: int = CENSUS_EXACT_LI_MAX
                               ) -> DataFrame:
    """The size-gated triangle-count DISPATCHER (VERDICT r9 #3): the
    exact census's 100 TB substitution made mechanical instead of a
    docstring convention. Below ``exact_max`` lineitem rows (parquet
    metadata — the gate costs one footer read, never a graph build)
    the dispatcher runs the exact degree-ordered census
    (``graph_triangle_stats``); above it, the DOULION p=1/4 sampled
    estimate (``graph_triangle_doulion``), whose deterministic md5
    coin lets the oracle replay the SAME CASE branch bit-exactly.
    Output is branch-stable: (method, n_lineitem, est_triangles).

    Both behaviors are pinned by tests (tests/test_llm_ops.py): with
    the threshold forced high the output equals the census's exact
    n_triangles; forced to 0 it equals the DOULION estimate. At the
    10× audit scale the gate picks DOULION — the scale path engages
    exactly where the exact census's wedge stream stops being worth
    its wall-clock.
    """
    n_li = catalog.load(spark, sf_dir, "lineitem").count()
    if n_li <= exact_max:
        return graph_triangle_stats(spark, sf_dir).select(
            F.lit("exact").alias("method"),
            F.lit(n_li).cast("bigint").alias("n_lineitem"),
            F.col("n_triangles").cast("bigint").alias("est_triangles"))
    return graph_triangle_doulion(spark, sf_dir).select(
        F.lit("doulion").alias("method"),
        F.lit(n_li).cast("bigint").alias("n_lineitem"),
        F.col("est_triangles"))


# k-core peeling parameters: remove nodes of degree < k, drop edges
# touching them, repeat for KCORE_ROUNDS rounds. Fixed-round peeling
# (not iterate-to-fixpoint) is the same determinism device as
# pagerank's ITERATIONS=5: both engines replay the exact same number
# of rounds, so the oracle is a chain of generated CTEs. k is COUNT-
# DERIVED — k = ⌈7/8 · initial average degree⌉ = (14·E + 8·N − 1)
# DIV (8·N) — because any fixed k degenerates as scale moves (k=4
# peeled NOTHING at sf0.01 where the co-purchase average degree is
# ~115, and a fixed 116 would vaporize a sparser graph). The 7/8
# fraction is measured, not aesthetic: at exactly avg the homogeneous
# co-purchase graph collapses in one round (115729 → 1 edge), while
# 7/8·avg peels through THREE shrinking rounds at both sf0.01
# (115729 → 71875 → 14250 → 0) and sf0.1 (1.196M → 743k → 158k → 0) —
# real multi-round peeling for the gate to verify. The integer
# ceil-division replays exactly as the oracle's scalar subquery (the
# codebook_mod device, operators/pq.py:59). Each round is one map-combinable
# degree aggregate plus two semi-joins — O(rounds · E), rounds
# bounding the tail the way MAX_CC_ITERS bounds label propagation.
KCORE_ROUNDS = 6


_KCORE_BASE_EDGES = """
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


def _kcore_chain(pfx: str, edge_sql: str) -> list[str]:
    """The per-round peeling CTE chain ``{pfx}e0 .. {pfx}e{ROUNDS}``
    over the edge set defined by ``edge_sql``, with the count-derived k
    in ``{pfx}kk``. Every CTE is MATERIALIZED: each round references
    the previous round ~5 times, and DuckDB inlines plain CTEs per
    reference — the un-materialized chain re-evaluated the lineitem
    self-join exponentially and died on file handles (the SQL twin of
    the Spark-side localCheckpoint-vs-persist lesson). Prefixed so the
    dispatcher oracle can carry the exact and sampled chains in one
    statement."""
    ctes = [f"""{pfx}e0 AS MATERIALIZED ({edge_sql})""",
            f"""{pfx}kk AS MATERIALIZED (
      SELECT (14 * (SELECT COUNT(*) FROM {pfx}e0)
              + 8 * (SELECT COUNT(DISTINCT node) FROM (
                   SELECT u AS node FROM {pfx}e0
                   UNION ALL SELECT v AS node FROM {pfx}e0)) - 1)
             // (8 * (SELECT COUNT(DISTINCT node) FROM (
                   SELECT u AS node FROM {pfx}e0
                   UNION ALL SELECT v AS node FROM {pfx}e0))) AS k
    )"""]
    for r in range(1, KCORE_ROUNDS + 1):
        p = r - 1
        ctes.append(f"""{pfx}d{p} AS MATERIALIZED (
      SELECT node, COUNT(*) AS d
      FROM (SELECT u AS node FROM {pfx}e{p}
            UNION ALL SELECT v AS node FROM {pfx}e{p})
      GROUP BY node
    )""")
        ctes.append(f"""{pfx}k{p} AS MATERIALIZED (
      SELECT node FROM {pfx}d{p} WHERE d >= (SELECT k FROM {pfx}kk)
    )""")
        ctes.append(f"""{pfx}e{r} AS MATERIALIZED (
      SELECT u, v FROM {pfx}e{p}
      WHERE u IN (SELECT node FROM {pfx}k{p})
        AND v IN (SELECT node FROM {pfx}k{p})
    )""")
    return ctes


def _kcore_oracle() -> str:
    selects = [f"""
    SELECT {r} AS round,
           CAST((SELECT COUNT(DISTINCT node) FROM (
                 SELECT u AS node FROM e{r}
                 UNION ALL SELECT v AS node FROM e{r})) AS BIGINT)
             AS n_nodes,
           CAST((SELECT COUNT(*) FROM e{r}) AS BIGINT) AS n_edges"""
               for r in range(1, KCORE_ROUNDS + 1)]
    return "WITH " + ",\n    ".join(_kcore_chain("", _KCORE_BASE_EDGES)) \
        + "\n" + "\n    UNION ALL".join(selects)


@register(
    "graph_kcore_peeling",
    oracle=_kcore_oracle(),
    tags=("graph", "kcore", "iterative"),
)
def graph_kcore_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling of the part co-purchase graph (Matula & Beck's
    peeling algorithm, bounded rounds): each round removes every node
    whose CURRENT degree is below KCORE_K and all edges touching one,
    emitting (round, n_nodes, n_edges) per round — the per-round
    shrink trace a curation pipeline uses to pick a cohesion threshold
    (the k-core is the classic "dense interaction subgraph" extractor).

    Scale: per round one map-combinable degree aggregate + two
    LEFT SEMI joins against the (small, shrinking) kept-node set; the
    per-round edge frame is ``localCheckpoint(eager=True)``-ed, NOT
    merely persisted — each round references the previous frame ~5
    times (two degree branches, two semi-join probes, the count), so
    a persist-only loop keeps execution linear but grows the LOGICAL
    plan ~5^rounds (measured: the 6-round plan string hit Catalyst's
    2 GB cap); the checkpoint truncates lineage so analysis stays
    O(rounds). Checkpoint blocks are session-scoped — the audit
    harness GCs per query (tools/scale_audit.py), the same discipline
    every iterative operator here follows. Convergence within
    KCORE_ROUNDS on the fixture is pinned by a test; the fixed round
    budget is what makes the trace oracle-replayable.
    """
    return _kcore_trace(_copurchase_edges(spark, sf_dir))


# Keep-set broadcast gate for the exact peel: the kept-node frame is
# bounded by |V| (≤ |part| for the co-purchase graph), so at the exact
# path's ≤250k-lineitem gate it is a few thousand longs — broadcasting
# it turns BOTH per-round semi-joins into broadcast joins and the round
# moves only the |V|-sized node frame (the LPA lesson, VERDICT r11 #4).
# The sampled path can reach this code at any scale, so the broadcast
# is size-gated on the measured node count, not assumed.
KCORE_BROADCAST_NODES_MAX = 5_000_000


def _kcore_trace(edges: DataFrame) -> DataFrame:
    """KCORE_ROUNDS Matula-Beck peeling sweeps over an undirected
    (u < v, distinct) edge frame at the count-derived k; returns the
    (round, n_nodes, n_edges) shrink trace. Factored out so the
    size-gated dispatcher can peel the SAME way on either the full or
    the coin-sampled edge set (the census_auto pattern).

    Round-12 rewrite of the round body (VERDICT r11 #4 — the exact
    trace paid full-E localCheckpoints plus TWO degree-shaped shuffles
    per round):
    - ONE degree aggregate per round: the (node, d) frame computed
      after peel r both reports round r's n_nodes (its row count) and
      drives round r+1's keep-set — the old code aggregated degrees
      once for the keep and AGAIN (countDistinct over the endpoint
      union) for the trace row;
    - the keep-set is broadcast when |V| is measured small (see
      KCORE_BROADCAST_NODES_MAX), so neither semi-join shuffles the
      edge frame;
    - EARLY EXIT at the fixpoint: once a round removes nothing (or the
      frame empties) every later round replays the same counts, so
      they are emitted as literals instead of re-running empty joins —
      the trace semantics (fixed KCORE_ROUNDS rows) are unchanged and
      the oracle still replays bit-equal.
    The per-round counts are O(1) driver-side results of distributed
    aggregates (the bounded-collect budget every iterative operator
    here runs on); the final trace is a literal 6-row frame."""
    spark = edges.sparkSession
    cur = edges.localCheckpoint(eager=True)
    n_e = cur.count()

    def degree(df: DataFrame) -> DataFrame:
        return (df.select(F.col("u").alias("node"))
                .unionAll(df.select(F.col("v").alias("node")))
                .groupBy("node").agg(F.count(F.lit(1)).alias("d")))

    deg = degree(cur).persist()
    n_n = deg.count() or 1
    k = (14 * n_e + 8 * n_n - 1) // (8 * n_n)  # ceil(7/8·avg), see above
    trace: list[tuple[int, int, int]] = []
    stable = n_e == 0
    for r in range(1, KCORE_ROUNDS + 1):
        if stable:
            trace.append((r, 0 if n_e == 0 else n_n, n_e))
            continue
        keep = deg.filter(F.col("d") >= k).select("node")
        if n_n <= KCORE_BROADCAST_NODES_MAX:
            keep = F.broadcast(keep)
        nxt = (cur.join(keep.withColumnRenamed("node", "u"), "u",
                        "left_semi")
               .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
               .select("u", "v").localCheckpoint(eager=True))
        n_e_next = nxt.count()
        deg.unpersist()
        deg = degree(nxt).persist()
        n_n_next = deg.count()
        trace.append((r, n_n_next, n_e_next))
        # nothing removed -> degrees are unchanged forever; empty ->
        # trivially stable
        stable = n_e_next in (n_e, 0)
        cur, n_e, n_n = nxt, n_e_next, n_n_next
    deg.unpersist()
    return spark.createDataFrame(
        trace, "round int, n_nodes bigint, n_edges bigint")


# Size gate for the kcore dispatcher (VERDICT r10 #2): exact peeling is
# O(rounds·E) with alpha 0.88 at 10× — by-design linear, but at 100×
# the wall is ~100× with nothing bounding it. Above the gate the
# dispatcher peels the p=1/4 md5-coin edge sample instead: degrees
# scale by p in expectation, the count-derived k = ⌈7/8·avg⌉ rescales
# with them automatically (it is computed ON the sampled graph), so the
# sampled trace tracks the full trace's shrink shape at one quarter the
# per-round join volume — and, crucially, the sample is drawn BEFORE
# the edge-dedup distinct, so the census' dominant shuffle also moves
# p× the data. est_edges = n_edges/p is the unbiased per-round edge
# estimate (node counts are reported raw: sampled node survival has no
# clean unbiased scaler, the same honesty rule as DOULION's
# n_tri_sampled). Same 250k-lineitem gate as the census: sf0.01 exact,
# sf0.1+ sampled, COUNT(*)-replayable by the oracle.
KCORE_EXACT_LI_MAX = 250_000
KCORE_SAMPLE_HEX_LIMIT = DOULION_HEX_LIMIT  # p = 1/4, the same coin
KCORE_SAMPLE_INV_P = DOULION_INV_P


def _kcore_auto_oracle() -> str:
    gate = f"(SELECT n_li FROM gate) <= {KCORE_EXACT_LI_MAX}"
    sampled_edges = f"""
      SELECT u, v FROM e0
      WHERE substr(md5(CAST(u AS VARCHAR) || '_' || CAST(v AS VARCHAR)),
                   1, 2) < '{KCORE_SAMPLE_HEX_LIMIT}'
"""
    ctes = ["""gate AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_li FROM lineitem
    )"""]
    ctes += _kcore_chain("", _KCORE_BASE_EDGES)
    ctes += _kcore_chain("s", sampled_edges)
    selects = []
    for r in range(1, KCORE_ROUNDS + 1):
        nodes = {p: f"""(SELECT COUNT(DISTINCT node) FROM (
                 SELECT u AS node FROM {p}e{r}
                 UNION ALL SELECT v AS node FROM {p}e{r}))"""
                 for p in ("", "s")}
        edges = {p: f"(SELECT COUNT(*) FROM {p}e{r})" for p in ("", "s")}
        selects.append(f"""
    SELECT CASE WHEN {gate} THEN 'exact' ELSE 'sampled' END AS method,
           {r} AS round,
           CAST(CASE WHEN {gate} THEN {nodes[""]}
                     ELSE {nodes["s"]} END AS BIGINT) AS n_nodes,
           CAST(CASE WHEN {gate} THEN {edges[""]}
                     ELSE {edges["s"]} END AS BIGINT) AS n_edges,
           CAST(CASE WHEN {gate} THEN {edges[""]}
                     ELSE {edges["s"]} * {KCORE_SAMPLE_INV_P}
                END AS BIGINT) AS est_edges""")
    return "WITH " + ",\n    ".join(ctes) + "\n" + \
        "\n    UNION ALL".join(selects)


@register(
    "graph_kcore_auto",
    oracle=_kcore_auto_oracle(),
    tags=("graph", "kcore", "sampling", "dispatcher"),
)
def graph_kcore_auto(spark: SparkSession, sf_dir: str,
                     exact_max: int = KCORE_EXACT_LI_MAX) -> DataFrame:
    """The size-gated k-core DISPATCHER (VERDICT r10 #2) — the
    census_auto pattern applied to the one remaining >0.5-alpha query
    without a scale path. Below ``exact_max`` lineitem rows (parquet
    metadata; deciding never costs a graph build) it runs the exact
    Matula-Beck peel (``graph_kcore_peeling``); above it, the SAME
    fixed-round peel on the deterministic p=1/4 md5-coin edge sample,
    with k re-derived from the sampled graph's own average degree (see
    KCORE_EXACT_LI_MAX for why that rescales correctly) and
    est_edges = n_edges·4 the unbiased per-round edge estimate. The
    coin lands BEFORE the edge-dedup distinct (the DOULION lesson), so
    at 100 TB every stage — the distinct, the per-round degree
    aggregate, the two semi-joins — moves p× the data. Branch-stable
    schema (method, round, n_nodes, n_edges, est_edges); the oracle
    replays the same CASE branch from the same COUNT(*) gate.

    Exact peeling stays registered as the verification baseline; both
    forced branches are pinned bit-equal to their standalone twins in
    tests/test_graph.py.
    """
    n_li = catalog.load(spark, sf_dir, "lineitem").count()
    if n_li <= exact_max:
        trace, method, inv_p = (_kcore_trace(_copurchase_edges(
            spark, sf_dir)), "exact", 1)
    else:
        coin = F.substring(
            F.md5(F.concat_ws("_", F.col("u").cast("string"),
                              F.col("v").cast("string"))
                  .cast("binary")), 1, 2)
        s = (_copurchase_pairs(spark, sf_dir)
             .filter(coin < F.lit(KCORE_SAMPLE_HEX_LIMIT)).distinct())
        trace, method, inv_p = _kcore_trace(s), "sampled", KCORE_SAMPLE_INV_P
    return trace.select(
        F.lit(method).alias("method"), "round", "n_nodes", "n_edges",
        (F.col("n_edges") * inv_p).cast("bigint").alias("est_edges"))


# Link-prediction parameters: common-neighbor scoring is computed PER
# QUERY NODE (the LP_N_QUERIES smallest node ids — deterministic, one
# ORDER BY node LIMIT both engines replay), NOT all-pairs. All-pairs
# common-neighbor counting is inherently Σd² with a pair-cardinality
# output that grows ~quadratically in density — the first 10× oracle
# drive OOM'd a 1 GB driver on ~140M candidate rows. Per-query is also
# the shape production link prediction actually runs (recommendations
# are served per user, not as a global pair table): per query the
# candidate stream is |Γ(q)|·cap ≤ LP_HUB_CAP² rows, independent of
# corpus size. The hub cap on CENTER degree is principled, not just
# cheap — a 10k-degree hub's co-occurrence says nothing about q-v
# affinity (the stop-word of graphs; Adamic-Adar exists to down-weight
# exactly these centers) — and the oracle replays it bit-exactly.
# Scoring degrees stay UNCAPPED exact values.
LP_HUB_CAP = 256
LP_TOP_K = 5
LP_N_QUERIES = 16


@register(
    "graph_link_prediction",
    oracle=f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), sym AS MATERIALIZED (
      SELECT u AS w, v AS n FROM e UNION ALL SELECT v AS w, u AS n FROM e
    ), deg AS MATERIALIZED (
      SELECT w AS node, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY w
    ), qn AS MATERIALIZED (
      SELECT node FROM deg ORDER BY node LIMIT {LP_N_QUERIES}
    ), qadj AS MATERIALIZED (
      SELECT s.w AS q, s.n AS center FROM sym s
      JOIN qn ON s.w = qn.node
    ), cand AS MATERIALIZED (
      SELECT qa.q, s2.n AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM qadj qa
      JOIN deg dc ON qa.center = dc.node
      JOIN sym s2 ON s2.w = qa.center AND s2.n <> qa.q
      WHERE dc.d <= {LP_HUB_CAP}
      GROUP BY 1, 2
    ), scored AS (
      SELECT cand.q, cand.v, cand.c,
             CAST(cand.c AS DOUBLE) / (dq.d + dv.d - cand.c) AS jac
      FROM cand
      JOIN deg dq ON cand.q = dq.node
      JOIN deg dv ON cand.v = dv.node
      WHERE NOT EXISTS (SELECT 1 FROM sym
                        WHERE sym.w = cand.q AND sym.n = cand.v)
    )
    SELECT q, v, c AS common_neighbors,
           ROUND(jac, 6) AS jaccard_score,
           CAST(ROW_NUMBER() OVER (PARTITION BY q
                                   ORDER BY jac DESC, v) AS BIGINT) AS rn
    FROM scored
    QUALIFY rn <= {LP_TOP_K}
    """,
    tags=("graph", "link-prediction", "similarity"),
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard link prediction on the part co-purchase graph: for each
    of the LP_N_QUERIES query nodes, the LP_TOP_K NON-adjacent
    candidates ranked by neighborhood Jaccard |Γ(q)∩Γ(v)| / |Γ(q)∪Γ(v)|
    — the co-purchase "customers also bought" recommendation primitive
    (Liben-Nowell & Kleinberg), computed the way a recommender actually
    serves it: per query node, never as the all-pairs table (see the
    parameter comment — the all-pairs formulation is Σd² with a
    quadratic output and OOM'd the 10× drive).

    Plan shape: query adjacency is a broadcast semi-probe of the
    symmetrized edge list; candidates come from ONE equi-join of that
    (tiny) adjacency against the edge list on the center node, with
    hub centers dropped by the oracle-replayed LP_HUB_CAP; existing
    edges are removed by a left-anti join against the same symmetrized
    list; the top-k window partitions by query node (never global).
    Per-query cost is ≤ LP_HUB_CAP² candidate rows at any corpus size.
    """
    e = _copurchase_edges(spark, sf_dir).persist()
    e.count()  # eager fill: sym is consumed by 4 non-identical stages
    sym = (e.select(F.col("u").alias("w"), F.col("v").alias("n"))
           .unionAll(e.select(F.col("v").alias("w"),
                              F.col("u").alias("n"))))
    deg = sym.groupBy(F.col("w").alias("node")).agg(
        F.count(F.lit(1)).alias("d"))
    qn = (deg.select("node").orderBy("node").limit(LP_N_QUERIES)
          .select(F.col("node").alias("q")))
    qadj = (sym.join(F.broadcast(qn), sym["w"] == qn["q"])
            .select("q", F.col("n").alias("center")))
    dc = deg.select(F.col("node").alias("center"), F.col("d").alias("dc"))
    cand = (qadj.join(dc, "center")
            .filter(F.col("dc") <= LP_HUB_CAP)
            .join(sym.select(F.col("w").alias("center"),
                             F.col("n").alias("v")), "center")
            .filter(F.col("v") != F.col("q"))
            .groupBy("q", "v").agg(F.count(F.lit(1)).alias("c")))
    adj_pairs = sym.select(F.col("w").alias("q"), F.col("n").alias("v"))
    dq = deg.select(F.col("node").alias("q"), F.col("d").alias("dq"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    jac = F.col("c").cast("double") / (F.col("dq") + F.col("dv")
                                       - F.col("c"))
    scored = (cand.join(adj_pairs, ["q", "v"], "left_anti")
              .join(F.broadcast(dq), "q").join(dv, "v")
              .select("q", "v", F.col("c").alias("common_neighbors"),
                      jac.alias("jac")))
    w = Window.partitionBy("q").orderBy(F.col("jac").desc(), "v")
    return (scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= LP_TOP_K)
            .select("q", "v", "common_neighbors",
                    F.round("jac", 6).alias("jaccard_score"), "rn"))


# Label propagation community detection: LPA_ROUNDS synchronous rounds
# (fixed — the pagerank/kcore determinism device), each node adopting
# its neighbors' most frequent label with a (count DESC, label ASC)
# tie-break, labels initialized to node ids. Deterministic end to end:
# no randomized visit order (the classic asynchronous LPA is not
# replayable), so the oracle is an unrolled MATERIALIZED-CTE chain.
LPA_ROUNDS = 3
LPA_TOP = 20


def lpa_labels(ev: DataFrame, rounds: int,
               checkpoint: bool = True,
               frontier: bool = False) -> DataFrame:
    """``rounds`` synchronous LPA sweeps over a symmetrized (src, dst)
    edge frame; returns (node, label). Deterministic: most-frequent
    neighbor label, ties broken by smallest label. Factored out so
    tests can drive synthetic graphs through the exact production
    iteration (the pagerank() pattern); ``checkpoint=False`` keeps the
    logical plan inspectable for the no-Sort plan assertion.

    ``frontier=True`` (VERDICT r10 #4) keeps the synchronous semantics
    bit-identical while re-aggregating, from round 2 on, ONLY the
    neighbors of nodes whose label changed last round: for any node
    with no changed neighbor, the (label → count) multiset feeding the
    argmax is unchanged from the previous round, so its new label
    provably equals its current one and carries over via an anti-join
    instead of a recount. An EMPTY frontier is the fixed point (all
    later rounds are no-ops) and exits the loop early — both
    equivalences are pinned by tests/test_round10_ops.py against the
    full sweep.

    frontier defaults to FALSE — a second documented NEGATIVE result
    on this operator (after max_by): on the co-purchase graph the
    churn never collapses within the round budget (sf0.1 measured
    20000/20000 → 15005 → 14588 labels changed per round), so the
    frontier machinery (change detection + two semi-joins + anti-join
    union) is pure overhead — measured 19.7-29.6 s vs the full
    sweep's 10.3-12.4 s at sf0.1. It stays available (and equivalence
    -tested) for genuinely sparse-churn graphs. The wall win that DID
    land instead: callers persist ``ev`` PRE-PARTITIONED on dst (see
    graph_community_lpa) so each round's edges⋈labels join skips the
    E-sized exchange — ~2x end to end at both 1x and 10x."""
    labels = (ev.select(F.col("src").alias("node"))
              .distinct()
              .select("node", F.col("node").alias("label")))
    # Argmax strategy, a documented NEGATIVE result: a max_by over a
    # (cnt, -label) struct looks like it should beat this window (map-
    # side combinable, "no sort") — but Spark plans struct-buffered
    # max_by as SortAggregate, which SORTS each side of the shuffle
    # anyway and forfeits the exchange reuse the window gets from
    # sharing the node partitioning with the count. Measured at 10x:
    # window 33.9 s vs max_by 37.6-54.1 s. The ranking window stays.
    w = Window.partitionBy("node").orderBy(F.col("cnt").desc(),
                                           F.col("label").asc())

    def sweep(edges: DataFrame) -> DataFrame:
        nbr = (edges.join(labels.withColumnRenamed("node", "dst"), "dst")
               .select(F.col("src").alias("node"), "label"))
        cnt = nbr.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("cnt"))
        return (cnt.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") == 1)
                .select("node", "label"))

    prev = None
    for _ in range(rounds):
        if prev is None or not frontier:
            nxt = sweep(ev)
        else:
            changed = (labels.join(
                prev.withColumnRenamed("label", "plabel"), "node")
                .filter(F.col("label") != F.col("plabel"))
                .select("node"))
            # O(1)-row existence probe, not a full count: an empty
            # frontier IS the fixed point, every later round a no-op
            if checkpoint and not changed.limit(1).take(1):
                break
            affected = (ev.join(changed.withColumnRenamed("node", "dst"),
                                "dst", "left_semi")
                        .select(F.col("src").alias("node")).distinct())
            sub_ev = ev.join(affected.withColumnRenamed("node", "src"),
                             "src", "left_semi")
            nxt = (labels.join(affected, "node", "left_anti")
                   .unionByName(sweep(sub_ev)))
        if checkpoint:
            # per-round lineage truncation (the kcore lesson); skipped
            # only by plan-inspection callers
            nxt = nxt.localCheckpoint(eager=True)
        prev, labels = labels, nxt
    return labels


def _lpa_oracle() -> str:
    ctes = ["""ev AS MATERIALIZED (
      SELECT u AS src, v AS dst FROM (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
      UNION ALL
      SELECT v AS src, u AS dst FROM (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
    )""", """l0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, src AS label FROM ev
    )"""]
    for r in range(1, LPA_ROUNDS + 1):
        p = r - 1
        ctes.append(f"""c{r} AS MATERIALIZED (
      SELECT ev.src AS node, l{p}.label, COUNT(*) AS cnt
      FROM ev JOIN l{p} ON ev.dst = l{p}.node
      GROUP BY 1, 2
    )""")
        ctes.append(f"""l{r} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, label ASC) AS rk
        FROM c{r}) WHERE rk = 1
    )""")
    return ("WITH " + ",\n    ".join(ctes) + f"""
    SELECT label AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM l{LPA_ROUNDS}
    GROUP BY 1
    ORDER BY n_members DESC, community ASC
    LIMIT {LPA_TOP}""")


@register(
    "graph_community_lpa",
    oracle=_lpa_oracle(),
    tags=("graph", "community", "iterative"),
)
def graph_community_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the part co-purchase graph by synchronous
    label propagation (Raghavan et al. 2007, made deterministic): 3
    fixed rounds, each node adopting the most frequent neighbor label
    with a (count DESC, label ASC) tie-break; emits the LPA_TOP largest
    communities. The corpus-curation use: cluster correlated sources /
    products before sampling so one community can't dominate a batch.

    Scale: the edge frame is persisted PRE-PARTITIONED on dst (NOT
    localCheckpoint-ed, which erases the partitioning guarantee from
    the physical plan): every round's edges⋈labels join then reuses
    that layout and only the |V|-sized label frame moves — measured
    ~2x end to end vs the checkpointed frame at both sf0.1 (10.3-12.4
    → 5.2-6.8 s) and 10x (19.3-32.7 → 11.1-24.8 s), VERDICT r10 #4.
    ev is CONSTANT across rounds so its un-truncated lineage (one
    distinct + union) never grows; the per-round label frames keep
    their localCheckpoint (the kcore lineage-truncation lesson). The
    groupBy(node,label) count and the row_number tie-break window
    share the node partitioning, so AQE reuses that exchange; state
    per round is |V| labels, never |V|². Fixed-round synchronous
    sweep = replayable oracle; asynchronous single-pass LPA is not.
    """
    e = _copurchase_edges(spark, sf_dir)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ev = (e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
          .unionAll(e.select(F.col("v").alias("src"),
                             F.col("u").alias("dst")))
          .repartition(n_part, "dst").persist())
    ev.count()  # eager fill before the per-round fan-out
    labels = lpa_labels(ev, LPA_ROUNDS)
    return (labels.groupBy(F.col("label").alias("community"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
            .orderBy(F.col("n_members").desc(), F.col("community").asc())
            .limit(LPA_TOP))
