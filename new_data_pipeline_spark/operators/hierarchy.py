"""Hierarchy / transitive-closure operators via POINTER DOUBLING — the
scalable DataFrame answer to the recursive CTE Spark doesn't have.

A naive root-finding loop joins the edge list depth-many times
(O(E·depth) work, depth sequential rounds). Pointer doubling (a.k.a.
path doubling, the classic PRAM technique — Jájá, *An Introduction to
Parallel Algorithms*, §3.1) squares the jump length each round:
after round i every node knows its 2^i-th ancestor, so root/depth for
a depth-d forest needs only ceil(log2(d)) self-joins. At 100 TB that
is the difference between 6 shuffles and 64.

The fixture forest is synthesized from the part table the way the
multimodal family synthesizes payloads: parent(k) = k DIV 10 for
k >= 10, nodes 1..9 are roots — a deterministic 10-ary forest whose
depth is the key's decimal length, giving real multi-level trees at
every SF with no new input data. The oracle walks the SAME forest with
DuckDB's genuine WITH RECURSIVE, so the gate cross-checks the doubling
algebra against a real recursive engine, not against itself.

Reference analog: none — SURVEY.md §2.2 extension territory
(hierarchical rollup is a standard warehouse ask the relational core
lacked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

# ceil(log2(max depth)) rounds of doubling: 6 rounds resolve any
# forest of depth <= 64; the fixture forest's depth is the decimal
# length of p_partkey (<= 7 even at sf100), so convergence has huge
# margin and is asserted by a unit test, not assumed.
DOUBLING_ROUNDS = 6
HIER_FANOUT = 10


@register(
    "hierarchy_rollup_doubling",
    oracle=f"""
    WITH RECURSIVE walk (node, root, depth) AS (
      SELECT p_partkey AS node, p_partkey AS root, 0 AS depth
      FROM part WHERE p_partkey < {HIER_FANOUT}
      UNION ALL
      SELECT p.p_partkey, w.root, w.depth + 1
      FROM part p JOIN walk w ON p.p_partkey // {HIER_FANOUT} = w.node
      WHERE p.p_partkey >= {HIER_FANOUT}
    )
    SELECT w.root,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MAX(w.depth) AS BIGINT) AS max_depth,
           CAST(SUM(CAST(p.p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
             AS subtree_retail
    FROM walk w JOIN part p ON w.node = p.p_partkey
    GROUP BY w.root
    """,
    tags=("hierarchy", "iterative", "pointer-doubling", "rollup"),
)
def hierarchy_rollup_doubling(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Per-root subtree rollup (node count, max depth, decimal-exact
    retail-price sum) of the synthetic part forest, with every node's
    (root, depth) resolved by pointer doubling in DOUBLING_ROUNDS
    self-joins instead of a depth-long sequential walk. The oracle
    resolves the same forest with a genuine recursive CTE.

    Scale shape: each round is ONE self-equi-join of the P-row pointer
    frame on the jump target (shuffle on one bigint key) — O(P log d)
    total work, log d sequential rounds, no driver-side iteration state
    beyond the loop counter. The pointer frame persists per round and
    the previous round unpersists, the LPA/k-core cache discipline.
    """
    part = catalog.load(spark, sf_dir, "part")
    # ptr: node -> (anc = farthest known ancestor, steps = distance to
    # it, done = anc is a root). Roots point at themselves, done.
    is_root = F.col("p_partkey") < HIER_FANOUT
    ptr = part.select(
        F.col("p_partkey").alias("node"),
        F.when(is_root, F.col("p_partkey"))
         .otherwise(F.expr(f"p_partkey DIV {HIER_FANOUT}")).alias("anc"),
        F.when(is_root, F.lit(0)).otherwise(F.lit(1)).alias("steps"),
        is_root.alias("done")).persist()
    for _ in range(DOUBLING_ROUNDS):
        jump = ptr.select(F.col("node").alias("j_node"),
                          F.col("anc").alias("j_anc"),
                          F.col("steps").alias("j_steps"),
                          F.col("done").alias("j_done"))
        nxt = (ptr.join(jump, ptr.anc == jump.j_node)
               .select("node",
                       F.when(F.col("done"), F.col("anc"))
                        .otherwise(F.col("j_anc")).alias("anc"),
                       F.when(F.col("done"), F.col("steps"))
                        .otherwise(F.col("steps") + F.col("j_steps"))
                        .alias("steps"),
                       (F.col("done") | F.col("j_done")).alias("done"))
               .persist())
        nxt.count()          # materialize before dropping the old round
        ptr.unpersist()
        ptr = nxt
        # early exit once every node reached its root (the fixture
        # converges in ~3 rounds; DOUBLING_ROUNDS is the safety bound)
        if ptr.filter(~F.col("done")).limit(1).count() == 0:
            break
    from new_data_pipeline_spark.functions.exact import money
    resolved = ptr.select("node", F.col("anc").alias("root"),
                          F.col("steps").alias("depth"))
    return (resolved
            .join(part, resolved.node == part.p_partkey)
            .groupBy("root")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
                 F.max("depth").cast("bigint").alias("max_depth"),
                 F.sum(money("p_retailprice")).cast("double")
                 .alias("subtree_retail")))
