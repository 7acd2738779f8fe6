"""Association-rule mining over order baskets: support / confidence /
lift for co-purchased part pairs — the market-basket workhorse a
curation pipeline reuses for "items bought together" features and for
spotting correlated sources before mixing training data.

Counting design (the scale story): ONE shuffle of lineitem builds the
per-order DISTINCT-part basket frame (the map-side combination device
from the co-purchase graph, graph.py:250); pairs, item frequencies,
and the basket count all derive from that persisted frame map-side —
the k·(k-1)/2 pair blowup happens in the task the group already lands
in, then a pair-keyed partial-aggregated count. The pair→item-count
joins shuffle only the (post-MIN_JOINT-filter, tiny) rule table, and
at test scale AQE broadcasts the item-count side. No all-pairs
anything: candidate pairs only ever materialize where they co-occur.
Audited linear-by-design (alpha 0.91, wall 8.1x on 10x data): every
pair instance must be witnessed, and baskets are bounded (TPC-H ≤ 7
items), so the work is O(lineitem) with no sublinear exact
alternative.

Metric parity: all counts are exact integers; support/confidence/lift
are single IEEE divisions on identical operands in both engines,
rounded 6 dp at the boundary; ordering is on the ROUNDED lift with a
(part_a, part_b) tie-break, so the top-50 cut is deterministic.

Reference analog: none — SURVEY.md §2.2 extension territory (the
reference has no relational analytics at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

# Minimum joint-basket count for a reported rule. 2 keeps the result
# non-degenerate across all test scales (sf0.001's 200-part catalog
# co-occurs densely; sf0.1's 20k-part catalog is sparse — measured
# pair-count means 0.45 / 0.045 / 0.0045, so >=2 yields a real rule
# set at each scale where >=3 collapses the small fixtures).
MIN_JOINT = 2
TOP_RULES = 50


@register(
    "ml_market_basket_lift",
    oracle=f"""
    WITH b AS (
      SELECT l_orderkey, l_partkey FROM lineitem GROUP BY 1, 2
    ), pc AS (
      SELECT a.l_partkey AS u, c.l_partkey AS v,
             CAST(COUNT(*) AS BIGINT) AS pair_n
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2
    ), ic AS (
      SELECT l_partkey AS item, CAST(COUNT(*) AS BIGINT) AS item_n
      FROM b GROUP BY 1
    ), nb AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n
      FROM lineitem
    )
    SELECT u AS part_a, v AS part_b, pair_n AS n_joint,
           ROUND(CAST(pair_n AS DOUBLE) / nb.n, 6) AS support,
           ROUND(CAST(pair_n AS DOUBLE) / ia.item_n, 6) AS conf_a_b,
           ROUND(CAST(pair_n AS DOUBLE) / ib.item_n, 6) AS conf_b_a,
           ROUND(CAST(pair_n AS DOUBLE) * nb.n / (ia.item_n * ib.item_n), 6)
             AS lift
    FROM pc JOIN ic ia ON pc.u = ia.item
            JOIN ic ib ON pc.v = ib.item, nb
    WHERE pair_n >= {MIN_JOINT}
    ORDER BY lift DESC, part_a, part_b
    LIMIT {TOP_RULES}
    """,
    tags=("ml", "association-rules", "market-basket"),
)
def ml_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_RULES} co-purchase rules by lift: for every part pair
    co-occurring in >= MIN_JOINT order baskets, support (joint basket
    fraction), both directed confidences, and lift (observed / expected
    co-occurrence under independence). See module docstring for the
    one-shuffle counting plan and the rounded-lift deterministic cut."""
    li = catalog.load(spark, sf_dir, "lineitem")
    # ONE shuffle of lineitem builds the basket frame; pairs, item
    # frequencies, and the basket count all derive from it map-side.
    # Three consumers, but all inside ONE final plan/action, so the
    # persist fills exactly once with no cross-action cold-cache race
    # (|orders|-sized rows of ≤7-element arrays — tiny)
    baskets = (li.groupBy("l_orderkey")
               .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
               .persist())
    combos = F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))")
    pairs = (baskets.select(F.explode(combos).alias("p"))
             .select(F.col("p.u").alias("u"), F.col("p.v").alias("v")))
    pc = (pairs.groupBy("u", "v")
          .agg(F.count(F.lit(1)).cast("bigint").alias("pair_n"))
          .filter(F.col("pair_n") >= MIN_JOINT))
    # r14: persist — ia and ib are two non-identical consumers and each
    # re-ran the item-frequency aggregate from the baskets cache
    # (profiled as two near-identical 7-exec-s stages); |parts|-sized
    ic = (baskets.select(F.explode("ps").alias("item"))
          .groupBy("item")
          .agg(F.count(F.lit(1)).cast("bigint").alias("item_n"))
          .persist())
    nb = baskets.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ia = ic.withColumnsRenamed({"item": "item_a", "item_n": "n_a"})
    ib = ic.withColumnsRenamed({"item": "item_b", "item_n": "n_b"})
    pair_d = F.col("pair_n").cast("double")
    return (pc.join(ia, pc["u"] == ia["item_a"])
            .join(ib, pc["v"] == ib["item_b"])
            .crossJoin(nb)
            .select(F.col("u").alias("part_a"),
                    F.col("v").alias("part_b"),
                    F.col("pair_n").alias("n_joint"),
                    F.round(pair_d / F.col("n"), 6).alias("support"),
                    F.round(pair_d / F.col("n_a"), 6).alias("conf_a_b"),
                    F.round(pair_d / F.col("n_b"), 6).alias("conf_b_a"),
                    F.round(pair_d * F.col("n")
                            / (F.col("n_a") * F.col("n_b")), 6)
                    .alias("lift"))
            .orderBy(F.col("lift").desc(), "part_a", "part_b")
            .limit(TOP_RULES))
