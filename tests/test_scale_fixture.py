"""Pin the scale fixture's forest-preserving part-key graft (VERDICT
r12 #4): the 10x audit data's DIV-10 forest must keep EVERY copied node
reachable from a real root — the r12 fixture orphaned all copy-i>=1
nodes and the audit silently measured a 1x forest. This gate replays
tools/make_scale_data.py's exact SQL transform over a miniature
contiguous key range and walks every parent chain."""

from __future__ import annotations

from pyspark.sql import functions as F

from tools.make_scale_data import graft_expr

FANOUT = 10           # operators/hierarchy.HIER_FANOUT
MAXK = 500            # miniature contiguous copy-0 key space 1..MAXK
FACTOR = 4


def _anchors() -> dict[int, int]:
    # same selection rule as make_scale_data.main: the factor-1 largest
    # copy-0 keys, all sharing a digit length
    g = {i: MAXK - (FACTOR - 1) + i for i in range(1, FACTOR)}
    assert len({len(str(s)) for s in g.values()}) == 1
    return g


def test_graft_preserves_forest(spark):
    base = spark.range(1, MAXK + 1).select(F.col("id").alias("k"))
    frames = [base]
    for i, anchor in _anchors().items():
        frames.append(base.select(
            F.expr(graft_expr("k", anchor)).alias("k")))
    allk = frames[0]
    for f in frames[1:]:
        allk = allk.unionAll(f)
    keys = {r["k"] for r in allk.collect()}
    # FACTOR x nodes, no key collisions across copies
    assert len(keys) == FACTOR * MAXK
    # every node's DIV-10 chain stays inside the key set down to a root
    max_depth = 0
    for k in keys:
        d = 0
        while k >= FANOUT:
            k //= FANOUT
            d += 1
            assert k in keys, f"orphaned ancestor {k}"
        max_depth = max(max_depth, d)
    # grafted copies hang UNDER copy-0 anchors: strictly deeper than
    # the base forest
    base_depth = len(str(MAXK)) - 1
    assert max_depth > base_depth


def test_graft_chains_through_its_anchor(spark):
    anchor = 497
    img = {r["g"]: r["k"] for r in
           spark.range(1, 100).select(
               F.col("id").alias("k"),
               F.expr(graft_expr("k", anchor)).alias("g")).collect()}
    for g, k in img.items():
        # digits(image) = digits(anchor) ++ digits(k)
        assert str(g) == f"{anchor}{k}"
        # single-digit base keys resolve to the anchor itself
        if k < 10:
            assert g // 10 == anchor
