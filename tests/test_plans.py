"""Physical-plan assertions: the scale guarantees the engine claims
(predicate pushdown, column pruning, broadcast dims, partial
aggregation) must be visible in explain() output, not just hoped for.

These tests pin the *plan shape*, so a refactor that silently turns a
broadcast join into a shuffle join or drops a pushed filter fails CI
even though results stay correct.
"""

from __future__ import annotations

import contextlib
import io

import new_data_pipeline_spark as engine
from tests.conftest import SF_DIR

engine.load_all()


def plan_text(spark, name: str) -> str:
    df = engine.QUERIES[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_flagship_broadcasts_dims_and_pushes_filter(spark):
    p = plan_text(spark, "flagship_revenue_by_nation")
    assert "BroadcastHashJoin" in p, "dimension joins must broadcast"
    assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters", 1)[1], \
        "shipdate filter must reach the parquet scan"


def test_projection_filter_prunes_and_pushes(spark):
    p = plan_text(spark, "projection_filter")
    pushed = p.split("PushedFilters", 1)[1].split("]", 1)[0]
    assert "o_totalprice" in pushed and "o_orderstatus" in pushed
    schema = p.split("ReadSchema", 1)[1].split("\n", 1)[0]
    assert "o_orderdate" not in schema, "unused columns must be pruned from the scan"


def test_pricing_summary_partial_aggregation(spark):
    p = plan_text(spark, "pricing_summary")
    assert "partial_sum" in p or "partial_count" in p, \
        "aggregate must combine map-side before the shuffle"


def test_bruteforce_topk_broadcasts_queries(spark):
    p = plan_text(spark, "sim_bruteforce_topk")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, \
        "query vectors must broadcast; corpus must not shuffle"


def test_no_cartesian_in_minhash(spark):
    p = plan_text(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in p, \
        "LSH candidate generation must be an equi-join on band keys"


# In a windowspecdefinition(...) rendering, partition columns come first
# as bare attributes; an empty partition spec makes the first argument a
# sort-order ("x ASC NULLS FIRST") or the frame itself — i.e. the window
# would single-task the whole input (WindowExec "No Partition Defined").
_UNPARTITIONED_WINDOW = __import__("re").compile(
    r"windowspecdefinition\((?:[^,()]*\s(?:ASC|DESC)\s+NULLS|\s*specifiedwindowframe)")


# Unpartitioned windows whose input cardinality is bounded by something
# other than the data size (and therefore cannot become a single-task
# scan of the corpus). Every entry needs a justification.
_BOUNDED_GLOBAL_WINDOWS = {
    # one row per calendar week after aggregation: thousands of rows at
    # ANY corpus size — bounded by elapsed time, not by data volume
    "cumulative_unique_users",
}


def test_no_unpartitioned_windows_anywhere(spark):
    """Every registered query's optimized plan must be free of global
    (unpartitioned) window operators — the round-1 single-task scans
    (window_rank_dense_ntile, window_pct_cume_nth, window_range_frame,
    BoW vocab rank) are rewritten via global_row_number / band joins.
    Time-bounded exceptions are allowlisted above with justification."""
    bad = []
    for name, spec in engine.QUERIES.items():
        if name in _BOUNDED_GLOBAL_WINDOWS:
            continue
        df = spec.fn(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        for line in plan.splitlines():
            if _UNPARTITIONED_WINDOW.search(line):
                bad.append((name, line.strip()[:100]))
    assert not bad, f"unpartitioned windows: {bad}"


def test_heavy_hitters_broadcast_recount_and_partial_agg(spark):
    p = plan_text(spark, "text_heavy_hitters")
    assert "BroadcastHashJoin" in p and "LeftSemi" in p, \
        "candidate recount must be a broadcast semi-join, not a shuffle"
    assert "partial_count" in p, \
        "recount must combine map-side before its shuffle"


def test_profile_single_expand_pass(spark):
    p = plan_text(spark, "profile_table_quality")
    assert p.count("Location: InMemoryFileIndex") == 1, \
        "profile must read the table exactly once"
    assert "Expand" in p, \
        "multi-column distinct must compile to one Expand pass"


def test_q5_broadcasts_both_dims(spark):
    p = plan_text(spark, "tpch_q5_local_supplier_volume")
    assert p.count("BroadcastHashJoin") >= 2, \
        "nation and region must broadcast"


def test_contamination_joins_on_hashed_grams(spark):
    p = plan_text(spark, "text_contamination_ngrams")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, \
        "gram-overlap check must be an equi-join on the 64-bit gram hash"


def test_kmeans_assignment_broadcasts_centroids(spark):
    p = plan_text(spark, "cluster_kmeans_assign")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, \
        "centroid table must broadcast — the corpus side never shuffles " \
        "for the scoring join"
    assert "partial_" in p, \
        "argmax must be a max_by aggregate (map-side combinable), " \
        "not a window sort"


def test_fuzzy_join_no_cartesian(spark):
    p = plan_text(spark, "join_fuzzy_qgram")
    assert "CartesianProduct" not in p, \
        "q-gram candidate generation must stay an equi-join on " \
        "(gram, occ); only the tiny short-string fallback may nested-loop"


def test_pit_join_single_key_shuffle(spark):
    p = plan_text(spark, "join_temporal_pointintime")
    assert "CartesianProduct" not in p and \
        "BroadcastNestedLoopJoin" not in p, \
        "interval predicate must ride the user_id equi-join as a " \
        "residual, not degrade to a loop join"


def test_salted_join_no_plain_hot_key_exchange(spark):
    p = plan_text(spark, "join_salted_skew")
    assert "__salt" in p, "join must actually run on the salted key"


# Queries whose physical plan legitimately contains a non-broadcast
# loop join. Every entry needs a justification.
_ALLOWED_LOOP_JOINS: set[str] = set()


def test_no_row_udfs_or_cartesians_anywhere(spark):
    """Repo-wide slow-path sweep over every registered query's physical
    plan: no row-at-a-time Python UDFs (BatchEvalPython — Arrow-batched
    ArrowEvalPython/MapInPandas/FlatMapGroupsInPandas are the sanctioned
    Python paths) and no CartesianProduct (every crossJoin call site
    must broadcast its tiny side into a BroadcastNestedLoopJoin)."""
    bad = []
    for name, spec in engine.QUERIES.items():
        df = spec.fn(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            bad.append((name, "row-at-a-time Python UDF"))
        if "CartesianProduct" in plan and name not in _ALLOWED_LOOP_JOINS:
            bad.append((name, "CartesianProduct"))
    assert not bad, f"slow paths found: {bad}"


def test_bpe_token_counts_map_only(spark):
    """The BPE tokenizer stage must be shuffle-free: scan → project →
    ArrowEvalPython/MapInPandas, no Exchange anywhere (the whole
    operator is embarrassingly parallel)."""
    p = plan_text(spark, "text_bpe_token_counts")
    assert "Exchange" not in p, "BPE counting must not shuffle"
    assert "MapInPandas" in p or "ArrowEvalPython" in p, \
        "merge loop must run on the Arrow batch path"


def test_boilerplate_strip_single_scan_no_udf(spark):
    """Boilerplate stripping is pure built-ins over one scan: the only
    Exchange is the per-document aggregate."""
    p = plan_text(spark, "text_boilerplate_strip")
    assert "MapInPandas" not in p and "ArrowEvalPython" not in p \
        and "BatchEvalPython" not in p, \
        "density heuristic must stay JVM-side"
    assert p.count("Location: InMemoryFileIndex") == 1, \
        "one scan of documents"


def test_pq_broadcasts_codebooks(spark):
    """PQ encode/ADC must broadcast the codebook side — the corpus
    never shuffles for scoring — and the argmin must be a map-side
    min_by aggregate (partial_), not a window sort."""
    p = plan_text(spark, "sim_pq_topk")
    assert "BroadcastHashJoin" in p, "codebook join must broadcast"
    assert "partial_min_by" in p or "partial_" in p, \
        "code assignment must combine map-side"


def test_ivf_assignment_is_mapside_argmax(spark):
    """IVF cell assignment must be a map-side-combinable max_by over
    the N·C scored fan-out (VERDICT r7 #3), never a row_number window
    that shuffles the 64×-amplified intermediate. The only Window
    operators left are the query-side probe rank (N_QUERIES·C rows —
    the vec_id filter is pushed below it) and the final per-query
    top-k."""
    import re

    p = plan_text(spark, "sim_ivf_topk")
    assert "partial_max_by" in p, \
        "cell assignment must combine map-side (max_by argmax)"
    n_windows = len(re.findall(r"\bWindow\b", p))
    assert n_windows <= 2 * 2, \
        f"expected <=2 Window ops (x2 for formatted-plan echo), saw {n_windows}"


def test_pagerank_partial_aggregates_and_caches_edges(spark, monkeypatch):
    """Each DISTRIBUTED power iteration must combine contributions
    map-side (partial_sum before the shuffle on dst) and reuse the
    persisted edge table instead of re-joining the 4-table star per
    round. The gate itself takes the driver loop below
    DRIVER_PR_MAX_EDGES (r14), so force the distributed path here."""
    from new_data_pipeline_spark.operators import graph as G

    monkeypatch.setattr(G, "DRIVER_PR_MAX_EDGES", 0)
    p = plan_text(spark, "graph_pagerank")
    assert "partial_sum" in p, "contribution aggregate must combine map-side"
    assert "InMemoryTableScan" in p, \
        "edge table must be persisted across iterations"


def test_lm_perplexity_stays_jvm_side(spark):
    """LM training and scoring are joins + aggregates over built-in
    expressions: no Python evaluation path anywhere in the plan."""
    p = plan_text(spark, "text_lm_perplexity")
    assert "MapInPandas" not in p and "ArrowEvalPython" not in p \
        and "BatchEvalPython" not in p, "LM scorer must stay JVM-side"
    assert "partial_count" in p or "partial_sum" in p, \
        "count training must combine map-side"


def test_theta_sketch_reuses_persisted_sketches(spark):
    """Both pair-scoring branches (theta summary and common-hash count)
    must read the k-row-per-segment persisted sketch, not rebuild it
    from the events scan."""
    p = plan_text(spark, "agg_theta_intersection")
    assert "InMemoryTableScan" in p, "KMV sketches must be persisted"
    assert "CartesianProduct" not in p


def test_setsim_prefix_join_no_cartesian_and_caches_shingles(spark):
    """Candidate generation must be an equi-join on prefix shingles
    (never a cartesian pass) and the shingle subtree must be computed
    once for frequency counts, prefixes, and both verification sides."""
    p = plan_text(spark, "join_set_similarity")
    assert "CartesianProduct" not in p
    assert "InMemoryTableScan" in p, "shingle sets must be persisted"


def test_setsim_prefix_variant_no_cartesian(spark):
    """The prefix strategy must also candidate-generate via equi-join
    (rare-first prefixes), never a cartesian pass."""
    p = plan_text(spark, "join_set_similarity_prefix")
    assert "CartesianProduct" not in p
    assert "InMemoryTableScan" in p, "shingle sets must be persisted"
