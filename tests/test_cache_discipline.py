"""Cold-cache-race guards (VERDICT r8 #6).

A ``.persist()`` whose consumers are NON-identical subtrees is only
safe if (a) something eagerly fills the cache before the plan fans out
(count / collect / saveAsTable as the FIRST action), or (b) the
consumers are identical subtrees so ReuseExchange forces one
computation. A cold cache raced by independent stages computes the
expensive subtree once PER CONSUMER (the incremental-LSH lesson,
BASELINE.md round 8: 59 s vs 6 s at 10×).

Two layers of guard:
- runtime: after each audited build's eager fill, every persisted RDD
  must be 100% cached — proving the fill covers the whole frame before
  any consumer runs;
- source: the eager-fill call sites the audited queries rely on must
  stay present (inspect.getsource), so a refactor that drops one fails
  here rather than only in a 10× wall-clock audit.
"""

from __future__ import annotations

import inspect
import re

from tests.conftest import SF_DIR


def _persisted_infos(spark):
    return list(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def _assert_all_fully_cached(spark, expect_at_least: int = 1):
    infos = _persisted_infos(spark)
    assert len(infos) >= expect_at_least, \
        f"expected >= {expect_at_least} persisted RDDs, got {len(infos)}"
    for info in infos:
        assert info.numCachedPartitions() == info.numPartitions(), (
            f"partially-filled cache: {info.name()} "
            f"{info.numCachedPartitions()}/{info.numPartitions()} — "
            "an eager fill must cover every partition before fan-out")


def test_shingle_band_eager_fill_covers_cache(spark):
    """bands.count() (what dedup_incremental_lsh runs first) must leave
    BOTH persisted frames — the hashed shingle sets and the band table
    — fully cached before any consumer stage can race them."""
    from new_data_pipeline_spark.operators.dedup import _shingle_bands

    spark.catalog.clearCache()
    s, bands = _shingle_bands(spark, SF_DIR)
    bands.count()
    _assert_all_fully_cached(spark, expect_at_least=2)
    spark.catalog.clearCache()


def test_triangle_edge_eager_fill_covers_cache(spark):
    """graph_triangle_stats counts the persisted edge list before deg /
    wedges / closing-probe fan-out; the count must fill every cached
    partition."""
    from new_data_pipeline_spark.operators.graph import _copurchase_edges

    spark.catalog.clearCache()
    e = _copurchase_edges(spark, SF_DIR).persist()
    e.count()
    _assert_all_fully_cached(spark, expect_at_least=1)
    spark.catalog.clearCache()


def test_running_sum_collect_is_first_action_and_fills_cache(spark):
    """tensorize's range+offset devices persist the ranged frame and
    collect per-range totals as the FIRST action — after the helper
    returns (before the caller's action), the cache must already be
    full."""
    from new_data_pipeline_spark.sources.tensorize import (
        global_running_sum, grouped_running_sum)

    spark.catalog.clearCache()
    df = spark.createDataFrame(
        [(i % 3, i, i + 1) for i in range(100)], "g int, k int, v int")
    global_running_sum(df, ["k"], "v", num_ranges=4)
    _assert_all_fully_cached(spark, expect_at_least=1)
    spark.catalog.clearCache()
    grouped_running_sum(df, "g", ["k"], "v", num_ranges=4)
    _assert_all_fully_cached(spark, expect_at_least=1)
    spark.catalog.clearCache()


def _source_of(fn) -> str:
    return inspect.getsource(fn)


def test_eager_fill_call_sites_present():
    """The audited queries' eager fills must not be refactored away.
    Identical-subtree persists (minhash_pairs' self-join, simhash's
    explode self-join, ngram's block join) are exempt: ReuseExchange
    forces one computation there, which their comments document."""
    from new_data_pipeline_spark.operators import dedup, graph

    src = _source_of(dedup.dedup_incremental_lsh)
    assert re.search(r"bands\.count\(\)", src), \
        "dedup_incremental_lsh must eagerly fill the band cache"
    src = _source_of(graph.graph_triangle_stats)
    assert re.search(r"e\.count\(\)", src), \
        "graph_triangle_stats must eagerly fill the edge cache"
    src = _source_of(graph.graph_triangle_doulion)
    assert re.search(r"s\.count\(\)", src), \
        "graph_triangle_doulion must eagerly fill the sampled-edge cache"
    # the range+offset devices: the subtotal collect IS the eager fill —
    # it must stay the first action after persist
    from new_data_pipeline_spark.sources import tensorize
    for fn in (tensorize.global_row_number, tensorize.global_running_sum,
               tensorize.grouped_running_sum):
        s = _source_of(fn)
        assert s.index(".persist()") < s.index(".collect()"), \
            f"{fn.__name__}: collect must follow persist (eager fill)"
