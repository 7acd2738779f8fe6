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


def test_range_caches_release_deterministically(spark):
    """VERDICT r9 #5: the range+offset devices must not accumulate
    persisted blocks across repeated calls in a long-lived session.
    The release is EXPLICIT (release_range_caches after the final
    consuming action) because the cache pins the sampled range
    boundaries the collected offsets were computed against — an
    auto-release could drop it under a still-unconsumed derived plan."""
    from new_data_pipeline_spark import registry
    from new_data_pipeline_spark.sources import tensorize

    spark.catalog.clearCache()
    tensorize.release_range_caches()
    after_release: list[int] = []
    for _ in range(3):
        for q in ("agg_weighted_median", "corpus_token_shards"):
            registry.QUERIES[q].fn(spark, SF_DIR) \
                .write.mode("overwrite").format("noop").save()
        # the handle the caller releases: after the consuming action,
        # every device-created cache must go away
        released = tensorize.release_range_caches()
        assert released >= 1, "devices must register their range caches"
        after_release.append(len(_persisted_infos(spark)))
    assert after_release[-1] <= after_release[0], (
        f"persisted blocks grew across repeated calls: {after_release}")
    spark.catalog.clearCache()


def test_release_range_caches_is_safe_before_and_after_consumption(spark):
    """Releasing AFTER consumption must not change results on a
    deterministic lineage; the tracker must also be idempotent."""
    from new_data_pipeline_spark.sources.tensorize import (
        grouped_running_sum, release_range_caches)

    spark.catalog.clearCache()
    release_range_caches()
    df = spark.createDataFrame(
        [(i % 2, i, i + 1) for i in range(50)], "g int, k int, v int")
    out = grouped_running_sum(df, "g", ["k"], "v", num_ranges=3)
    first = sorted(map(tuple, out.collect()))
    assert release_range_caches() >= 1
    assert release_range_caches() == 0  # idempotent
    # deterministic lineage: recompute after release matches
    assert sorted(map(tuple, out.collect())) == first
    spark.catalog.clearCache()
