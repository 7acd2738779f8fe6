"""Plan-property tests for the physical-layout strategies: bucketed
joins must not shuffle, salted joins must produce identical results to
plain joins while splitting hot keys."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.plans import physical
from tests.conftest import SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _ancestors_of_scan(df, token: str) -> list[str]:
    """nodeNames from the parquet scan whose description contains
    ``token`` up to the plan root (leaf first, scan itself excluded),
    walked on the REAL JVM plan tree. The former text walk parsed
    ``explain`` indentation, which breaks when a cached subtree embeds
    its own nested AQE plan dump (``== Initial Plan ==`` blocks inside
    ``InMemoryRelation`` re-start indentation mid-listing); here cached
    relations are leaves and cannot mislead the ancestry."""

    def unwrap(node):
        if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            return unwrap(node.initialPlan())
        return node

    def find(node, path):
        node = unwrap(node)
        kids = node.children()
        n = kids.length()
        if n == 0:
            # match file scans only: InMemoryTableScan leaves print their
            # whole cached plan via innerChildren and could false-match
            if (node.getClass().getSimpleName() == "FileSourceScanExec"
                    and token in node.toString()):
                return path
            return None
        for i in range(n):
            r = find(kids.apply(i), path + [node])
            if r is not None:
                return r
        return None

    path = find(df._jdf.queryExecution().executedPlan(), [])
    assert path is not None, f"no parquet scan containing {token!r} in plan"
    return [n.nodeName() for n in reversed(path)]


def test_bucketed_join_has_no_exchange(spark):
    orders = catalog.load(spark, SF_DIR, "orders")
    lineitem = catalog.load(spark, SF_DIR, "lineitem") \
        .select("l_orderkey", "l_quantity", "l_extendedprice")
    physical.write_bucketed(orders, "orders_b", "o_orderkey")
    physical.write_bucketed(lineitem, "lineitem_b", "l_orderkey")

    # at bench scale the planner prefers broadcast (which ignores
    # buckets); disable it to exercise the big-big case bucketing is
    # FOR — at 100 TB neither side broadcasts.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = physical.bucketed_join(spark, "lineitem_b", "orders_b",
                                        "l_orderkey", "o_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, \
            "same-bucketed tables must join shuffle-free"
        # and the result is the same as the plain join
        plain = lineitem.join(orders,
                              lineitem.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_join_matches_plain_join(spark):
    events = catalog.load(spark, SF_DIR, "events") \
        .select("user_id", "event_id", "value")
    users = (events.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_events")))
    plain = events.join(users, "user_id")
    salted = physical.salted_join(events, users, "user_id", n_salts=4)
    assert salted.count() == plain.count()
    a = {(r["event_id"], r["n_events"]) for r in plain.collect()}
    b = {(r["event_id"], r["n_events"]) for r in salted.collect()}
    assert a == b


def test_salted_join_splits_hot_key(spark):
    """The hot key's rows must spread across multiple salt values."""
    events = catalog.load(spark, SF_DIR, "events") \
        .select("user_id", "event_id", "value")
    salt = F.pmod(F.hash(*[F.col(c) for c in events.columns]), F.lit(4))
    hot = (events.withColumn("__salt", salt)
           .groupBy("user_id", "__salt").count()
           .groupBy("user_id").count()
           .agg(F.max("count").alias("max_salts")).collect()[0])
    assert hot["max_salts"] >= 3, "salting failed to spread a hot key"


def test_range_sorted_write_prunes(spark, tmp_path):
    df = catalog.load(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_ranged")
    physical.write_range_sorted(df, out, "doc_id", n_files=8)
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    # key-range predicate reads a subset of files via min/max pruning;
    # correctness check (pruning itself shows as scan metrics, not plan)
    assert back.filter(F.col("doc_id") < 10).count() == \
        df.filter(F.col("doc_id") < 10).count()


def test_date_partitioned_write_prunes_directories(spark, tmp_path):
    """Hive-style partitionBy layout: a partition-key predicate must
    prune directories at planning time (PartitionFilters in the scan),
    not read-and-filter — the difference between scanning one day and
    scanning 100 TB."""
    events = catalog.load(spark, SF_DIR, "events")
    out = str(tmp_path / "events_by_day")
    (events.withColumn("day", F.to_date("ts"))
     .write.mode("overwrite").partitionBy("day").parquet(out))
    back = spark.read.parquet(out)
    one_day = back.filter(F.col("day") == "1995-03-15")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_day.explain("formatted")
    p = buf.getvalue()
    assert "PartitionFilters" in p and "day" in p.split("PartitionFilters", 1)[1], \
        "partition-key predicate must prune at the directory level"
    want = events.filter(F.to_date("ts") == "1995-03-15").count()
    assert one_day.count() == want


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    events = catalog.load(spark, SF_DIR, "events")
    out = str(tmp_path / "many_small")
    events.repartition(32).write.mode("overwrite").parquet(out)
    import os
    n_before = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
    assert n_before >= 32
    n_after = physical.compact(spark, out, target_files=4,
                               sort_within_by="ts")
    assert n_after <= 4
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    # sorted-within-file: ts min/max footers stay selective
    assert back.select(F.min("ts")).first()[0] == \
        events.select(F.min("ts")).first()[0]


def test_targeted_deletion_rewrite(spark, tmp_path):
    """Right-to-be-forgotten: delete one user's rows via copy-on-write
    rewrite; everything else survives byte-identical."""
    events = catalog.load(spark, SF_DIR, "events")
    out = str(tmp_path / "events_del")
    events.write.mode("overwrite").parquet(out)
    victim = events.select("user_id").first()[0]
    n_victim = events.filter(F.col("user_id") == victim).count()
    assert n_victim > 0
    n_deleted = physical.delete_rows(spark, out, f"user_id = {victim}")
    assert n_deleted == n_victim
    back = spark.read.parquet(out)
    assert back.filter(F.col("user_id") == victim).count() == 0
    assert back.count() == events.count() - n_victim


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Column-added schema evolution: a table directory whose newer
    files carry an extra column must read as the union schema with
    nulls for old files (mergeSchema) — the ingest reality when an
    upstream adds a field mid-stream."""
    base = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    v1.write.parquet(base + "/batch=1")
    v2 = spark.createDataFrame([(3, "c", 9.5)], "k long, v string, score double")
    v2.write.parquet(base + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"k", "v", "score", "batch"}
    rows = {r["k"]: r["score"] for r in merged.collect()}
    assert rows[3] == 9.5 and rows[1] is None and rows[2] is None


def _files_pruned_by(path, col, value):
    """Fraction of parquet files whose [min,max] footer stats exclude
    ``col = value`` — what a reader's file-level pruning skips."""
    import os
    import pyarrow.parquet as pq
    files = [os.path.join(path, f) for f in os.listdir(path)
             if f.endswith(".parquet")]
    pruned = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo = min(md.row_group(i).column(
            next(j for j in range(md.num_columns)
                 if md.row_group(i).column(j).path_in_schema == col)).statistics.min
            for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(
            next(j for j in range(md.num_columns)
                 if md.row_group(i).column(j).path_in_schema == col)).statistics.max
            for i in range(md.num_row_groups))
        if value < lo or value > hi:
            pruned += 1
    return pruned / len(files)


def test_morton_layout_prunes_both_dimensions(spark, tmp_path):
    """Z-order write: footer stats must prune files for predicates on
    EITHER interleaved column; a 1-D sort serves only its own column."""
    orders = catalog.load(spark, SF_DIR, "orders")
    zpath = str(tmp_path / "orders_z")
    physical.write_morton_sorted(orders, zpath, "o_custkey", "o_orderkey",
                                 n_files=16)
    lpath = str(tmp_path / "orders_linear")
    physical.write_range_sorted(orders, lpath, "o_custkey", n_files=16)

    probe = orders.select("o_custkey", "o_orderkey").first()
    ck, ok = probe["o_custkey"], probe["o_orderkey"]
    z_ck, z_ok = (_files_pruned_by(zpath, "o_custkey", ck),
                  _files_pruned_by(zpath, "o_orderkey", ok))
    l_ok = _files_pruned_by(lpath, "o_orderkey", ok)
    # Z-order serves both dimensions. Threshold has slack below the
    # ~0.75 ideal: repartitionByRange samples its boundaries with an
    # RDD-id-derived seed, so the file split varies run to run and a
    # tight bound flakes inside the full suite.
    assert z_ck >= 0.3 and z_ok >= 0.3, (z_ck, z_ok)
    # ...whereas the 1-D layout cannot prune the other column
    assert l_ok <= z_ok
    # and rows are intact
    assert spark.read.parquet(zpath).count() == orders.count()


def test_runtime_bloom_filter_prunes_fact_rows(spark):
    """Bloom-filter semi-join reduction: the runtime filter must appear
    in the executed plan AND demonstrably drop fact rows before the
    shuffle, with results identical to the plain join."""
    lineitem = catalog.load(spark, SF_DIR, "lineitem") \
        .select("l_orderkey", "l_extendedprice")
    orders = catalog.load(spark, SF_DIR, "orders")
    dim = orders.filter(F.col("o_orderpriority") == "1-URGENT") \
        .select("o_orderkey")

    # at 100 TB the 10 GB application-side default is right; here the
    # fact scan is a few MB, so lower it to exercise the injection rule
    conf = "spark.sql.optimizer.runtime.bloomFilter." \
           "applicationSideScanSizeThreshold"
    old = spark.conf.get(conf)
    spark.conf.set(conf, "0")
    # Catalyst skips injection when the creation side is small enough to
    # broadcast (a broadcast join needs no fact-side shuffle to prune);
    # disable broadcast to model the at-scale case the rule exists for
    bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = physical.runtime_bloom_pruned_join(
            lineitem, dim, "l_orderkey", "o_orderkey")
        agg = joined.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_extendedprice").alias("rev"))
        [got] = agg.collect()

        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected"

        rows = physical.executed_scan_filter_rows(agg)
        scan = max(n for d, n in rows if "lineitem" in d and "Scan" in d)
        bloomed = min(n for d, n in rows if "might_contain" in d)
        assert bloomed < scan, (
            f"bloom filter dropped nothing: {bloomed} of {scan} rows")
    finally:
        spark.conf.set(conf, old)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)

    # identical results without the bloom (false positives re-checked)
    [want] = lineitem.join(dim,
                           lineitem.l_orderkey == dim.o_orderkey) \
        .groupBy().agg(F.count(F.lit(1)).alias("n"),
                       F.sum("l_extendedprice").alias("rev")).collect()
    assert got["n"] == want["n"]
    assert abs(got["rev"] - want["rev"]) < 1e-6 * abs(want["rev"])


def test_lsh_index_probe_scans_shuffle_free(spark):
    """dedup_lsh_bucketed_probe: the persisted band index (bucketed by
    the probe join keys) must be read bucket-aware and probed WITHOUT
    an exchange above its scan — only the O(delta) probe side may
    shuffle. The tree walk asserts the scan's parent chain up to its
    SortMergeJoin contains no Exchange."""
    from new_data_pipeline_spark.operators import dedup

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = dedup.dedup_lsh_bucketed_probe(spark, SF_DIR)
        plan = _plan(df)
        assert "Bucketed: true" in plan and "SelectedBucketsCount" in plan, \
            "index scan must be bucket-aware"
        # JVM-tree walk: every ancestor of the index scan up to its first
        # SortMergeJoin must not be an Exchange
        for name in _ancestors_of_scan(df, "ndp_b_lshidx"):
            assert "Exchange" not in name, \
                f"exchange above the bucketed index scan: {name}"
            if "SortMergeJoin" in name:
                break
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_ivf_index_probe_scans_shuffle_free(spark):
    """sim_ivf_bucketed_probe (VERDICT r8 #5): the persisted IVF cell
    index (bucketed by cell, the probe join key) must be read
    bucket-aware and joined WITHOUT an exchange above its scan — only
    the O(queries·nprobe) probe side may shuffle. Same tree walk as the
    LSH probe assert."""
    from new_data_pipeline_spark.operators import similarity

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = similarity.sim_ivf_bucketed_probe(spark, SF_DIR)
        plan = _plan(df)
        assert "Bucketed: true" in plan and "SelectedBucketsCount" in plan, \
            "IVF index scan must be bucket-aware"
        for name in _ancestors_of_scan(df, "ndp_b_ivfidx"):
            assert "Exchange" not in name, \
                f"exchange above the bucketed IVF index scan: {name}"
            if "SortMergeJoin" in name:
                break
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_ivfpq_index_probe_scans_shuffle_free(spark):
    """sim_ivfpq_bucketed_probe (VERDICT r8 #5, PQ half): the persisted
    PQ-code index (one row per vector, bucketed by cell) must be read
    bucket-aware and joined WITHOUT an exchange above its scan."""
    from new_data_pipeline_spark.operators import pq

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = pq.sim_ivfpq_bucketed_probe(spark, SF_DIR)
        plan = _plan(df)
        assert "Bucketed: true" in plan and "SelectedBucketsCount" in plan, \
            "IVF-PQ index scan must be bucket-aware"
        for name in _ancestors_of_scan(df, "ndp_b_ivfpqidx"):
            assert "Exchange" not in name, \
                f"exchange above the bucketed IVF-PQ index scan: {name}"
            if "SortMergeJoin" in name:
                break
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_sweep_stale_bucketed_age_gate(spark, tmp_path):
    """The warehouse sweep (ADVICE r8) must NOT collect a fresh
    (recently-written, possibly concurrent-session) table dir, and MUST
    collect one older than the age threshold."""
    import os
    import time

    from new_data_pipeline_spark.plans.layout_queries import (
        SWEEP_MIN_AGE_S, _sweep_stale_bucketed)

    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    fresh = os.path.join(wh, "ndp_b_sweeptest_fresh")
    stale = os.path.join(wh, "ndp_b_sweeptest_stale")
    os.makedirs(fresh, exist_ok=True)
    os.makedirs(stale, exist_ok=True)
    old = time.time() - SWEEP_MIN_AGE_S - 60
    os.utime(stale, (old, old))
    _sweep_stale_bucketed(spark, keep=set(),
                          prefixes=("ndp_b_sweeptest_",))
    try:
        assert os.path.isdir(fresh), "fresh table dir must survive sweep"
        assert not os.path.isdir(stale), "stale table dir must be swept"
    finally:
        import shutil
        shutil.rmtree(fresh, ignore_errors=True)
        shutil.rmtree(stale, ignore_errors=True)


def test_pq_index_probe_aggregates_shuffle_free(spark):
    """sim_pq_bucketed_probe (VERDICT r9 #4): the persisted PQ code
    table (one row per vector, bucketed by candidate_id) must be read
    bucket-aware, and NO exchange may sit between its scan and the
    per-candidate partial-sum aggregation — HashPartitioning
    (candidate_id) satisfies the groupBy(query_id, candidate_id, label)
    clustered distribution through the posexplode and the broadcast
    ADC-table join. Only the final top-k window (tiny ranked candidate
    set) may shuffle, which is ABOVE the final HashAggregate."""
    from new_data_pipeline_spark.operators import pq

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = pq.sim_pq_bucketed_probe(spark, SF_DIR)
        plan = _plan(df)
        assert "Bucketed: true" in plan, \
            "PQ code-table scan must be bucket-aware"
        aggs_seen = 0
        for name in _ancestors_of_scan(df, "ndp_b_pqidx"):
            assert "Exchange" not in name, \
                f"exchange below the per-candidate aggregate: {name}"
            if "HashAggregate" in name:
                aggs_seen += 1
                if aggs_seen == 2:  # partial + final — stop here
                    break
        assert aggs_seen == 2, \
            "expected partial+final HashAggregate above the index scan"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_market_basket_scans_lineitem_once(spark):
    """Pairs, item counts, and the basket count all derive from ONE
    persisted basket frame — the physical plan must contain exactly one
    lineitem parquet scan (the other consumers read the InMemory
    cache)."""
    import new_data_pipeline_spark as engine
    engine.load_all()
    df = engine.QUERIES["ml_market_basket_lift"].fn(spark, SF_DIR)
    try:
        plan = _plan(df)
        scans = plan.count("lineitem.parquet")
        cached = plan.count("InMemoryTableScan")
        assert scans <= 1, f"{scans} lineitem scans:\n{plan}"
        assert cached >= 2, f"expected cached basket reuse:\n{plan}"
    finally:
        spark.catalog.clearCache()


def test_ols_is_a_single_aggregate_pass(spark):
    """The whole OLS fit is one partial+final aggregate over lineitem:
    exactly one Exchange in the plan (the 3-group shuffle); the Cramer
    solve adds projections, never another shuffle."""
    import new_data_pipeline_spark as engine
    engine.load_all()
    df = engine.QUERIES["ml_ols_regression"].fn(spark, SF_DIR)
    plan = _plan(df)
    # formatted plans list each node twice (tree + details): count the
    # numbered detail entries. Allowed: the 3-group shuffle + the final
    # orderBy's range exchange.
    import re
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_ex <= 2, f"{n_ex} exchanges:\n{plan}"
    assert "HashAggregate" in plan


def test_sparse_retrieval_probe_is_broadcast_no_cartesian(spark):
    """The retrieval pair's docstring claims made plan properties: the
    query-postings probe must be a BroadcastHashJoin (the |queries|-
    sized side moves, never the posting lists) and no stage may plan a
    CartesianProduct — candidates only materialize through the term
    equi-join."""
    from new_data_pipeline_spark.operators.sparse_retrieval import (
        text_bm25_retrieval, text_tfidf_retrieval)

    for fn in (text_tfidf_retrieval, text_bm25_retrieval):
        plan = _plan(fn(spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
    spark.catalog.clearCache()


def test_kmeans_lloyd_assignments_are_hash_aggregated(spark):
    """Both Lloyd rounds' argmax must stay the map-side max_by
    aggregate (never a window over the N·C fan-out), and the update
    must not introduce a cartesian stage."""
    from new_data_pipeline_spark.operators.clustering import (
        cluster_kmeans_lloyd)

    plan = _plan(cluster_kmeans_lloyd(spark, SF_DIR))
    assert "max_by" in plan
    assert "CartesianProduct" not in plan
    spark.catalog.clearCache()


def test_temperature_mixture_coin_scan_is_broadcast(spark):
    """The docstring's scale claim made a plan property: the corpus
    coin scan joins the |sources|-sized quota table via
    BroadcastHashJoin (the corpus side never shuffles for the join) and
    nothing plans a CartesianProduct. The |sources|-sized quota
    cross-join against the single-row total IS allowed to broadcast-
    nest (it is O(sources))."""
    import new_data_pipeline_spark as engine
    engine.load_all()
    plan = _plan(engine.QUERIES["sample_temperature_mixture"]
                 .fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    spark.catalog.clearCache()


def test_video_i420_is_single_pass_no_shuffle(spark):
    """The i420 gate's scale contract as a plan property: one parquet
    scan pruned to doc_id feeding MapInPandas — zero Exchanges, so
    decode parallelism IS scan parallelism (round 13)."""
    import re

    import new_data_pipeline_spark as engine
    engine.load_all()
    plan = _plan(engine.QUERIES["multimodal_video_i420"]
                 .fn(spark, SF_DIR))
    assert "MapInPandas" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
    assert "ReadSchema: struct<doc_id:bigint>" in plan, (
        "payload-free scan lost its column pruning")
    spark.catalog.clearCache()


def test_serve_batches_broadcasts_index_sides(spark):
    """The serving gate's per-batch plan: centroid scoring broadcasts
    the C-row centroid frame (never shuffles the batch against it) and
    nothing plans a CartesianProduct; the 4 batch subtrees read the
    eager-filled persisted index (InMemoryTableScan), not 4 rebuilds
    (round 13)."""
    import new_data_pipeline_spark as engine
    engine.load_all()
    plan = _plan(engine.QUERIES["sim_ivf_serve_batches"]
                 .fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan
    assert "InMemoryTableScan" in plan
    spark.catalog.clearCache()
