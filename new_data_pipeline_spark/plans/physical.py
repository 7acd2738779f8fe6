"""Physical-layout strategies for 100 TB: bucketed co-located joins,
skew salting, and range-partitioned writes.

None of these change query RESULTS — they change where shuffles happen,
which is the difference between hours and minutes at scale. Tests
(tests/test_physical.py) assert the plan properties directly.

Reference contrast (SURVEY.md §4): the reference's entire physical
model is three daemon threads and two queues on one box
(reference serialize.py:403-405,622-634); these strategies are what
replaces it when the data no longer fits one box.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   *more_keys: str, n_buckets: int = 8) -> None:
    """Persist a table bucketed (hash-partitioned on disk) by the join
    key(s). Two tables bucketed the same way join WITHOUT a shuffle:
    each task reads matching bucket files from both sides. Bucket on
    EXACTLY the join keys — the planner's autoBucketedScan disables
    bucket-aware reads whose output partitioning doesn't line up with
    a downstream requirement.

    At 100 TB this is how the lineitem⋈orders join avoids re-shuffling
    600 GB per query: pay the shuffle once at write time, reuse forever.
    (saveAsTable because bucket metadata lives in the catalog.)
    """
    spark = df.sparkSession
    # The default catalog is per-session (in-memory) but the warehouse
    # directory persists — drop both the entry and any orphaned
    # location so re-runs don't hit LOCATION_ALREADY_EXISTS.
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    if wh:
        import shutil
        shutil.rmtree(os.path.join(wh, table_name.lower()),
                      ignore_errors=True)
    # r14: cluster rows by the bucket key before the write — a bucketBy
    # write emits one file per (task, bucket) pair, so an upstream plan
    # at session parallelism would scatter each bucket across ~32 tiny
    # files and the probe side would pay the per-file open cost forever
    # (guide §6 "small files hurt twice"). One narrow shuffle at write
    # time pins the layout to exactly one file per bucket.
    (df.repartition(n_buckets, key, *more_keys)
       .write.mode("overwrite")
       .bucketBy(n_buckets, key, *more_keys).sortBy(key, *more_keys)
       .format("parquet")
       .saveAsTable(table_name))


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  left_key: str, right_key: str) -> DataFrame:
    """Join two same-bucketed catalog tables; with matching bucket specs
    Catalyst plans SortMergeJoin with NO Exchange on either side."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])


def salted_join(left: DataFrame, right: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join: explode the small side n_salts×, salt
    the big side's key pseudo-randomly, join on (key, salt).

    A hot key (one user with 10% of all events) lands in ONE shuffle
    partition in a plain join; salting splits it across n_salts
    partitions. AQE's skew-join handles moderate skew automatically —
    salting is the explicit tool for the pathological tail. The salt is
    derived from stable columns (hash of all of them), not rand(), so
    results stay deterministic and retried tasks agree.
    """
    salt = (F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
            .cast("int"))
    salted_left = left.withColumn("__salt", salt)
    salted_right = (right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))))
    out = salted_left.join(salted_right,
                           on=[key, "__salt"], how=how)
    return out.drop("__salt")


def write_range_sorted(df: DataFrame, path: str, key: str,
                       n_files: int | None = None) -> None:
    """Range-partition + sort by key before writing so parquet row-group
    min/max stats prune key-range scans (the R3 batch-scan layout —
    each batch's key range maps to O(1) files)."""
    n = n_files or int(df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    (df.repartitionByRange(n, F.col(key))
       .sortWithinPartitions(key)
       .write.mode("overwrite").parquet(path))


def compact(spark: SparkSession, path: str, target_files: int,
            sort_within_by: str | None = None) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``target_files`` files (optionally sorted within each file so
    min/max footer stats stay selective). Returns the new file count.

    THE recurring operational job at scale — streaming sinks and
    per-partition appends accumulate thousands of KB-sized files, and
    scan cost becomes file-open-bound rather than byte-bound. The
    rewrite stages into a sibling directory then swaps, so a failure
    mid-rewrite never leaves the table truncated.
    """
    df = spark.read.parquet(path)
    out = df.coalesce(target_files)
    if sort_within_by:
        out = out.sortWithinPartitions(sort_within_by)
    staging = path.rstrip("/") + "__compacting"
    out.write.mode("overwrite").parquet(staging)
    _swap_in(path, staging, backup=path.rstrip("/") + "__precompact")
    return sum(1 for f in os.listdir(path)
               if f.endswith(".parquet") and not f.startswith("_"))


def _swap_in(path: str, staging: str, backup: str) -> None:
    """Replace ``path`` with ``staging``, restoring the original on any
    failure. The staging directory is verified (Spark's _SUCCESS marker
    plus ≥1 part file) BEFORE the original moves, and the backup is only
    discarded after the new directory is confirmed in place — so no
    crash point leaves the table missing or truncated."""
    import shutil
    entries = os.listdir(staging)
    if "_SUCCESS" not in entries or not any(
            f.endswith(".parquet") for f in entries):
        raise IOError(f"staging dir {staging} incomplete; table untouched")
    os.rename(path, backup)
    try:
        os.rename(staging, path)
    except BaseException:
        os.rename(backup, path)
        raise
    shutil.rmtree(backup)


def delete_rows(spark: SparkSession, path: str, predicate: str) -> int:
    """Targeted deletion (GDPR/right-to-be-forgotten): rewrite the
    parquet directory WITHOUT rows matching ``predicate``; returns the
    number of rows deleted. Copy-on-write semantics — the same
    staging-then-swap discipline as ``compact`` keeps readers
    consistent and a mid-job failure harmless.

    At 100 TB the rewrite is limited to affected partitions/files
    (parquet footer min/max prunes untouched files); on a table format
    with deletion vectors (Delta/Iceberg) this becomes a metadata-only
    operation with the identical API.
    """
    df = spark.read.parquet(path)
    # coalesce(pred, false): rows where the predicate is NULL (e.g. a
    # NULL user_id under "user_id = 5") did NOT match and must be KEPT —
    # a bare NOT(pred) would silently delete them.
    keep = df.filter(f"NOT coalesce(({predicate}), false)")
    n_before = df.count()
    staging = path.rstrip("/") + "__deleting"
    keep.write.mode("overwrite").parquet(staging)
    _swap_in(path, staging, backup=path.rstrip("/") + "__predelete")
    return n_before - spark.read.parquet(path).count()


def runtime_bloom_pruned_join(fact: DataFrame, dim: DataFrame,
                              fact_key: str, dim_key: str,
                              how: str = "inner") -> DataFrame:
    """Semi-join reduction via Catalyst's runtime Bloom filter: a Bloom
    filter built from the (filtered) dim side's join keys is injected as
    a ``might_contain`` predicate on the fact side, dropping fact rows
    whose key cannot match BEFORE they are shuffled.

    At 100 TB this is the difference between shuffling all of lineitem
    and shuffling only the ~20% that survive a selective orders filter —
    the shuffle write (the scale bottleneck) shrinks by the dim filter's
    selectivity. Catalyst injects the filter only when the dim side is
    too big to broadcast BY SIZE (a broadcast join already avoids the
    fact-side shuffle — the MERGE hint alone does not trigger it) and
    the fact scan exceeds ``applicationSideScanSizeThreshold`` (default
    10 GB — correct at scale; tests lower both thresholds to exercise
    the rule on small data).

    Results are identical to a plain join — the Bloom filter admits
    false positives, never false negatives, and the join condition
    re-checks every surviving row.
    """
    spark = fact.sparkSession
    assert spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.enabled") == "true", \
        "runtime bloom filter injection is disabled in this session"
    return fact.hint("merge").join(dim, fact[fact_key] == dim[dim_key], how)


def executed_scan_filter_rows(df: DataFrame) -> list[tuple[str, int]]:
    """Post-execution metrics probe: walk the final (adaptive) physical
    plan and return ``(node_description, numOutputRows)`` for every scan
    and filter node. Lets tests assert a runtime filter actually DROPPED
    rows (filter output < scan output) rather than merely appearing in
    the plan text. Diagnostic-only — O(plan nodes) py4j calls."""
    plan = df._jdf.queryExecution().executedPlan()
    out: list[tuple[str, int]] = []

    def walk(node) -> None:
        name = node.nodeName()
        if "Scan" in name or name == "Filter":
            metrics = node.metrics()
            it = metrics.iterator()
            rows = None
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    rows = kv._2().value()
            if rows is not None:
                out.append((node.simpleString(200), int(rows)))
        for i in range(node.children().size()):
            walk(node.children().apply(i))
        for hidden in ("executedPlan", "plan"):  # AQE / QueryStageExec
            try:
                walk(getattr(node, hidden)())
            except Exception:
                pass

    walk(plan)
    return out


def morton_code(col_a: F.Column, col_b: F.Column, bits: int = 16) -> F.Column:
    """Interleave the low ``bits`` of two non-negative int columns into
    one Z-order (Morton) key: sorting by it clusters rows that are
    close in BOTH dimensions, so parquet min/max footers prune files
    for predicates on EITHER column — a 1-D sort only ever serves its
    own column. Inputs must already be scaled to comparable ranges
    (see write_morton_sorted) or the wider dimension dominates the
    interleave and the narrow one gets no clustering at all."""
    code = F.lit(0).cast("bigint")
    for i in range(bits):
        bit_a = F.shiftright(col_a.cast("bigint"), i).bitwiseAND(1)
        bit_b = F.shiftright(col_b.cast("bigint"), i).bitwiseAND(1)
        code = (code
                .bitwiseOR(F.shiftleft(bit_a, 2 * i))
                .bitwiseOR(F.shiftleft(bit_b, 2 * i + 1)))
    return code


def write_morton_sorted(df: DataFrame, path: str, col_a: str, col_b: str,
                        n_files: int = 16, bits: int = 16) -> None:
    """Z-order layout: normalize both columns onto the same ``bits``-bit
    grid (min/max scaling — the step Delta's OPTIMIZE ZORDER does with
    per-column range ids; skipping it makes the interleave
    value-range-biased), range-partition + sort by the Morton code,
    drop the code. File footers end up with tight bounding boxes in
    both dimensions, in stock parquet."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)).first()
    if lo_a is None or lo_b is None:  # empty input: nothing to cluster
        df.write.mode("overwrite").parquet(path)
        return
    grid = (1 << bits) - 1

    def scaled(c: str, lo, hi) -> F.Column:
        span = max(int(hi) - int(lo), 1)
        return (((F.col(c).cast("bigint") - F.lit(int(lo))) * grid)
                / F.lit(span)).cast("bigint")

    coded = df.withColumn(
        "__z", morton_code(scaled(col_a, lo_a, hi_a),
                           scaled(col_b, lo_b, hi_b), bits))
    (coded.repartitionByRange(n_files, F.col("__z"))
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode("overwrite").parquet(path))
