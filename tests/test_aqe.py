"""Adaptive Query Execution gate: the RUNTIME half of the optimizer
story (tests/test_cbo.py pins the compile-time half). A deliberately
skewed join must trigger AQE's skew-join split — visible as
``skew=true`` on the sort-merge join in the EXECUTED plan — and split
the hot partition into multiple reader slices, with results identical
to the non-adaptive run. At 100 TB this is the lever that keeps one
hot key from turning a 1000-executor join into a 1-straggler join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# thresholds scaled to test-sized data: a partition is "skewed" past
# 2x median AND 16 KB, and AQE aims for 8 KB advisory partitions.
# (Column pruning strips the string payload before the shuffle, so the
# hot partition is only tens of KB compressed — production defaults of
# 256 MB would never fire here.)
CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
        str(16 * 1024),
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(8 * 1024),
    # keep AQE from simply collapsing everything into one partition
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",   # force SMJ
    "spark.sql.shuffle.partitions": "8",
}


@pytest.fixture()
def aqe_session(spark):
    saved = {k: spark.conf.get(k, None) for k in CONFS}
    for k, v in CONFS.items():
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _skewed_frames(spark):
    """left: 200k rows, 90% on key 0 (one hot shuffle partition);
    right: 2k rows over 200 keys with enough payload to stay above
    the broadcast bar."""
    left = spark.range(0, 200_000).select(
        F.when(F.col("id") % 10 < 9, 0)
         .otherwise((F.col("id") % 200)).alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("pl"))
    right = spark.range(0, 2_000).select(
        (F.col("id") % 200).alias("k"),
        F.concat(F.lit("dim-"), F.col("id")).alias("pr"))
    return left, right


def test_aqe_splits_skewed_partition(aqe_session):
    spark = aqe_session

    # NOTE: the post-join aggregate must NOT group by the join key —
    # AQE refuses to split a skewed join whose output partitioning is
    # required downstream (the split would force an extra shuffle and
    # forceOptimizeSkewedJoin is off). A global aggregate needs a
    # different distribution, so the split is legal.
    def run():
        left, right = _skewed_frames(spark)
        return (left.join(right, "k")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.col("k")).alias("ks")))

    adaptive = run()
    rows = adaptive.collect()[0]
    executed = adaptive._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in executed, (
        "AQE did not mark the hot-key join as skewed:\n"
        + executed[:2000])

    # ground truth: 90% of left (key 0) matches its 10 right rows,
    # the uniform 10% matches 10 rows each
    assert rows["n"] == 180_000 * 10 + 20_000 * 10
    # and the adaptive result equals the non-adaptive one
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    plain = run().collect()[0]
    assert (plain["n"], plain["ks"]) == (rows["n"], rows["ks"])
