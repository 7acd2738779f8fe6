"""Oracle-gated batch twin for the ACID change-data-feed
(sources/acid.changes): build a transactional table through a
deterministic create → append → copy-on-write-delete history, then
answer an aggregate over the version-to-version CDF. The oracle
recomputes the logical insert/delete sets directly from the source
table, so a hash match proves the file-diff CDF derivation (including
rewrite-survivor cancellation) reproduces the true row-level history.

History (all predicates on l_orderkey so the oracle can replay them):
  v1  create  = lineitem rows with l_orderkey % 4 IN (0, 1)
  v2  append  = rows with l_orderkey % 4 = 2
  v3  delete  WHERE l_orderkey % 8 = 1   (hits only v1 rows: the
      appended rows have orderkey % 8 IN {2, 6})
CDF(v1 → v3) must therefore be: inserts = the whole appended set,
deletes = the % 8 = 1 subset — anything else (lost rows, phantom
rewrite survivors) breaks the hash.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.functions.exact import money
from new_data_pipeline_spark.registry import register
from new_data_pipeline_spark.sources import acid


@register(
    "acid_change_data_feed",
    oracle="""
    WITH src AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_extendedprice AS DECIMAL(12,2)) AS price
      FROM lineitem
    ), changed AS (
      SELECT 'insert' AS change_type, * FROM src
      WHERE l_orderkey % 4 = 2
      UNION ALL
      SELECT 'delete', * FROM src
      WHERE l_orderkey % 4 IN (0, 1) AND l_orderkey % 8 = 1
    )
    SELECT change_type,
           COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS total_price
    FROM changed
    GROUP BY change_type
    """,
    tags=("acid", "cdf", "versioning"),
)
def acid_change_data_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate the insert/delete feed between the post-create and
    post-delete snapshots of a freshly built transactional table."""
    # pid in the token (ADVICE r10): a path keyed only by sf_dir lets
    # concurrent runs on the same sf_dir rmtree each other's live
    # table mid-query; atexit reclaims the per-pid dir (the
    # acid_sink.py convention). Same-process reruns still reuse one.
    token = hashlib.md5(
        f"cdf:{sf_dir}:{os.getpid()}".encode()).hexdigest()[:12]
    table = os.path.join(tempfile.gettempdir(), f"ndp_cdf_{token}")
    shutil.rmtree(table, ignore_errors=True)  # rerun isolation
    atexit.register(shutil.rmtree, table, ignore_errors=True)

    li = catalog.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        money("l_extendedprice").alias("price"))
    v1 = acid.create_or_overwrite(
        li.filter(F.col("l_orderkey") % 4 <= 1), table)
    acid.append(li.filter(F.col("l_orderkey") % 4 == 2), table)
    v3 = acid.delete_where(spark, table, "l_orderkey % 8 = 1")

    return (acid.changes(spark, table, v1, v3)
            .groupBy(F.col("_change_type").alias("change_type"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.countDistinct("l_orderkey").cast("bigint")
                 .alias("n_orders"),
                 F.sum("price").cast("double").alias("total_price")))


@register(
    "store_merge_upsert",
    oracle="""
    WITH target AS (
      SELECT c_custkey AS custkey, c_mktsegment AS segment,
             CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      FROM customer
    ), urgent AS (
      SELECT o_custkey AS custkey,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend
      FROM orders WHERE o_orderpriority = '1-URGENT'
      GROUP BY o_custkey
    ), upd AS (
      SELECT t.custkey, t.segment, CAST(t.bal + u.spend AS DECIMAL(12,2))
        AS bal
      FROM target t JOIN urgent u ON t.custkey = u.custkey
    ), ins AS (
      SELECT custkey + 1000000000 AS custkey,
             'MERGED_NEW' AS segment, CAST(0.00 AS DECIMAL(12,2)) AS bal
      FROM target WHERE custkey % 97 = 0
    ), updates AS (
      SELECT * FROM upd UNION ALL SELECT * FROM ins
    ), merged AS (
      SELECT t.* FROM target t
      WHERE t.custkey NOT IN (SELECT custkey FROM updates)
      UNION ALL
      SELECT * FROM updates
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT custkey) AS BIGINT) AS n_customers,
           CAST(SUM(bal) AS DOUBLE) AS total_bal
    FROM merged GROUP BY segment ORDER BY segment
    """,
    tags=("acid", "merge", "upsert"),
)
def store_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO end to end: seed a transactional table from customer,
    build a deterministic update batch (matched rows: balance bumped by
    the customer's URGENT-order spend; new rows: offset-keyed inserts
    for custkey % 97 = 0), run the copy-on-write file-granular upsert
    (acid.merge_upsert), and aggregate the POST-MERGE table per
    segment. The oracle replays the merge relationally
    (anti-join ∪ updates), so a hash match proves the file rewrite
    lost no survivor, duplicated no key, and applied every update —
    the row-level invariants a Delta MERGE is specified by."""
    # pid-keyed + atexit-reclaimed, mirroring acid_change_data_feed
    # above (ADVICE r10: concurrent runs must not share a live table).
    token = hashlib.md5(
        f"merge:{sf_dir}:{os.getpid()}".encode()).hexdigest()[:12]
    table = os.path.join(tempfile.gettempdir(), f"ndp_merge_{token}")
    shutil.rmtree(table, ignore_errors=True)  # rerun isolation
    atexit.register(shutil.rmtree, table, ignore_errors=True)

    cust = catalog.load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        money("c_acctbal").alias("bal"))
    acid.create_or_overwrite(cust, table)

    orders = catalog.load(spark, sf_dir, "orders")
    urgent = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
              .groupBy(F.col("o_custkey").alias("custkey"))
              .agg(F.sum(money("o_totalprice")).alias("spend")))
    upd = (cust.join(urgent, "custkey")
           .select("custkey", "segment",
                   (F.col("bal") + F.col("spend"))
                   .cast("decimal(12,2)").alias("bal")))
    ins = (cust.filter(F.col("custkey") % 97 == 0)
           .select((F.col("custkey") + 1000000000).alias("custkey"),
                   F.lit("MERGED_NEW").alias("segment"),
                   F.lit("0.00").cast("decimal(12,2)").alias("bal")))
    acid.merge_upsert(spark, upd.unionByName(ins), table, ["custkey"])

    return (acid.read(spark, table)
            .groupBy("segment")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                 F.countDistinct("custkey").cast("bigint")
                 .alias("n_customers"),
                 F.sum("bal").cast("double").alias("total_bal"))
            .orderBy("segment"))
