"""Cost-based optimization: table/column statistics driving physical
join strategy — the Catalyst scale lever that file-size heuristics
can't reach.

Without statistics, Spark estimates a Filter's output at its child's
size: a predicate that keeps ~10 of 15,000 orders still "weighs" the
whole table, so the planner sort-merge-joins a side that would fit in
one broadcast buffer. With ``spark.sql.cbo.enabled`` and ANALYZE'd
column stats, FilterEstimation turns the equality predicate into a
1/distinct-count selectivity, the filtered relation's estimated size
drops below ``autoBroadcastJoinThreshold``, and the same query plans
as a pure broadcast pipeline — no shuffle of the fact table at all.
At 100 TB that is the difference between shipping lineitem across the
cluster and shipping six rows to every executor.

The flip is asserted, not assumed: tests/test_cbo.py plans the same
3-table join with stats absent (sort-merge join present) and with
stats present (broadcast-only), and checks the answer is identical
both ways.

This module manages catalog-table twins of the parquet testdata
(ANALYZE needs catalog tables — path-based parquet relations carry no
stats entry for it to update).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog

DB = "ndp_cbo"


def register_catalog_tables(spark: SparkSession, sf_dir: str,
                            tables: tuple[str, ...] = (
                                "customer", "orders", "lineitem"),
                            db: str = DB) -> None:
    """Materialize catalog-table twins of the given parquet tables
    (idempotent overwrite)."""
    import shutil

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    for t in tables:
        # the in-memory catalog forgets tables between sessions but
        # their managed locations survive on disk; clear both so the
        # rebuild is truly idempotent
        spark.sql(f"DROP TABLE IF EXISTS {db}.{t}")
        leftover = f"{warehouse.removeprefix('file:')}/{db}.db/{t}"
        shutil.rmtree(leftover, ignore_errors=True)
        (catalog.load(spark, sf_dir, t)
         .write.mode("overwrite").format("parquet")
         .saveAsTable(f"{db}.{t}"))


# Columns the demo query touches. TIMESTAMP_NTZ columns are EXCLUDED
# on purpose: Spark's estimation code MatchErrors on TimestampNTZType
# column stats (scala.MatchError in the optimizer once an NTZ column
# carries a ColumnStat), and the testdata timestamps are NTZ — so stats
# are collected per-column, never FOR ALL COLUMNS.
ANALYZE_COLUMNS: dict[str, str] = {
    "orders": "o_orderkey, o_custkey, o_totalprice",
    "lineitem": "l_orderkey, l_extendedprice, l_discount",
    "customer": "c_custkey, c_mktsegment",
}


def analyze_columns(spark: SparkSession,
                    tables: tuple[str, ...] = (
                        "customer", "orders", "lineitem"),
                    db: str = DB) -> None:
    """Collect table + per-column statistics (row counts, distinct
    counts, min/max, null counts) — the input FilterEstimation and
    JoinEstimation need."""
    for t in tables:
        spark.sql(f"ANALYZE TABLE {db}.{t} COMPUTE STATISTICS "
                  f"FOR COLUMNS {ANALYZE_COLUMNS[t]}")


def pinpoint_order_revenue(spark: SparkSession, custkey: int,
                           db: str = DB) -> DataFrame:
    """3-table join whose best plan hinges on filter-selectivity
    estimation: orders is filtered to one customer key (~10 of 15,000
    rows), joined to lineitem (the fact table) and customer."""
    orders = spark.table(f"{db}.orders").filter(
        F.col("o_custkey") == custkey)
    lineitem = spark.table(f"{db}.lineitem")
    customer = spark.table(f"{db}.customer")
    return (lineitem
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(customer, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))
