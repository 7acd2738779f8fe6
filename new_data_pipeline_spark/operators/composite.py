"""Composite analytical queries: multi-join + aggregate + top-k shapes
(TPC-H Q3/Q10-style) and plain sort/limit — the query patterns the
engine's operators compose into.

These exist to prove operator *composition* under one plan: Catalyst
must reorder joins, broadcast dims, partial-aggregate, and only then
top-k — the closest thing to a user's real workload in the suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.functions.exact import oracle_money
from new_data_pipeline_spark.registry import register

_REV = f"{oracle_money('l_extendedprice')} * (1 - {oracle_money('l_discount')})"


@register(
    "composite_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("composite", "topk"),
)
def composite_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers → unshipped order
    revenue → global top-10.

    Scale: both date filters push to the scans; the global LIMIT after
    ORDER BY plans as TakeOrderedAndProject — a per-partition top-k
    merge, never a full sort. Tiebreak (o_orderdate, l_orderkey) makes
    the cut deterministic for the hash gate.
    """
    customer, orders, lineitem = catalog.load_tables(
        spark, sf_dir, "customer", "orders", "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(12,2)")
           * (1 - F.col("l_discount").cast("decimal(12,2)")))
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp"))
        .join(lineitem.filter(
            F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")),
            F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "composite_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           n_name AS nation,
           COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("composite", "topk"),
)
def composite_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by returned-item revenue."""
    customer, orders, lineitem, nation = catalog.load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "nation")
    rev = (F.col("l_extendedprice").cast("decimal(12,2)")
           * (1 - F.col("l_discount").cast("decimal(12,2)")))
    return (
        customer
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem.filter(F.col("l_returnflag") == "R"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
        .select("c_custkey", "c_name", "revenue", "nation", "n_items")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "sort_limit_global",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tags=("sort", "limit"),
)
def sort_limit_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT → TakeOrderedAndProject (bounded-heap
    per partition + driver merge of k rows, not a cluster sort)."""
    orders = catalog.load(spark, sf_dir, "orders")
    return (orders.select("o_orderkey", "o_totalprice", "o_orderdate")
            .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
            .limit(25))


@register(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
    tags=("distinct",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projection (hash aggregate, map-side combined)."""
    return catalog.load(spark, sf_dir, "orders") \
        .select("o_orderstatus", "o_orderpriority").distinct()
