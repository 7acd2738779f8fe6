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


@register(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t2, MIN(v.t1) AS t1
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t3, MIN(c.t2) AS t2
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT '1_view' AS stage, COUNT(*) AS n_users,
           CAST(NULL AS BIGINT) AS total_secs_from_prev
    FROM v
    UNION ALL
    SELECT '2_click', COUNT(*),
           CAST(SUM(date_diff('second', t1, t2)) AS BIGINT)
    FROM c
    UNION ALL
    SELECT '3_purchase', COUNT(*),
           CAST(SUM(date_diff('second', t2, t3)) AS BIGINT)
    FROM p
    """,
    tags=("composite", "funnel", "pipeline"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: users whose
    first 'view' precedes a 'click' that precedes a 'purchase', with
    per-stage user counts and total seconds spent between stages.

    Each stage is min-per-user of events strictly after the previous
    stage's timestamp — the sequential-pattern query behind every
    conversion / drop-off dashboard. Time deltas are whole seconds
    (unix_timestamp truncation == DuckDB second-boundary date_diff), so
    the sums are exact integers. Scale notes: all three stages group
    and join on user_id, so one hash-partitioning of events by user_id
    serves every stage (exchange reuse); each stage's output is one
    row per converting user, strictly shrinking, and the stage joins
    flip to broadcast under AQE as the funnel narrows.
    """
    events = catalog.load(spark, sf_dir, "events")

    v = (events.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    c = (events.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(F.col("ts") > F.col("t1"))
         .groupBy("user_id")
         .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1")))
    p = (events.filter(F.col("event_type") == "purchase")
         .join(c.select("user_id", "t2"), "user_id")
         .filter(F.col("ts") > F.col("t2"))
         .groupBy("user_id")
         .agg(F.min("ts").alias("t3"), F.min("t2").alias("t2")))

    secs = lambda a, b: F.unix_timestamp(b) - F.unix_timestamp(a)
    s1 = v.agg(F.lit("1_view").alias("stage"),
               F.count(F.lit(1)).alias("n_users"),
               F.lit(None).cast("bigint").alias("total_secs_from_prev"))
    s2 = c.agg(F.lit("2_click").alias("stage"),
               F.count(F.lit(1)).alias("n_users"),
               F.sum(secs("t1", "t2")).alias("total_secs_from_prev"))
    s3 = p.agg(F.lit("3_purchase").alias("stage"),
               F.count(F.lit(1)).alias("n_users"),
               F.sum(secs("t2", "t3")).alias("total_secs_from_prev"))
    return s1.unionByName(s2).unionByName(s3)
