"""TPC-H-shaped analytical suite adapted to the testdata schema.

The reference has no relational query surface (its closest analogs are
key-aligned stream zips, reference serialize.py:731-795, and the binding
join, serialize.py:544-580); these queries are the capability-extension
benchmark shapes (SURVEY.md §2.2) a user of a general analytics engine
runs daily. Each is the standard TPC-H query re-targeted at the reduced
testdata schema (no partsupp table; no l_shipmode/l_commitdate/c_phone
columns — predicates are substituted with available columns, shapes kept).

Scale notes common to the suite: every date/brand/segment predicate is a
plain column comparison so it reaches the parquet scan (PushedFilters);
dimension tables (nation/region/part at its real-world size) broadcast;
the big fact-fact joins (lineitem⋈orders) shuffle on the join key, which
at 100 TB is the bucketing key for both tables, making them co-located
zero-shuffle joins. Aggregates are exact-decimal for money (see
functions/exact.py) — required for hash parity AND the correct semantics
at billions of rows where double sums drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.functions.exact import money, oracle_money
from new_data_pipeline_spark.registry import register

_REV = f"{oracle_money('l_extendedprice')} * (1 - {oracle_money('l_discount')})"


def _rev() -> F.Column:
    return money("l_extendedprice") * (1 - money("l_discount"))


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("composite", "semi-join", "exists"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: priority distribution of orders having a slow lineitem
    (shipped >60 days after order; stands in for commitdate<receiptdate).

    EXISTS plans as a left-semi hash join; the quarter predicate prunes
    orders at the scan before the join.
    """
    orders, lineitem = catalog.load_tables(spark, sf_dir, "orders", "lineitem")
    quarter = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp")))
    slow = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    return (quarter.join(lineitem, slow, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM({oracle_money('l_extendedprice')}
                    * {oracle_money('l_discount')}) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("composite", "scan-agg"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure scan→filter→global agg. The whole WHERE clause reaches
    the parquet reader as PushedFilters; no shuffle beyond the final
    single-row partial-agg merge."""
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    return (lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24))
        .agg(F.sum(money("l_extendedprice") * money("l_discount"))
             .cast("double").alias("revenue")))


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS INT) AS l_year,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("composite", "multi-join"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations by year.

    The same dimension table joined twice under different roles — n1
    keyed by supplier nation, n2 by customer nation — both broadcast
    (25 rows at any scale factor). The disjunctive nation pair filter
    applies after both joins; Catalyst pushes each half to the
    respective broadcast build side where possible.
    """
    supplier, lineitem, orders, customer, nation = catalog.load_tables(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"),
                       F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")) | \
           ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        supplier
        .join(lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))),
            F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev
                         ELSE CAST(0.00 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(SUM(rev) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
             {_REV} AS rev,
             n1.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region    ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("composite", "multi-join", "conditional-agg"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of a region's ECONOMY-part revenue
    by order year — an 8-table join tree feeding a conditional-aggregate
    ratio. Share = exact-decimal numerator / exact-decimal denominator,
    divided once in double (deterministic across engines)."""
    part, lineitem, orders, customer, supplier, nation, region = \
        catalog.load_tables(spark, sf_dir, "part", "lineitem", "orders",
                            "customer", "supplier", "nation", "region")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"),
                       F.col("n_regionkey").alias("n2_region"))
    joined = (
        part.filter(F.col("p_type") == "ECONOMY")
        .join(lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))),
            F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
              F.col("n2_region") == F.col("r_regionkey"))
        .select(F.year("o_orderdate").alias("o_year"),
                _rev().alias("rev"), "supp_nation")
    )
    target = F.when(F.col("supp_nation") == "NATION_3", F.col("rev")) \
        .otherwise(F.lit("0.00").cast("decimal(12,2)"))
    return (joined.groupBy("o_year")
            .agg((F.sum(target).cast("double")
                  / F.sum("rev").cast("double")).alias("mkt_share"))
            .orderBy("o_year"))


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("composite", "outer-join", "double-agg"),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: orders-per-customer histogram including zero-order customers.

    The join predicate (not a WHERE filter) keeps customers whose only
    orders are urgent — COUNT(o_orderkey) ignores the nulls the outer
    join produces. Two chained aggregations; the second one's input is
    one row per customer, so the re-shuffle is small.
    """
    customer, orders = catalog.load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT CAST(100.00 * SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                                  ELSE CAST(0.00 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(SUM({_REV}) AS DOUBLE) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    tags=("composite", "conditional-agg"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: percentage of one month's revenue from PROMO parts.

    part (2k rows at sf0.01; ~200k at TPC-H sf100) broadcasts; the month
    filter prunes lineitem at the scan, so the join probe side is tiny.
    """
    lineitem, part = catalog.load_tables(spark, sf_dir, "lineitem", "part")
    month = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp")))
    promo = F.when(F.col("p_type") == "PROMO", _rev()) \
        .otherwise(F.lit("0.00").cast("decimal(12,2)"))
    # 100.00 × sum stays in exact decimal (matching the oracle's
    # CAST(100.00 * SUM(...) AS DOUBLE)); only the final divide is double.
    return (month.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .agg(((F.sum(promo) * F.lit("100.00").cast("decimal(5,2)"))
                  .cast("double")
                  / F.sum(_rev()).cast("double")).alias("promo_revenue")))


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({_REV}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("composite", "scalar-subquery", "cte"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with the maximum quarterly revenue — a derived
    view consumed twice (once aggregated to its max, once joined back).

    Exact-decimal revenue makes the double equality comparison safe:
    both sides derive from the identical exact sum. At scale the revenue
    view is computed once and reused (Spark reuses the exchange; an
    explicit .cache() would pin it for the two consumers).
    """
    lineitem, supplier = catalog.load_tables(spark, sf_dir, "lineitem", "supplier")
    revenue = (lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).cast("double").alias("total_revenue")))
    max_rev = revenue.agg(F.max("total_revenue").alias("mr"))
    return (supplier
            .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
            .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("mr"))
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


@register(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(SUM({oracle_money('l_extendedprice')}) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
    """,
    tags=("composite", "correlated-subquery"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue lost if small-quantity orders of one brand were
    dropped. The correlated per-part AVG decorrelates to a groupBy over
    lineitem joined back on partkey — exactly how Spark (and every
    modern optimizer) plans it; we express the decorrelated form
    directly. l_quantity values are integral doubles, so AVG is exact
    and engine-stable.

    Scale: the per-part average aggregates the full lineitem — at 100 TB
    that is the dominant shuffle, on the same l_partkey key as the join
    that follows, so one hash-partitioning serves both (no second
    shuffle; bucketing lineitem by partkey removes even the first).
    """
    lineitem, part = catalog.load_tables(spark, sf_dir, "lineitem", "part")
    brand = part.filter(F.col("p_brand") == "Brand#1")
    per_part = (lineitem.groupBy(F.col("l_partkey").alias("avg_partkey"))
                .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_cutoff")))
    return (lineitem
            .join(F.broadcast(brand), F.col("p_partkey") == F.col("l_partkey"))
            .join(per_part, F.col("avg_partkey") == F.col("l_partkey"))
            .filter(F.col("l_quantity") < F.col("qty_cutoff"))
            .agg((F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0))
                 .alias("avg_yearly")))


@register(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           SUM(l_quantity) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 200)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
    tags=("composite", "having", "in-subquery", "topk"),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: customers who placed very large orders (total quantity >200).

    The IN subquery is a semi-join against a HAVING-filtered aggregate.
    SUM(l_quantity) over integral doubles is exact, so the HAVING cut is
    engine-stable. Both the aggregate and the semi-join shuffle on
    l_orderkey/o_orderkey — one partitioning serves both at scale.
    """
    customer, orders, lineitem = catalog.load_tables(
        spark, sf_dir, "customer", "orders", "lineitem")
    big = (lineitem.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("sq"))
           .filter(F.col("sq") > 200)
           .select(F.col("l_orderkey").alias("big_orderkey")))
    return (customer
            .join(orders, F.col("c_custkey") == F.col("o_custkey"))
            .join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
            .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                     "o_totalprice")
            .agg(F.sum("l_quantity").alias("total_qty"))
            .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
            .limit(100))


@register(
    "tpch_q19_disjunctive_predicate",
    oracle=f"""
    SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    tags=("composite", "disjunctive-filter"),
)
def tpch_q19_disjunctive_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: three OR'd brand/size/quantity bands over the part join.

    Catalyst extracts the common join key and pushes the per-side
    conjuncts it can derive (brand/size to part, quantity range to
    lineitem) below the join — the classic disjunctive-pushdown test.
    """
    lineitem, part = catalog.load_tables(spark, sf_dir, "lineitem", "part")
    j = lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    band = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
        | ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 25)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 35)
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30)))
    return j.filter(band).agg(F.sum(_rev()).cast("double").alias("revenue"))


@register(
    "tpch_q22_idle_customers",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS numcust,
           CAST(SUM({oracle_money('c_acctbal')}) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM({oracle_money('c_acctbal')}) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0.00)
      AND NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("composite", "anti-join", "scalar-subquery"),
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers who never ordered,
    summarized by market segment (stands in for the phone-prefix cut).

    NOT EXISTS plans as a left-anti join; the average-balance threshold
    is a broadcast scalar (exact decimal sum / count → one double, same
    bits in both engines). At scale the anti join shuffles customer and
    an orders projection on custkey — both narrow.
    """
    customer, orders = catalog.load_tables(spark, sf_dir, "customer", "orders")
    avg_bal = (customer.filter(F.col("c_acctbal") > 0.0)
               .agg((F.sum(money("c_acctbal")).cast("double")
                     / F.count(F.lit(1))).alias("avg_bal")))
    return (customer
            .join(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("avg_bal"))
            .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.sum(money("c_acctbal")).cast("double").alias("totacctbal"))
            .orderBy("c_mktsegment"))


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey   = o_custkey
    JOIN lineitem ON l_orderkey  = o_orderkey
    JOIN supplier ON l_suppkey   = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    tags=("composite", "star-join", "tpch"),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue by nation where the supplying supplier and the
    ordering customer share a nation (the "local supplier" constraint —
    a second equi-condition on the supplier join, not a new join).

    Plan shape at scale: lineitem⋈orders⋈customer shuffle on their keys
    (bucketing co-locates them at 100 TB); supplier joins on
    (l_suppkey, c_nationkey = s_nationkey) — the nation equality rides
    the same hash join as an extra key; nation and region broadcast.
    """
    customer, orders, lineitem, supplier, nation, region = catalog.load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier",
        "nation", "region")
    return (lineitem
            .join(orders.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1998-01-01")),
                F.col("l_orderkey") == F.col("o_orderkey"))
            .join(customer, F.col("o_custkey") == F.col("c_custkey"))
            .join(supplier, (F.col("l_suppkey") == F.col("s_suppkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
            .join(F.broadcast(nation),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .groupBy("n_name")
            .agg(F.sum(_rev()).cast("double").alias("revenue")))


@register(
    "report_revenue_share",
    oracle=f"""
    WITH rev AS (
      SELECT n_name, SUM({_REV}) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey  = o_orderkey
      JOIN customer ON o_custkey   = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name
    ), total AS (
      SELECT SUM(revenue) AS t FROM rev
    )
    SELECT n_name,
           CAST(revenue AS DOUBLE) AS revenue,
           CAST(revenue AS DOUBLE) / CAST(t AS DOUBLE) AS share
    FROM rev, total
    """,
    tags=("report", "percent-of-total", "composite"),
)
def report_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total report: each nation's revenue share of the
    whole. The total is folded in as a cross-joined 1-row aggregate of
    the SAME subtree — NOT an unpartitioned window (which serializes
    the table onto one task) and NOT a driver-side collect; Catalyst
    plans one scan feeding both the grouped and the global aggregate.

    Parity: both operands go decimal→double BEFORE the division, so
    the share is one IEEE double division in both engines.
    """
    lineitem, orders, customer, nation = catalog.load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation")
    rev = (lineitem
           .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
           .join(customer, F.col("o_custkey") == F.col("c_custkey"))
           .join(F.broadcast(nation),
                 F.col("c_nationkey") == F.col("n_nationkey"))
           .groupBy("n_name")
           .agg(F.sum(_rev()).alias("revenue")))
    total = rev.agg(F.sum("revenue").alias("t"))
    return (rev.crossJoin(F.broadcast(total))
            .select("n_name",
                    F.col("revenue").cast("double").alias("revenue"),
                    (F.col("revenue").cast("double") / F.col("t").cast("double"))
                     .alias("share")))
