"""Relational core: flagship query, projection/filter, pricing summary.

Reference analogs: projection = label pop (reference serialize.py:146-154),
filter = batch cutoff (serialize.py:744) — the reference's only relational
surface. Everything here is stock DataFrame API so Catalyst handles
pushdown, pruning and join planning (SURVEY.md §2.2, §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.functions.exact import (
    davg, dsum, money, oracle_davg, oracle_dsum, oracle_money,
)
from new_data_pipeline_spark.registry import register


@register(
    "flagship_revenue_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation,
           {oracle_dsum(f"{oracle_money('l.l_extendedprice')} * (1 - {oracle_money('l.l_discount')})",
                        "revenue", is_column=False)},
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
    GROUP BY n.n_name
    """,
    tags=("relational", "join", "agg", "flagship"),
)
def flagship_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation: 5-table star join + filter + agg (TPC-H Q5 shape).

    Scale design: lineitem→orders is the only big-big join (shuffle on
    orderkey, co-partitioned/bucketed at 100 TB); customer/nation/region
    are dimensions — nation+region are broadcast explicitly, customer is
    small enough for AQE to broadcast at bench scale and would be a
    shuffle join at 100 TB. The shipdate filter sits directly on the
    scan so parquet row-group min/max stats prune I/O.
    """
    lineitem, orders, customer, nation, region = catalog.load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region")
    revenue = money("l_extendedprice") * (1 - money("l_discount"))
    return (
        lineitem
        .filter(F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        .select("l_orderkey", revenue.alias("rev"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("rev").cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {oracle_dsum("l_quantity", "sum_qty")},
           {oracle_dsum("l_extendedprice", "sum_base_price")},
           {oracle_dsum(f"{oracle_money('l_extendedprice')} * (1 - {oracle_money('l_discount')})",
                        "sum_disc_price", is_column=False)},
           {oracle_dsum(f"{oracle_money('l_extendedprice')} * (1 - {oracle_money('l_discount')})"
                        f" * (1 + {oracle_money('l_tax')})",
                        "sum_charge", is_column=False)},
           {oracle_davg("l_quantity", "avg_qty")},
           {oracle_davg("l_extendedprice", "avg_price")},
           {oracle_davg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("relational", "agg"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + 8-aggregate groupBy.

    Scale design: pure map-side-combinable aggregation — Catalyst plans
    partial_agg → shuffle(2 low-cardinality keys) → final_agg, so the
    shuffle moves only |groups|×|aggs| rows no matter the input size.
    """
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    disc_price = money("l_extendedprice") * (1 - money("l_discount"))
    charge = disc_price * (1 + money("l_tax"))
    # spread AFTER the filter+6-column projection: the single-file scan
    # otherwise runs the 8-aggregate decimal partial agg on one core,
    # and the shuffle moves only the narrow projected rows
    return (
        catalog.spread(
            lineitem
            .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .select("l_returnflag", "l_linestatus", "l_quantity",
                    "l_extendedprice", "l_discount", "l_tax"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"),
             dsum("l_extendedprice", "sum_base_price"),
             F.sum(disc_price).cast("double").alias("sum_disc_price"),
             F.sum(charge).cast("double").alias("sum_charge"),
             davg("l_quantity", "avg_qty"),
             davg("l_extendedprice", "avg_price"),
             davg("l_discount", "avg_disc"),
             F.count(F.lit(1)).alias("count_order"))
    )


@register(
    "projection_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           upper(o_orderpriority) AS priority
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 1000 AND 200000
      AND o_orderpriority LIKE '%URGENT%'
      AND o_custkey IS NOT NULL
    """,
    tags=("relational", "filter"),
)
def projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + compound predicates (IN / BETWEEN / LIKE / IS NOT NULL).

    Reference analog: label pop + field select (serialize.py:146-154,
    222-227). Scale design: all four predicates and the 4-column
    projection push into the parquet scan (PushedFilters/ReadSchema in
    explain) — the scan never materializes unused columns.
    """
    orders = catalog.load(spark, sf_dir, "orders")
    return (
        orders
        .filter(F.col("o_orderstatus").isin("O", "F")
                & F.col("o_totalprice").between(1000, 200000)
                & F.col("o_orderpriority").like("%URGENT%")
                & F.col("o_custkey").isNotNull())
        .select("o_orderkey", "o_custkey", "o_totalprice",
                F.upper("o_orderpriority").alias("priority"))
    )
