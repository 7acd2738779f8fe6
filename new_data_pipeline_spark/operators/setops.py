"""Set operators: UNION [ALL], INTERSECT [ALL], EXCEPT [ALL].

The reference has no set operations (SURVEY.md §2.2); these complete
the relational surface. Scale design: UNION ALL is a free concat of
partition lists (no shuffle); DISTINCT/INTERSECT/EXCEPT shuffle on the
full row — keep projections narrow before them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register


def _cust_nations(spark, sf_dir):
    return catalog.load(spark, sf_dir, "customer") \
        .select(F.col("c_nationkey").alias("nationkey"))


def _supp_nations(spark, sf_dir):
    return catalog.load(spark, sf_dir, "supplier") \
        .select(F.col("s_nationkey").alias("nationkey"))


@register(
    "setop_union_distinct",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey AS nationkey FROM supplier)
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): nations that have customers or suppliers."""
    return _cust_nations(spark, sf_dir) \
        .union(_supp_nations(spark, sf_dir)).distinct()


@register(
    "setop_union_all_counts",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier)
    GROUP BY nationkey
    """,
    tags=("setop",),
)
def setop_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL preserving multiplicity (then counted — bag semantics
    made hashable)."""
    return (_cust_nations(spark, sf_dir)
            .unionAll(_supp_nations(spark, sf_dir))
            .groupBy("nationkey").agg(F.count(F.lit(1)).alias("n")))


@register(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations with both customers and suppliers."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: nations with customers but no suppliers."""
    return _cust_nations(spark, sf_dir).subtract(_supp_nations(spark, sf_dir))


@register(
    "setop_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): per-customer min multiplicity of
    open vs finished orders."""
    orders = catalog.load(spark, sf_dir, "orders")
    open_ = orders.filter(F.col("o_orderstatus") == "O") \
                  .select(F.col("o_custkey").alias("custkey"))
    done = orders.filter(F.col("o_orderstatus") == "F") \
                 .select(F.col("o_custkey").alias("custkey"))
    return open_.intersectAll(done)
