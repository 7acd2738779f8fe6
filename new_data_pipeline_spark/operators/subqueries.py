"""Subquery and lateral operators via the SQL surface: scalar
subqueries, IN / NOT IN (3-valued null semantics), correlated EXISTS,
LATERAL VIEW explode / posexplode.

Catalyst rewrites all of these into the same join operators the
DataFrame API produces (semi/anti/left), so the SQL surface is free —
registered here to prove the full query-language entry point works,
not just the method-chain API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register


def _sql(spark: SparkSession, sf_dir: str, tables: tuple[str, ...],
         sql: str) -> DataFrame:
    for t in tables:
        catalog.load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


@register(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           o_totalprice - (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                           / COUNT(*) FROM orders) AS delta_from_avg
    FROM orders
    WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                          / COUNT(*) FROM orders) * 1.5
    """,
    tags=("subquery",),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (global average) used in projection and filter.
    Planned as a broadcast of the 1-row subquery result."""
    return _sql(spark, sf_dir, ("orders",), """
        SELECT o_orderkey, o_totalprice,
               o_totalprice - (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                               / COUNT(*) FROM orders) AS delta_from_avg
        FROM orders
        WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                              / COUNT(*) FROM orders) * 1.5
    """)


@register(
    "subquery_in",
    oracle="""
    SELECT p_partkey, p_brand, p_size
    FROM part
    WHERE p_size IN (SELECT DISTINCT s_nationkey FROM supplier)
      AND p_partkey NOT IN (SELECT l_partkey FROM lineitem
                            WHERE l_quantity > 49)
    """,
    tags=("subquery",),
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + NOT IN subqueries (the NOT IN branch exercises null-aware
    anti-join semantics — the SQL trap Catalyst handles with
    NullAwareAntiJoin)."""
    return _sql(spark, sf_dir, ("part", "supplier", "lineitem"), """
        SELECT p_partkey, p_brand, p_size
        FROM part
        WHERE p_size IN (SELECT DISTINCT s_nationkey FROM supplier)
          AND p_partkey NOT IN (SELECT l_partkey FROM lineitem
                                WHERE l_quantity > 49)
    """)


@register(
    "subquery_correlated_exists",
    oracle="""
    SELECT n_nationkey, n_name
    FROM nation n
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000)
      AND NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_nationkey = n.n_nationkey
                        AND s.s_acctbal < 0)
    """,
    tags=("subquery",),
)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS → semi + anti joins after
    decorrelation."""
    return _sql(spark, sf_dir, ("nation", "customer", "supplier"), """
        SELECT n_nationkey, n_name
        FROM nation n
        WHERE EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000)
          AND NOT EXISTS (SELECT 1 FROM supplier s
                          WHERE s.s_nationkey = n.n_nationkey
                            AND s.s_acctbal < 0)
    """)


@register(
    "lateral_explode",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
               WHERE doc_id < 20)
    SELECT doc_id,
           unnest([CAST(i - 1 AS INTEGER)
                   for i in range(1, least(len(toks), 5) + 1)]) AS pos,
           unnest([toks[i]
                   for i in range(1, least(len(toks), 5) + 1)]) AS term
    FROM t
    """,
    tags=("lateral", "explode"),
)
def lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW posexplode: per-document token positions (the
    generator/UDTF surface). Bounded to doc_id<20, first 5 tokens."""
    return _sql(spark, sf_dir, ("documents",), """
        SELECT doc_id, t.pos, t.term
        FROM documents
        LATERAL VIEW posexplode(split(text, ' ')) t AS pos, term
        WHERE doc_id < 20 AND t.pos < 5
    """)
