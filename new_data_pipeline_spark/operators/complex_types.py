"""Complex-type operators: maps, structs, and array higher-order
functions (transform / zip_with / aggregate / sort) as first-class
query surface.

Parity note: outputs stay primitive-or-array-of-primitive — map and
struct CELLS serialize differently across engine client layers (Row vs
dict), so maps/structs are built and consumed INSIDE the query and
flattened at the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register


@register(
    "map_funcs",
    oracle="""
    WITH m AS (
      SELECT event_type,
             MAP(['n', 'ksum'],
                 [COUNT(*), CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT)])
               AS stats
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           array_to_string(list_sort(map_keys(stats)), ',') AS stat_keys,
           CAST(map_extract(stats, 'n')[1] AS BIGINT) AS n,
           CAST(map_extract(stats, 'ksum')[1] AS BIGINT) AS ksum,
           CAST(cardinality(stats) AS INTEGER) AS n_keys
    FROM m
    """,
    tags=("complex", "map"),
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + key/value access, flattened at the boundary:
    build map{n, ksum} per event type, then read it back out."""
    events = catalog.load(spark, sf_dir, "events")
    m = (events.groupBy("event_type")
         .agg(F.map_from_arrays(
             F.array(F.lit("n"), F.lit("ksum")),
             F.array(F.count(F.lit(1)),
                     F.sum(F.get_json_object("props", "$.k").cast("bigint"))))
             .alias("stats")))
    return m.select(
        "event_type",
        F.concat_ws(",", F.sort_array(F.map_keys("stats"))).alias("stat_keys"),
        F.element_at("stats", "n").alias("n"),
        F.element_at("stats", "ksum").alias("ksum"),
        F.size("stats").alias("n_keys"))


@register(
    "struct_funcs",
    oracle="""
    WITH s AS (
      SELECT o_orderkey,
             {'status': o_orderstatus, 'price': o_totalprice} AS info
      FROM orders
    )
    SELECT o_orderkey,
           info.status AS status,
           info.price AS price
    FROM s WHERE info.price > 150000
    """,
    tags=("complex", "struct"),
)
def struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct build + field access + predicate on a nested field
    (flattened at the boundary)."""
    orders = catalog.load(spark, sf_dir, "orders")
    s = orders.select(
        "o_orderkey",
        F.struct(F.col("o_orderstatus").alias("status"),
                 F.col("o_totalprice").alias("price")).alias("info"))
    return (s.filter(F.col("info.price") > 150000)
            .select("o_orderkey",
                    F.col("info.status").alias("status"),
                    F.col("info.price").alias("price")))


@register(
    "array_higher_order",
    oracle="""
    WITH t AS (
      SELECT vec_id,
             [CAST(round(x * 1000) AS BIGINT) for x in CAST(embedding AS DOUBLE[])]
               AS q
      FROM embeddings WHERE vec_id < 50
    )
    SELECT vec_id,
           CAST(list_sum([abs(x) for x in q]) AS BIGINT) AS l1_milli,
           CAST(list_max(q) AS BIGINT) AS max_milli,
           array_to_string(list_sort(q)[1:3], ',') AS smallest3,
           CAST(list_sum([CASE WHEN i % 2 = 1 THEN q[i] ELSE 0 END
                          for i in range(1, len(q) + 1)]) AS BIGINT)
             AS odd_pos_sum_milli
    FROM t
    """,
    tags=("complex", "array", "hof"),
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order pipeline — transform (quantize to integer
    milli-units: exact cross-engine math), aggregate (L1 norm), sort +
    slice, and a position-aware reduce. All JVM lambdas, no UDFs."""
    emb = catalog.load(spark, sf_dir, "embeddings")
    q = F.expr("""transform(cast(embedding AS array<double>),
                            x -> CAST(round(x * 1000) AS BIGINT))""")
    t = emb.filter(F.col("vec_id") < 50).select("vec_id", q.alias("q"))
    return t.select(
        "vec_id",
        F.expr("CAST(aggregate(q, 0L, (a, x) -> a + abs(x)) AS BIGINT)")
         .alias("l1_milli"),
        F.array_max("q").cast("bigint").alias("max_milli"),
        F.concat_ws(",", F.slice(F.sort_array("q"), 1, 3)).alias("smallest3"),
        F.expr("""CAST(aggregate(zip_with(q, sequence(1, size(q)),
                                          (x, i) -> CASE WHEN i % 2 = 1
                                                         THEN x ELSE 0L END),
                                 0L, (a, x) -> a + x) AS BIGINT)""")
         .alias("odd_pos_sum_milli"))
