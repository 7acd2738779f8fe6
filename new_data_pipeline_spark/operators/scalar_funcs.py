"""Scalar-function surface: string, date/time, math, conditional,
JSON, and array expressions.

Reference analogs (SURVEY.md §2.1): path/label string surgery
(reference serialize.py:33,58,104), regex tokenization
(serialize.py:220). All expressions here are built-in
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd; no Python
in the row path (the "UDFs are the slow path" rule).

Parity notes: math sticks to exact operations (integer arithmetic,
floor/ceil/abs) — libm functions (exp/log/pow) round differently per
engine and cannot hash-match; dayofweek conventions differ (Spark
1=Sunday, DuckDB dow 0=Sunday) and are aligned explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           lower(p_type) AS type_lower,
           CAST(length(p_name) AS BIGINT) AS name_len,
           substr(p_name, 1, 6) AS name_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_type, ' ', '_') AS type_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
           array_to_string(string_split(p_type, ' '), ',') AS type_words,
           CAST(levenshtein(p_brand, 'BRAND#1') AS BIGINT) AS brand_dist
    FROM part
    """,
    tags=("scalar", "string"),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface: case, length, substring, concat, replace, pad,
    regex extract, split, edit distance."""
    part = catalog.load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_name", 1, 6).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_extract("p_type", r"([A-Z]+)", 1).alias("first_word"),
        F.array_join(F.split("p_type", " "), ",").alias("type_words"),
        F.levenshtein("p_brand", F.lit("BRAND#1")).cast("bigint")
         .alias("brand_dist"))


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS INTEGER) AS y,
           CAST(month(ts) AS INTEGER) AS m,
           CAST(day(ts) AS INTEGER) AS d,
           CAST(hour(ts) AS INTEGER) AS h,
           CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
           CAST(date_part('dow', ts) + 1 AS INTEGER) AS dow,
           CAST(ts AS DATE) + INTERVAL 30 DAY AS ts_plus_30d,
           date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since_2024
    FROM events
    """,
    tags=("scalar", "date"),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface: parts, truncation, day arithmetic, diffs.
    DOW aligned to Spark's 1=Sunday convention in the oracle."""
    events = catalog.load(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.year("ts").cast("integer").alias("y"),
        F.month("ts").cast("integer").alias("m"),
        F.dayofmonth("ts").cast("integer").alias("d"),
        F.hour("ts").cast("integer").alias("h"),
        F.date_trunc("month", "ts").alias("month_start"),
        F.date_trunc("day", "ts").alias("day_start"),
        F.dayofweek("ts").cast("integer").alias("dow"),
        (F.to_date("ts") + F.expr("INTERVAL 30 DAY")).cast("timestamp")
            .alias("ts_plus_30d"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
         .cast("bigint").alias("days_since_2024"))


@register(
    "scalar_math_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25) AS qty_dev,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
           CASE WHEN l_discount >= 0.05 THEN 'high'
                WHEN l_discount > 0 THEN 'low'
                ELSE 'none' END AS discount_band,
           COALESCE(NULLIF(l_returnflag, 'N'), '-') AS flag_or_dash,
           (l_quantity IS NOT DISTINCT FROM 25.0) AS is_qty_25
    FROM lineitem
    """,
    tags=("scalar", "math", "conditional"),
)
def scalar_math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math (exact ops only) + CASE/COALESCE/NULLIF + null-safe equality.

    floor/ceil of double division are exact; libm transcendentals are
    deliberately excluded from oracle-gated queries (engine-dependent
    last-ulp rounding).
    """
    li = catalog.load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod7"),
        F.when(F.col("l_discount") >= 0.05, "high")
         .when(F.col("l_discount") > 0, "low")
         .otherwise("none").alias("discount_band"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("-"))
         .alias("flag_or_dash"),
        F.col("l_quantity").eqNullSafe(F.lit(25.0)).alias("is_qty_25"))


@register(
    "scalar_json_funcs",
    oracle="""
    SELECT event_id, event_type,
           CAST(props->>'$.k' AS BIGINT) AS k_value,
           (CAST(props->>'$.k' AS BIGINT) % 10) AS k_bucket,
           (props->>'$.missing') IS NULL AS missing_is_null
    FROM events
    """,
    tags=("scalar", "json"),
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column
    (get_json_object path syntax; missing keys → NULL).

    At 100 TB, parse once with from_json into a struct column and drop
    the raw string early — repeated get_json_object re-parses per call.
    """
    events = catalog.load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return events.select(
        "event_id", "event_type",
        k.alias("k_value"),
        (k % 10).alias("k_bucket"),
        F.get_json_object("props", "$.missing").isNull()
         .alias("missing_is_null"))


@register(
    "scalar_json_struct_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "json", "agg"),
)
def scalar_json_struct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read: from_json into a typed struct, then aggregate —
    the parse-once pattern recommended for the hot path."""
    events = catalog.load(spark, sf_dir, "events")
    parsed = events.withColumn(
        "p", F.from_json("props", "struct<k:bigint>"))
    return (parsed.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("p.k").alias("sum_k"),
                 F.min("p.k").alias("min_k"),
                 F.max("p.k").alias("max_k")))


@register(
    "scalar_array_funcs",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
           CAST(len(list_filter(embedding, x -> x > 0.2)) AS INTEGER) AS n_large,
           list_contains(embedding, 0.0) AS has_zero
    FROM embeddings
    """,
    tags=("scalar", "array"),
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface over the embedding column: size, indexing,
    higher-order filter, containment — all JVM-side, no UDF.

    Float comparisons (no float arithmetic) keep parity exact.
    """
    emb = catalog.load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", "label",
        F.size("embedding").cast("integer").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("integer")
         .alias("n_positive"),
        # cast the ELEMENT to double so the comparison promotes exactly
        # like DuckDB's (float32(0.2) ≈ 0.200000003 > double 0.2 there;
        # a float-vs-float compare here would miss that element)
        F.size(F.filter("embedding", lambda x: x.cast("double") > F.lit(0.2)))
         .cast("integer").alias("n_large"),
        F.array_contains("embedding", F.lit(0.0).cast("float"))
         .alias("has_zero"))
