"""Data-quality profiling: the audit pass every ingest pipeline runs
before trusting a new drop of data.

The reference's only validation is two runtime asserts (stream count
and subdir count, reference serialize.py:73-77,660-663); a 100 TB
pipeline needs per-column completeness/cardinality/range metrics as a
first-class, single-pass operator — regressions in null rates or
cardinality are how upstream breakage is actually caught.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

# column -> expression rendering min/max as engine-portable strings
# (doubles go through DECIMAL(12,2) so both engines print "874.89";
# raw double→string formatting differs between engines)
_PROFILE_COLS = {
    "o_orderkey": "{c}",
    "o_custkey": "{c}",
    "o_orderstatus": "{c}",
    "o_totalprice": "CAST({c} AS DECIMAL(12,2))",
    "o_orderdate": "{c}",
    "o_orderpriority": "{c}",
}


def _oracle_profile() -> str:
    parts = []
    for c, tmpl in _PROFILE_COLS.items():
        v = tmpl.format(c=c)
        parts.append(f"""
        SELECT '{c}' AS col_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({v}) AS VARCHAR) AS min_val,
               CAST(MAX({v}) AS VARCHAR) AS max_val
        FROM orders""")
    return " UNION ALL ".join(parts)


@register(
    "profile_table_quality",
    oracle=_oracle_profile(),
    tags=("profiling", "quality", "audit"),
)
def profile_table_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column completeness/cardinality/range profile of the orders
    table: row count, null count, exact distinct count, min/max (as
    portable strings) — one row per column.

    Scale design: ONE aggregation job. The multi-column exact
    count_distinct compiles to a single Expand + partial aggregate
    (each input row fans out once per column, combines map-side), not
    one scan per column; min/max/count ride the same pass. The row
    count never leaves the executors until the final 6-row result.
    """
    orders = catalog.load(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, tmpl in _PROFILE_COLS.items():
        v = tmpl.format(c=c)
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.expr(f"CAST(MIN({v}) AS STRING)").alias(f"{c}__min"),
            F.expr(f"CAST(MAX({v}) AS STRING)").alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS)
    return wide.select(
        F.expr(f"stack({len(_PROFILE_COLS)}, {stacked})")
         .alias("col_name", "n_nulls", "n_distinct", "min_val", "max_val"),
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct",
             "min_val", "max_val")
