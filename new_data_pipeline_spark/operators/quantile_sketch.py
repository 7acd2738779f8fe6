"""Mergeable quantile rollup: per-partition KLL summaries → grouped
merge → quantile estimates, under the bounded-error driver gate.

The 100 TB pattern this demonstrates (the quantile twin of
agg_hll_mergeable_rollup): the expensive pass over raw values happens
once, per partition, in bounded memory; what shuffles is O(k) summary
rows per (group, partition) instead of every value; and persisted
per-day summaries roll up to any coarser grain later without touching
raw data. Exact percentile (the oracle side) instead collects every
value of a group into one aggregation buffer — fine at test scale,
memory-fatal for a hot group at corpus scale.

Gate: same bounded-error device as the other sketches — the query
emits the EXACT quantiles plus flags that the KLL estimates bracket
within ±0.02 normalized rank (observed ≤0.005 at K=400), and the
oracle replays the exact side with literal-true flags.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.functions.kll import KLL
from new_data_pipeline_spark.registry import register

RANK_EPS = 0.02
QUANTILES = (0.5, 0.95)

_SUMMARY_SCHEMA = "grp string, level int, item double"


def kll_group_quantiles(df: DataFrame, group_col: str, value_col: str,
                        quantiles: tuple[float, ...] = QUANTILES
                        ) -> DataFrame:
    """(group, q, estimate) via per-partition sketches + grouped merge.

    Stage 1 is mapInPandas: each Arrow batch folds its values into one
    KLL per group and emits the O(k) summary rows — no grouping
    shuffle touches raw values. Stage 2 groups the summary rows and
    merges sketches per group (applyInPandas over kilobytes).
    """
    gcol, vcol = group_col, value_col

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketches: dict[str, KLL] = {}
        for pdf in it:
            for g, v in zip(pdf[gcol], pdf[vcol]):
                if v is None:
                    continue
                sk = sketches.get(g)
                if sk is None:
                    sk = sketches[g] = KLL()
                sk.add(float(v))
        rows = [(g, lv, item)
                for g, sk in sketches.items()
                for lv, item in sk.to_rows()]
        yield pd.DataFrame(rows, columns=["grp", "level", "item"])

    summaries = df.select(F.col(gcol).cast("string").alias(gcol), vcol) \
        .mapInPandas(build, schema=_SUMMARY_SCHEMA)

    out_schema = "grp string, " + ", ".join(
        f"q{int(q * 100)} double" for q in quantiles)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = KLL.from_rows(list(zip(pdf["level"], pdf["item"])))
        row = {"grp": [pdf["grp"].iloc[0]]}
        for q in quantiles:
            row[f"q{int(q * 100)}"] = [sk.quantile(q)]
        return pd.DataFrame(row)

    return summaries.groupBy("grp").applyInPandas(merge, schema=out_schema)


@register(
    "agg_kll_quantile_rollup",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS exact_p50,
           ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS exact_p95,
           CAST(1 AS INTEGER) AS p50_in_bound,
           CAST(1 AS INTEGER) AS p95_in_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "sketch", "quantile", "mergeable"),
)
def agg_kll_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median and p95 of extended price per return flag, answered by
    the mergeable KLL path, gated against exact quantiles: flags assert
    each estimate's value lies between the exact quantiles at
    q ∓ RANK_EPS — i.e. its normalized rank error is within the sketch
    guarantee. The oracle replays the exact side with literal flags, so
    a hash match driver-verifies the whole partition-sketch → merge →
    query pipeline.
    """
    li = catalog.load(spark, sf_dir, "lineitem")
    est = kll_group_quantiles(li, "l_returnflag", "l_extendedprice")

    def bracket(q: float):
        lo = F.expr(f"percentile(l_extendedprice, {max(q - RANK_EPS, 0.0)})")
        hi = F.expr(f"percentile(l_extendedprice, {min(q + RANK_EPS, 1.0)})")
        return lo.alias(f"lo{int(q * 100)}"), hi.alias(f"hi{int(q * 100)}")

    exact = li.groupBy(F.col("l_returnflag").cast("string").alias("grp")) \
        .agg(F.expr("percentile(l_extendedprice, 0.5D)").alias("exact_p50"),
             F.expr("percentile(l_extendedprice, 0.95D)").alias("exact_p95"),
             *bracket(0.5), *bracket(0.95))
    # 6-dp rounding on the cross-engine doubles: Spark percentile and
    # DuckDB quantile_cont interpolate fractional ranks with formulas
    # that can differ in the last ulp — the same divergence class
    # agg_corr_regression already rounds away.
    return (est.join(exact, ["grp"])
            .select(F.col("grp").alias("l_returnflag"),
                    F.round("exact_p50", 6).alias("exact_p50"),
                    F.round("exact_p95", 6).alias("exact_p95"),
                    ((F.col("q50") >= F.col("lo50"))
                     & (F.col("q50") <= F.col("hi50")))
                    .cast("int").alias("p50_in_bound"),
                    ((F.col("q95") >= F.col("lo95"))
                     & (F.col("q95") <= F.col("hi95")))
                    .cast("int").alias("p95_in_bound")))
