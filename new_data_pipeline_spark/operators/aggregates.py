"""Aggregation operators: grouped/distinct/approx aggregates, rollup,
cube, grouping sets, pivot, collect, percentiles.

Reference analog (SURVEY.md §2.1): the CountVectorizer vocabulary fit
(reference serialize.py:230-231) is a corpus-wide count aggregation and
the sample count (serialize.py:665-667) a global count — the only
aggregations the reference performs. This module provides the full
relational aggregate surface.

Scale design: every aggregate here is map-side combinable — Catalyst
plans partial aggregation before the shuffle, so shuffle volume is
O(groups), not O(rows). rollup/cube expand grouping sets BEFORE the
partial aggregate, which AQE then coalesces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.functions.exact import dsum, money, oracle_dsum
from new_data_pipeline_spark.registry import register


@register(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped COUNT(DISTINCT) — planned as a two-phase expand+agg."""
    orders = catalog.load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.countDistinct("o_custkey").alias("n_customers"),
             F.countDistinct("o_orderstatus").alias("n_statuses"))
    )


@register(
    "agg_approx_distinct",
    # Bounded-error oracle (same device as the ANN queries): the raw
    # HLL estimate differs across engines, so the query emits the EXACT
    # count plus an in-bound flag, and the oracle replays the exact
    # count with a literal-true flag — the driver's hash matches iff
    # every group's sketch landed within 5% of truth.
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           CAST(1 AS INTEGER) AS within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB path for
    distinct counts: constant memory per group vs a full distinct
    shuffle. Driver-gated via the bounded-error device (exact value +
    in-bound flag); the ≤5% unit gate remains in tests."""
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    approx = F.approx_count_distinct("l_orderkey", 0.02)
    exact = F.countDistinct("l_orderkey")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(exact.alias("exact_orders"),
             (F.abs(approx - exact) <= 0.05 * exact)
             .cast("int").alias("within_5pct"))
    )


@register(
    "agg_percentile_approx",
    # Bounded-error oracle: percentile_approx guarantees the returned
    # value's RANK is within n/accuracy of the target, i.e. the value
    # lies between the exact quantiles at q ∓ 1/accuracy. The query
    # emits flags checking that (with a 50× safety margin, 0.005) and
    # the oracle replays literal-true flags — hash match iff both
    # sketch outputs honored the bound in every group.
    oracle="""
    SELECT l_returnflag,
           CAST(1 AS INTEGER) AS median_in_bound,
           CAST(1 AS INTEGER) AS p99_in_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "approx", "percentile"),
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (KLL-style sketch) — the 100 TB path for
    quantiles: constant memory, mergeable across partitions, vs the
    exact percentile's full sort. Accuracy 1/10000; driver-gated via
    quantile-bracket flags against the exact percentile."""
    lineitem = catalog.load(spark, sf_dir, "lineitem")

    def in_bound(q: float, alias: str):
        approx = F.percentile_approx("l_extendedprice", q, 10000)
        lo = F.expr(f"percentile(l_extendedprice, {max(q - 0.005, 0.0)})")
        hi = F.expr(f"percentile(l_extendedprice, {min(q + 0.005, 1.0)})")
        return ((approx >= lo) & (approx <= hi)).cast("int").alias(alias)

    return (lineitem.groupBy("l_returnflag")
            .agg(in_bound(0.5, "median_in_bound"),
                 in_bound(0.99, "p99_in_bound")))


@register(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           {oracle_dsum("l_quantity", "sum_qty")},
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (flag,status) → (flag) → () with GROUPING flags
    so NULL group keys are distinguishable from real NULLs.

    Pre-aggregates per (flag, status) BEFORE the rollup: Expand
    multiplies its input by the number of grouping sets (3×), so feeding
    it the ~6-row leaf aggregate instead of every lineitem row keeps the
    expensive pass a plain map-side-combinable groupBy. sum/count are
    decomposable (decimal re-sum is exact), so results are identical.
    """
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    leaf = (lineitem.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(money("l_quantity")).alias("_qty"),
                 F.count(F.lit(1)).alias("_n")))
    return (
        leaf.rollup("l_returnflag", "l_linestatus")
        .agg(F.grouping("l_returnflag").cast("integer").alias("g_flag"),
             F.grouping("l_linestatus").cast("integer").alias("g_status"),
             F.sum("_qty").cast("double").alias("sum_qty"),
             F.sum("_n").alias("n_rows"))
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status",
                "sum_qty", "n_rows")
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           {oracle_dsum("o_totalprice", "sum_price")},
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping-set combinations in one pass."""
    orders = catalog.load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.grouping("o_orderstatus").cast("integer").alias("g_status"),
             F.grouping("o_orderpriority").cast("integer").alias("g_priority"),
             dsum("o_totalprice", "sum_price"),
             F.count(F.lit(1)).alias("n_orders"))
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_priority",
                "sum_price", "n_orders")
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_suppkey,
           {oracle_dsum("l_extendedprice", "sum_price")}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey))
    """,
    tags=("agg", "sql"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (Catalyst plans the
    same Expand as the DataFrame rollup/cube)."""
    catalog.load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_suppkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey))
    """)


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE)
             AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (explicit value list so the plan
    needs no extra distinct pass — required at scale)."""
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double"))
        .withColumnRenamed("O", "qty_O")
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(list(DISTINCT CAST(c_nationkey AS BIGINT))),
                           ',') AS nation_keys,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg", "collect"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set + sort_array: deterministic array aggregation.

    (Unsorted collect_list is order-nondeterministic under parallelism —
    never hashable; sorting restores determinism. The sorted array is
    emitted as a ','-joined string at the query boundary: array cells
    are unhashable in pandas-based comparison layers.)
    """
    customer = catalog.load(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_mktsegment")
        .agg(F.concat_ws(
                 ",",
                 F.sort_array(F.collect_set(F.col("c_nationkey").cast("bigint"))))
              .alias("nation_keys"),
             F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "agg_minmax_percentile",
    oracle="""
    SELECT l_returnflag,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def agg_minmax_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX over numbers and timestamps + exact interpolated median.

    l_quantity values are small integers stored as doubles, so the
    linear interpolation at the median is exact in both engines. At
    100 TB the exact percentile becomes percentile_approx (sketch).
    """
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(F.min("l_quantity").alias("min_qty"),
             F.max("l_quantity").alias("max_qty"),
             F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
             F.min("l_shipdate").alias("first_ship"),
             F.max("l_shipdate").alias("last_ship"))
    )
