"""Statistical and specialty aggregates: moments, correlation/regression,
bitwise/boolean folds, exact quantiles, argmin/argmax.

The reference's only corpus-wide statistics are the CountVectorizer
vocabulary fit (reference serialize.py:230-231) and the sample count
(serialize.py:665-667); everything here is capability extension
(SURVEY.md §2.2 "Aggregation").

Determinism strategy: builtin stddev/corr/regr_* use streaming update
formulas (Welford-style) whose double rounding differs across engines,
so those would fail an exact value-hash gate. Instead the moment/
correlation queries aggregate *exact sufficient statistics* — integer
and decimal sums that are associative and order-independent — and
derive the statistics with one identical double expression in both
engines. That is also the right 100 TB design: sufficient statistics
are a single map-side-combinable pass (one narrow shuffle row per
group), and extend to any post-hoc stat without re-scanning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.functions.exact import money, oracle_money
from new_data_pipeline_spark.registry import register


@register(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag, n,
           sx / n AS mean_qty,
           (n * sxx - sx * sx) / (n * (n - 1.0)) AS var_qty,
           SQRT((n * sxx - sx * sx) / (n * (n - 1.0))) AS stddev_qty
    FROM (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx
      FROM lineitem GROUP BY l_returnflag)
    ORDER BY l_returnflag
    """,
    tags=("aggregate", "statistics"),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample mean/variance/stddev of l_quantity per return flag from
    exact integer sufficient statistics (l_quantity is integral, so
    Σx and Σx² are exact BIGINTs; the derived stats are one identical
    double expression in both engines)."""
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    suff = (lineitem.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).cast("double").alias("n"),
                 F.sum(x).cast("double").alias("sx"),
                 F.sum(x * x).cast("double").alias("sxx")))
    var = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) \
        / (F.col("n") * (F.col("n") - F.lit(1.0)))
    return (suff.select("l_returnflag", "n",
                        (F.col("sx") / F.col("n")).alias("mean_qty"),
                        var.alias("var_qty"),
                        F.sqrt(var).alias("stddev_qty"))
            .orderBy("l_returnflag"))


@register(
    "agg_corr_regression",
    oracle=f"""
    SELECT l_returnflag,
           round((n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS corr_qty_price,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS regr_slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
                 6) AS regr_intercept
    FROM (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx,
             CAST(SUM({oracle_money('l_extendedprice')}) AS DOUBLE) AS sy,
             CAST(SUM({oracle_money('l_extendedprice')}
                      * {oracle_money('l_extendedprice')}) AS DOUBLE) AS syy,
             CAST(SUM({oracle_money('l_extendedprice')}
                      * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    ORDER BY l_returnflag
    """,
    tags=("aggregate", "statistics", "regression"),
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation and least-squares fit of extendedprice on
    quantity per return flag, from exact sufficient statistics (Σx, Σx²
    exact integers; Σy, Σy², Σxy exact decimals). One pass, five sums —
    the map-combine pattern that replaces builtin corr/regr_* whose
    streaming-update rounding is engine-specific.

    Outputs round to 6 dp: the sums are exact, but DuckDB's
    decimal→double conversion can land 1 ulp off Java's
    correctly-rounded one (observed at sf0.001 in the round-3
    multi-scale audit; data-dependent) and the ulp survives the final
    arithmetic — rounding makes the gate scale-independent."""
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = money("l_extendedprice")
    suff = (lineitem.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).cast("double").alias("n"),
                 F.sum(x).cast("double").alias("sx"),
                 F.sum(x * x).cast("double").alias("sxx"),
                 F.sum(y).cast("double").alias("sy"),
                 F.sum(y * y).cast("double").alias("syy"),
                 F.sum(y * x).cast("double").alias("sxy")))
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    cov_n = n * sxy - sx * sy
    slope = cov_n / (n * sxx - sx * sx)
    return (suff.select(
        "l_returnflag",
        F.round(cov_n / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
        .alias("corr_qty_price"),
        F.round(slope, 6).alias("regr_slope"),
        F.round((sy - slope * sx) / n, 6).alias("regr_intercept"))
        .orderBy("l_returnflag"))


@register(
    "agg_bitwise_bool",
    oracle="""
    SELECT event_type,
           bit_and(user_id) AS uid_and,
           bit_or(user_id)  AS uid_or,
           bit_xor(user_id) AS uid_xor,
           bool_and(value > 1.0)   AS all_above_1,
           bool_or(value > 400.0)  AS any_above_400,
           COUNT(*) FILTER (WHERE value > 250.0) AS n_above_250
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("aggregate", "bitwise", "boolean"),
)
def agg_bitwise_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR and boolean every/any folds per event type,
    plus a filtered count (count_if). All exact integer/boolean
    semantics — hash-stable by construction, fully map-side combinable."""
    events = catalog.load(spark, sf_dir, "events")
    return (events.groupBy("event_type")
            .agg(F.bit_and("user_id").alias("uid_and"),
                 F.bit_or("user_id").alias("uid_or"),
                 F.bit_xor("user_id").alias("uid_xor"),
                 F.bool_and(F.col("value") > 1.0).alias("all_above_1"),
                 F.bool_or(F.col("value") > 400.0).alias("any_above_400"),
                 F.count_if(F.col("value") > 250.0).alias("n_above_250"))
            .orderBy("event_type"))


@register(
    "agg_exact_quantiles",
    oracle="""
    SELECT l_returnflag,
           median(l_quantity) AS median_qty,
           quantile_cont(l_quantity, 0.25) AS q1_qty,
           quantile_cont(l_quantity, 0.75) AS q3_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("aggregate", "quantile"),
)
def agg_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolating) median and quartiles per group.

    Hash-safe here because l_quantity is integral and the interpolation
    fractions at q∈{.25,.5,.75} are dyadic — every intermediate double
    is exact, so both engines' interpolation formulas agree bit-for-bit.
    For arbitrary doubles at 100 TB use approx_percentile instead (the
    exact form needs a per-group sort); that variant is covered by
    agg_percentile_approx with a tolerance gate.
    """
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    return (lineitem.groupBy("l_returnflag")
            .agg(F.percentile("l_quantity", 0.5).alias("median_qty"),
                 F.percentile("l_quantity", 0.25).alias("q1_qty"),
                 F.percentile("l_quantity", 0.75).alias("q3_qty"))
            .orderBy("l_returnflag"))


@register(
    "agg_argmin_argmax",
    oracle="""
    SELECT event_type,
           max_by(event_id, value + event_id * 0.000000001) AS top_event,
           min_by(event_id, value + event_id * 0.000000001) AS bottom_event,
           max(value) AS max_value,
           min(value) AS min_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("aggregate", "argmax"),
)
def agg_argmin_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin per group via max_by/min_by.

    value has 0.01 granularity and repeats, so ties would make the bare
    argmax nondeterministic; the ordering key adds a unique sub-cent
    epsilon (event_id ≤ 1e4 → ε ≤ 1e-5 < 0.01) computed identically in
    both engines. The production equivalent of "pick a deterministic
    winner" any distributed argmax needs.
    """
    events = catalog.load(spark, sf_dir, "events")
    key = F.col("value") + F.col("event_id") * F.lit(0.000000001)
    return (events.groupBy("event_type")
            .agg(F.max_by("event_id", key).alias("top_event"),
                 F.min_by("event_id", key).alias("bottom_event"),
                 F.max("value").alias("max_value"),
                 F.min("value").alias("min_value"))
            .orderBy("event_type"))


@register(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             -- quantities are integral-valued doubles; FLOOR before the
             -- int cast (bare double->int casts truncate on Spark but
             -- round on DuckDB)
             CAST(FLOOR(l_quantity) AS BIGINT) AS wt,
             l_orderkey, l_linenumber
      FROM lineitem
    ), c AS (
      SELECT flag, price, wt,
             CAST(SUM(wt) OVER (PARTITION BY flag
                                ORDER BY price, l_orderkey, l_linenumber
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(SUM(wt) OVER (PARTITION BY flag) AS BIGINT) AS total
      FROM w
    )
    SELECT flag, CAST(total AS BIGINT) AS total_weight,
           MIN(price) AS weighted_median_price
    FROM c
    WHERE 2 * cum >= total
    GROUP BY flag, total
    """,
    tags=("agg", "weighted", "median"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag — the weighted
    quantile no built-in aggregate provides (percentile/median treat
    every row equally; pricing and survey analytics weight rows).
    Lower weighted median: the first price (under a total (price,
    orderkey, linenumber) order) whose running weight reaches half the
    group total. Integer weights and integer comparisons (2·cum ≥
    total) leave nothing to rounding; the median itself is a PICKED
    value.

    Scale (round 9, VERDICT r8 #1): a window partitioned by group runs
    in #groups tasks — l_returnflag has THREE values, so the previous
    plan sorted all of lineitem in 3 tasks regardless of cluster size
    (10× alpha 0.69, the worst honest slope in BASELINE.md). Now the
    per-group running weight comes from ``tensorize.grouped_running_sum``
    — range-partition on (flag, price, orderkey, linenumber), O(ranges)
    driver collect of per-(range, flag) subtotals, broadcast-joined
    offsets — so every range sorts only its own slice in parallel and
    the per-flag totals ride along from the same collect. For extreme
    cardinality the KLL sketch (functions/kll.py) is the approximate
    counterpart.
    """
    from new_data_pipeline_spark.sources.tensorize import grouped_running_sum
    li = catalog.load(spark, sf_dir, "lineitem")
    w = li.select(F.col("l_returnflag").alias("flag"),
                  F.col("l_extendedprice").alias("price"),
                  F.floor("l_quantity").cast("bigint").alias("wt"),
                  "l_orderkey", "l_linenumber")
    c = grouped_running_sum(
        w, "flag", ["price", "l_orderkey", "l_linenumber"], "wt",
        out_col="cum", total_col="total", inclusive=True)
    return (c.filter(2 * F.col("cum") >= F.col("total"))
            .groupBy("flag", "total")
            .agg(F.min("price").alias("weighted_median_price"))
            .select("flag", F.col("total").cast("bigint")
                    .alias("total_weight"), "weighted_median_price"))


@register(
    "agg_exact_mode",
    oracle="""
    WITH c AS (
      SELECT l_returnflag AS flag, CAST(FLOOR(l_quantity) AS BIGINT) AS q,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2
    )
    SELECT flag,
           arg_min(q, CAST(-n AS BIGINT) * 1000 + q) AS mode_quantity,
           CAST(MAX(n) AS BIGINT) AS mode_count
    FROM c GROUP BY flag
    """,
    tags=("agg", "mode"),
)
def agg_exact_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MODE (most frequent quantity per return flag) with a
    deterministic smallest-value tie-break — the statistical aggregate
    ANSI added as MODE() but engines implement with arbitrary ties.
    Two map-combinable aggregations: value counts, then
    min_by(value, (-count, value)) encoded as one integer ordering key
    (quantities are bounded < 1000, so -n·1000 + q orders by count
    desc then value asc exactly).

    Scale: group × distinct-value counts then a per-group argmin —
    never a sort of the raw rows.
    """
    li = catalog.load(spark, sf_dir, "lineitem")
    c = (li.select(F.col("l_returnflag").alias("flag"),
                   F.floor("l_quantity").cast("bigint").alias("q"))
         .groupBy("flag", "q").agg(F.count(F.lit(1)).alias("n")))
    key = (-F.col("n")) * 1000 + F.col("q")
    return (c.groupBy("flag")
            .agg(F.min_by("q", key).alias("mode_quantity"),
                 F.max("n").cast("bigint").alias("mode_count")))
