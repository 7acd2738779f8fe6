"""Reshaping & formatting operators: unpivot (stack), ordered string
aggregation, date formatting, and the regex surface.

Completes the relational-core inventory (SURVEY.md §2.2 scalar/set
rows) with the transforms that move data between wide and long layouts
and between typed and textual forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.functions.exact import money
from new_data_pipeline_spark.registry import register


@register(
    "unpivot_stack",
    oracle="""
    SELECT c_custkey,
           unnest(['acctbal', 'nationkey']) AS metric,
           unnest([CAST(c_acctbal AS DOUBLE), CAST(c_nationkey AS DOUBLE)])
             AS value
    FROM customer
    WHERE c_custkey <= 500
    """,
    tags=("reshape", "unpivot"),
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot via stack(): one row per (entity, metric).
    The inverse of agg_pivot — together they close the reshape loop."""
    cust = catalog.load(spark, sf_dir, "customer")
    return (cust.filter(F.col("c_custkey") <= 500)
            .select("c_custkey",
                    F.expr("""stack(2,
                        'acctbal', CAST(c_acctbal AS DOUBLE),
                        'nationkey', CAST(c_nationkey AS DOUBLE))
                        AS (metric, value)""")))


@register(
    "string_agg_ordered",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("reshape", "stringagg"),
)
def string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): deterministic because the
    collect is sorted before joining — unordered string_agg would be
    partition-order-dependent and unhashable."""
    nation = catalog.load(spark, sf_dir, "nation")
    return (nation.groupBy("n_regionkey")
            .agg(F.concat_ws(",", F.sort_array(F.collect_list("n_name")))
                 .alias("nations"),
                 F.count(F.lit(1)).alias("n_nations")))


@register(
    "date_format_strings",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m') AS ym,
           strftime(ts, '%Y-%m-%d %H:%M') AS ym_minute,
           CAST(CAST(ts AS DATE) AS TIMESTAMP) AS d,
           CAST(strptime('2024-06-15 12:00:00', '%Y-%m-%d %H:%M:%S')
                AS TIMESTAMP) AS fixed_ts,
           (ts < TIMESTAMP '2024-02-01') AS in_january
    FROM events WHERE event_id < 100
    """,
    tags=("scalar", "date", "format"),
)
def date_format_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp↔string round-trips: date_format out, to_timestamp in
    (Spark's yyyy-MM patterns vs the oracle's strftime — same text)."""
    events = catalog.load(spark, sf_dir, "events")
    return (events.filter(F.col("event_id") < 100)
            .select("event_id",
                    F.date_format("ts", "yyyy-MM").alias("ym"),
                    F.date_format("ts", "yyyy-MM-dd HH:mm").alias("ym_minute"),
                    # DATE cells reach pandas as date-vs-midnight-timestamp
                    # depending on the engine client — emit timestamps
                    F.to_date("ts").cast("timestamp").alias("d"),
                    F.to_timestamp(F.lit("2024-06-15 12:00:00"),
                                   "yyyy-MM-dd HH:mm:ss").alias("fixed_ts"),
                    (F.col("ts") < F.lit("2024-02-01").cast("timestamp"))
                    .alias("in_january")))


@register(
    "regex_surface",
    oracle="""
    SELECT p_partkey, p_type,
           regexp_matches(p_type, '^[A-Z]+ ') AS starts_word,
           regexp_extract(p_type, '([A-Z]+)$', 1) AS last_word,
           regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devoweled,
           CAST(len(regexp_extract_all(p_type, '[A-Z]+')) AS INTEGER)
             AS n_words,
           regexp_extract_all(p_type, '[A-Z]+')[1] AS first_word
    FROM part
    """,
    tags=("scalar", "regex"),
)
def regex_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate / extract / global replace / extract-all.
    Patterns stay in the Java∩RE2 common subset (character classes,
    anchors, +) so both engines agree."""
    part = catalog.load(spark, sf_dir, "part")
    return part.select(
        "p_partkey", "p_type",
        F.col("p_type").rlike(r"^[A-Z]+ ").alias("starts_word"),
        F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_type", r"[AEIOU]", "_").alias("devoweled"),
        F.size(F.regexp_extract_all("p_type", F.lit(r"[A-Z]+"), 0))
         .cast("integer").alias("n_words"),
        F.element_at(F.regexp_extract_all("p_type", F.lit(r"[A-Z]+"), 0), 1)
         .alias("first_word"))


@register(
    "timeseries_gapfill",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             COUNT(*) AS n_events,
             SUM(CAST(value AS DECIMAL(12,2))) AS sum_value
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT event_type,
             date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM events GROUP BY 1
    ), spine AS (
      SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM bounds
    )
    SELECT s.event_type,
           strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour,
           COALESCE(n_events, 0) AS n_events,
           CAST(last_value(hourly.sum_value IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS filled_sum
    FROM spine s
    LEFT JOIN hourly ON s.event_type = hourly.event_type AND s.h = hourly.h
    """,
    tags=("reshape", "timeseries", "pipeline"),
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap-fill: aggregate events to an hourly
    grid, generate the complete per-type hour spine with sequence(),
    left-join, and forward-fill the last observed value into gap hours.

    The standard densification pass before feature windows / charting —
    missing buckets must exist (n_events = 0) and carry the last known
    value. Spine generation is sequence()+explode from per-type min/max
    (no driver loop); the fill is last(ignorenulls) over an ordered
    window. Scale notes: the spine is |types| × |hours| — tiny relative
    to raw events, so the left join broadcasts the spine's aggregated
    side naturally under AQE; per-type window sort is the only shuffle
    and partitions by the same key as the aggregation, so AQE can reuse
    the exchange. Value sums go through decimal(12,2) operands so the
    fill is bit-exact against the oracle.
    """
    from pyspark.sql.window import Window

    events = catalog.load(spark, sf_dir, "events")
    hourly = (events
              .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.sum(F.col("value").cast("decimal(12,2)"))
                   .alias("sum_value")))
    spine = (events.groupBy("event_type")
             .agg(F.date_trunc("hour", F.min("ts")).alias("h0"),
                  F.date_trunc("hour", F.max("ts")).alias("h1"))
             .select("event_type",
                     F.explode(F.sequence(
                         "h0", "h1", F.expr("interval 1 hour"))).alias("h")))
    w = (Window.partitionBy("event_type").orderBy("h")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (spine.join(hourly, ["event_type", "h"], "left")
            .select("event_type",
                    F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
                    F.coalesce("n_events", F.lit(0)).alias("n_events"),
                    F.last("sum_value", ignorenulls=True).over(w)
                    .cast("double").alias("filled_sum")))


@register(
    "scd2_user_state",
    oracle="""
    SELECT user_id,
           event_type AS state,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to,
           (LEAD(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) IS NULL) AS is_current
    FROM events
    """,
    tags=("temporal", "scd2", "window"),
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from a change stream: each
    event opens a validity interval [valid_from, valid_to) closed by the
    user's next event; the open interval (valid_to IS NULL) is the
    current state. The warehouse-standard temporal-dimension layout —
    an as-of join against it answers "what was the user's state at t".

    Scale: one keyed window per user partition (shuffle on user_id,
    sort within); no self-join, no driver state. At 100 TB the events
    table is date-partitioned and the dimension rebuild is incremental
    per partition with a carry-over row per user.
    """
    from pyspark.sql import Window as W
    events = catalog.load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return events.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"))


@register(
    "timeseries_ohlc_bars",
    oracle="""
    WITH k AS (
      SELECT *,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '|'
               || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord
      FROM events
    )
    SELECT date_trunc('hour', ts) AS bar_ts, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           arg_min(value, ord) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, ord) AS close
    FROM k
    GROUP BY 1, 2
    """,
    tags=("timeseries", "ohlc", "resample"),
)
def timeseries_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling (the financial-bars shape of downsampling):
    hourly open/high/low/close of event values per type. Open/close
    are argmin/argmax over the (ts, event_id) total order — map-side
    combinable min_by/max_by, never a window sort (the argmin-window
    trap measured in operators/pq.py); values are picked, not
    computed, so the gate is float-exact with zero rounding devices.
    The ordering key is a zero-padded string encoding of
    (epoch-µs, event_id) — DuckDB's arg_min orders scalars only, and
    the string encoding is order-isomorphic on both engines.
    """
    events = catalog.load(spark, sf_dir, "events")
    key = F.concat(F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
                   F.lit("|"),
                   F.lpad(F.col("event_id").cast("string"), 12, "0"))
    return (events.groupBy(F.date_trunc("hour", "ts").alias("bar_ts"),
                           "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min_by("value", key).alias("open"),
                 F.max("value").alias("high"),
                 F.min("value").alias("low"),
                 F.max_by("value", key).alias("close")))


EWMA_DEPTH = 8  # alpha = 1/2; weights 2^-1 .. 2^-8 are exact doubles


@register(
    "timeseries_ewma",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, h, n,
             {", ".join(f"lag(n, {k}) OVER (PARTITION BY event_type "
                        f"ORDER BY h) AS l{k}" for k in range(1, 9))}
      FROM hourly
    )
    SELECT event_type, h, n,
           CAST(n AS DOUBLE) / 2
             {" ".join(f"+ COALESCE(l{k}, 0) / {2 ** (k + 1)}"
                       for k in range(1, 9))}
             AS ewma
    FROM lagged
    """,
    tags=("timeseries", "smoothing", "ewma"),
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of hourly event rates
    (α = 1/2, truncated at depth 8 — the smoothing primitive of
    monitoring/forecasting pipelines). The parity trick: α = 1/2 makes
    every weight an exact power of two, and the sum is a FIXED
    left-to-right chain of 9 LAG terms — no recursive state, no
    reduction-order ambiguity, no rounding device needed. The window
    is partitioned per series; missing leading lags coalesce to 0
    (the zero-initialized EWMA convention).

    Scale: one keyed aggregate + one partitioned window; depth is a
    constant, so the plan is the same at any history length.
    """
    from pyspark.sql import Window as W
    events = catalog.load(spark, sf_dir, "events")
    hourly = (events.groupBy("event_type",
                             F.date_trunc("hour", "ts").alias("h"))
              .agg(F.count(F.lit(1)).alias("n")))
    w = W.partitionBy("event_type").orderBy("h")
    ewma = F.col("n").cast("double") / 2
    out = hourly
    for k in range(1, EWMA_DEPTH + 1):
        out = out.withColumn(f"l{k}", F.lag("n", k).over(w))
        ewma = ewma + F.coalesce(F.col(f"l{k}"), F.lit(0)) / (2 ** (k + 1))
    return out.select("event_type", "h", "n", ewma.alias("ewma"))


@register(
    "timeseries_interpolate_linear",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             SUM(CAST(value AS DECIMAL(12,2))) AS sum_value
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT event_type,
             date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM events GROUP BY 1
    ), spine AS (
      SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
        AS h
      FROM bounds
    ), g AS (
      SELECT s.event_type, s.h,
             CAST(hourly.sum_value AS DOUBLE) AS v,
             CAST(epoch(s.h) AS BIGINT) AS ep
      FROM spine s
      LEFT JOIN hourly
        ON s.event_type = hourly.event_type AND s.h = hourly.h
    ), f AS (
      SELECT event_type, h, v, ep,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN ep END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS pe,
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN ep END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS ne
      FROM g
    )
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           (v IS NOT NULL) AS observed,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * (CAST(ep - pe AS DOUBLE)
                                 / CAST(ne - pe AS DOUBLE))
             WHEN pv IS NOT NULL THEN pv
             ELSE nv END, 6) AS interp_value
    FROM f
    """,
    tags=("reshape", "timeseries", "interpolation"),
)
def timeseries_interpolate_linear(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Time-series densification with LINEAR interpolation: gap hours
    get the straight line between the previous and next observed
    hourly values (position-weighted by epoch distance), edges clamp
    to the nearest observation — the resample stage sensor / metric
    pipelines run before feature windows, where forward-fill
    (timeseries_gapfill) would bias slopes.

    Scale notes: identical skeleton to timeseries_gapfill — the spine
    is |types| × |hours| (tiny vs raw events), the interpolation needs
    FOUR window passes (prev/next value + epoch) but all four share
    one (event_type ORDER BY h) sort, so the physical plan pays a
    single per-type shuffle+sort. The arithmetic enters double exactly
    once per operand (exact decimal sums upstream), and both engines
    evaluate the identical CASE/ratio tree, rounded 6 dp.
    """
    from pyspark.sql.window import Window

    events = catalog.load(spark, sf_dir, "events")
    hourly = (events
              .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
              .agg(F.sum(F.col("value").cast("decimal(12,2)"))
                   .alias("sum_value")))
    spine = (events.groupBy("event_type")
             .agg(F.date_trunc("hour", F.min("ts")).alias("h0"),
                  F.date_trunc("hour", F.max("ts")).alias("h1"))
             .select("event_type",
                     F.explode(F.sequence(
                         "h0", "h1", F.expr("interval 1 hour"))).alias("h")))
    g = (spine.join(hourly, ["event_type", "h"], "left")
         .select("event_type", "h",
                 F.col("sum_value").cast("double").alias("v"),
                 F.unix_timestamp("h").alias("ep")))
    wp = (Window.partitionBy("event_type").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = (Window.partitionBy("event_type").orderBy("h")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    ep_obs = F.when(F.col("v").isNotNull(), F.col("ep"))
    f = g.select(
        "event_type", "h", "v", "ep",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(ep_obs, ignorenulls=True).over(wp).alias("pe"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(ep_obs, ignorenulls=True).over(wn).alias("ne"))
    pv, nv = F.col("pv"), F.col("nv")
    ratio = ((F.col("ep") - F.col("pe")).cast("double")
             / (F.col("ne") - F.col("pe")).cast("double"))
    interp = (F.when(F.col("v").isNotNull(), F.col("v"))
              .when(pv.isNotNull() & nv.isNotNull(),
                    pv + (nv - pv) * ratio)
              .when(pv.isNotNull(), pv)
              .otherwise(nv))
    return f.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("v").isNotNull().alias("observed"),
        F.round(interp, 6).alias("interp_value"))


@register(
    "timeseries_cusum_changepoint",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT event_type,
             date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM events GROUP BY 1
    ), spine AS (
      SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
        AS h
      FROM bounds
    ), grid AS (
      SELECT s.event_type, s.h, COALESCE(hourly.x, 0) AS x
      FROM spine s LEFT JOIN hourly
        ON s.event_type = hourly.event_type AND s.h = hourly.h
    ), stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(x) AS BIGINT) AS total
      FROM grid GROUP BY 1
    ), dev AS (
      SELECT g.event_type, g.h,
             st.n_hours * g.x - st.total AS d,
             st.n_hours
      FROM grid g JOIN stats st ON g.event_type = st.event_type
    ), pre AS (
      SELECT event_type, h, n_hours,
             SUM(d) OVER (PARTITION BY event_type ORDER BY h
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS s
      FROM dev
    ), cus AS (
      SELECT event_type, h, n_hours,
             s - MIN(s) OVER (PARTITION BY event_type ORDER BY h
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS c
      FROM pre
    )
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS change_hour,
           CAST(n_hours AS BIGINT) AS n_hours,
           ROUND(CAST(c AS DOUBLE) / n_hours, 6) AS cusum_peak
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY c DESC, h ASC) AS rk
          FROM cus) WHERE rk = 1
    ORDER BY event_type
    """,
    tags=("reshape", "timeseries", "changepoint"),
)
def timeseries_cusum_changepoint(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint detection on per-type hourly event
    rates: the hour where the cumulative positive deviation from the
    type's mean rate peaks — the standard drift alarm a pipeline runs
    on ingestion volumes before retraining.

    Exactness device (the pagerank scaled-integer idea): the clamped
    CUSUM recurrence c_t = max(0, c_{t-1} + (x_t − μ)) is NOT a window
    expression, but it equals S_t − min_{j≤t} S_j for the prefix sums
    S of (x − μ) — and multiplying through by n_hours makes every term
    the exact INTEGER n·x_t − Σx, so both engines run integer window
    arithmetic end to end and divide once at the boundary. Two
    same-keyed running windows (prefix sum, running min) plus the
    argmax rank share ONE (event_type ORDER BY h) sort — a single
    shuffle over the |types|×|hours| grid, which is tiny relative to
    raw events at any scale.
    """
    from pyspark.sql.window import Window

    events = catalog.load(spark, sf_dir, "events")
    hourly = (events
              .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
              .agg(F.count(F.lit(1)).cast("bigint").alias("x")))
    spine = (events.groupBy("event_type")
             .agg(F.date_trunc("hour", F.min("ts")).alias("h0"),
                  F.date_trunc("hour", F.max("ts")).alias("h1"))
             .select("event_type",
                     F.explode(F.sequence(
                         "h0", "h1", F.expr("interval 1 hour"))).alias("h")))
    grid = (spine.join(hourly, ["event_type", "h"], "left")
            .select("event_type", "h",
                    F.coalesce("x", F.lit(0).cast("bigint")).alias("x")))
    stats = (grid.groupBy("event_type")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_hours"),
                  F.sum("x").cast("bigint").alias("total")))
    dev = (grid.join(stats, "event_type")
           .select("event_type", "h", "n_hours",
                   (F.col("n_hours") * F.col("x") - F.col("total"))
                   .alias("d")))
    run = (Window.partitionBy("event_type").orderBy("h")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pre = dev.withColumn("s", F.sum("d").over(run))
    cus = pre.withColumn("c", F.col("s") - F.min("s").over(run))
    rk = Window.partitionBy("event_type").orderBy(F.col("c").desc(),
                                                  F.col("h").asc())
    return (cus.withColumn("rk", F.row_number().over(rk))
            .filter(F.col("rk") == 1)
            .select("event_type",
                    F.date_format("h", "yyyy-MM-dd HH:mm:ss")
                    .alias("change_hour"),
                    F.col("n_hours").cast("bigint").alias("n_hours"),
                    F.round(F.col("c").cast("double") / F.col("n_hours"), 6)
                    .alias("cusum_peak"))
            .orderBy("event_type"))


# Seasonal decomposition: centered moving-average trend over ±SEAS_HALF
# hours (window width 2·SEAS_HALF+1 = 25, the classic odd-width choice
# covering one daily cycle), seasonal index = mean detrended value per
# hour-of-day. Only COMPLETE frames contribute (cnt == 25), the
# standard edge-bias rule — and the completeness predicate doubles as
# the determinism device (every contributing frame has exactly the
# same weight structure).
SEAS_HALF = 12
SEAS_W = 2 * SEAS_HALF + 1


@register(
    "timeseries_seasonal_decompose",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             SUM(CAST(value AS DECIMAL(12,2))) AS x
      FROM events GROUP BY 1, 2
    ), idx AS (
      SELECT event_type, h, x,
             CAST(epoch(h) AS BIGINT) // 3600 AS hidx
      FROM hourly
    ), framed AS (
      SELECT event_type, h, x,
             SUM(x) OVER w AS fsum,
             COUNT(*) OVER w AS fcnt
      FROM idx
      WINDOW w AS (PARTITION BY event_type ORDER BY hidx
                   RANGE BETWEEN {SEAS_HALF} PRECEDING
                             AND {SEAS_HALF} FOLLOWING)
    ), detr AS (
      -- 25·x − Σframe: EXACT decimal detrending, no division until
      -- the final rounded scalar (the decimal-monoid parity device)
      SELECT event_type, EXTRACT(hour FROM h) AS hour_of_day,
             {SEAS_W} * x - fsum AS d
      FROM framed WHERE fcnt = {SEAS_W}
    )
    SELECT event_type, CAST(hour_of_day AS BIGINT) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           ROUND(CAST(SUM(d) AS DOUBLE) / ({SEAS_W} * COUNT(*)), 6)
             AS seasonal
    FROM detr GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("timeseries", "seasonal", "decompose"),
)
def timeseries_seasonal_decompose(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of the hourly per-type value
    series: trend = centered {SEAS_W}-hour moving average (one daily
    cycle), seasonal index = mean detrended value per hour-of-day —
    the load-shape profile a pipeline reads before scheduling
    ingestion or normalizing per-hour metrics. Gaps are handled by a
    RANGE frame on the integer epoch-hour (a missing hour shrinks the
    frame, and incomplete frames are excluded outright), not a ROWS
    frame that would silently stretch across gaps.

    Parity: hourly sums are DECIMAL(12,2); detrending is computed as
    {SEAS_W}·x − Σframe — exact decimal arithmetic with no division
    anywhere until the final per-cell scalar, which both engines
    compute from identical operands and round to 6 dp.

    Scale: one map-combinable hourly aggregate (the only O(rows)
    stage), then a per-series RANGE window and a |types|·24-cell
    aggregate — O(series-length) state per partition, never a global
    sort."""
    from pyspark.sql import Window as W
    events = catalog.load(spark, sf_dir, "events")
    hourly = (events.groupBy("event_type",
                             F.date_trunc("hour", "ts").alias("h"))
              .agg(F.sum(money("value")).alias("x")))
    idx = hourly.withColumn(
        "hidx", (F.unix_seconds("h") / 3600).cast("bigint"))
    w = (W.partitionBy("event_type").orderBy("hidx")
         .rangeBetween(-SEAS_HALF, SEAS_HALF))
    framed = (idx.withColumn("fsum", F.sum("x").over(w))
              .withColumn("fcnt", F.count(F.lit(1)).over(w)))
    detr = (framed.filter(F.col("fcnt") == SEAS_W)
            .select("event_type", F.hour("h").alias("hour_of_day"),
                    (F.lit(SEAS_W) * F.col("x") - F.col("fsum"))
                    .alias("d")))
    return (detr.groupBy("event_type",
                         F.col("hour_of_day").cast("bigint")
                         .alias("hour_of_day"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hours"),
                 F.round(F.sum("d").cast("double")
                         / (SEAS_W * F.count(F.lit(1))), 6)
                 .alias("seasonal"))
            .orderBy("event_type", "hour_of_day"))
