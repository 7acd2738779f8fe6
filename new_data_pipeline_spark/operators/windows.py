"""Window-function operators: ranking, lag/lead, running/sliding frames.

Reference analogs (SURVEY.md §2.1): sequential key assignment (K1,
reference serialize.py:30-32,51-55) is row_number over a stable order;
batch numbering (R3, serialize.py:670,739) is a computed bucket over
that key — both reappear here and in sources/ingest_queries.py.

Scale design: a window shuffles once on its partition key and sorts
within partitions. Every window here partitions by a real key (never a
global orderBy without partitioning, which would serialize onto one
task at 100 TB — the K1 keying note in SURVEY §7 "What's hard").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register
from new_data_pipeline_spark.sources.tensorize import global_row_number


@register(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice DESC, o_orderkey)
                  AS BIGINT) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority: the canonical top-k-per-group
    (row_number + filter). Deterministic tiebreak on o_orderkey."""
    orders = catalog.load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders
        .select("o_orderpriority", "o_orderkey", "o_totalprice",
                F.row_number().over(w).cast("bigint").alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_rank_dense_ntile",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
    """,
    tags=("window",),
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK / NTILE over one global ordering — distributed.

    A bare ``Window.orderBy(...)`` serializes the table onto ONE task
    (Spark's "No Partition Defined" warning). Instead: range-partition
    on the ordering and compute a per-range row_number plus cumulative
    offsets (``global_row_number``, the K1 zipWithIndex pattern). The
    ordering tuple (s_acctbal DESC, s_suppkey) is unique, so
    RANK = DENSE_RANK = row_number exactly, and NTILE(k) is pure
    arithmetic on (row_number, total n): the first n%k buckets take
    n//k+1 rows. Every partition sorts only its own range.
    """
    supplier = catalog.load(spark, sf_dir, "supplier")
    keyed, n = global_row_number(
        supplier, [F.col("s_acctbal").desc(), F.col("s_suppkey")], "__rn")
    k = 4
    base, extra = n // k, n % k
    big = extra * (base + 1)  # rows covered by the (base+1)-sized buckets
    rn0 = F.col("__rn") - 1   # 0-based
    quartile = (F.when(rn0 < big, F.floor(rn0 / (base + 1)))
                 .otherwise(extra + F.floor((rn0 - big) / F.greatest(F.lit(base),
                                                                     F.lit(1))))
                + 1)
    return keyed.select(
        "s_suppkey", "s_nationkey", "s_acctbal",
        F.col("__rn").alias("rnk"),
        F.col("__rn").alias("drnk"),
        quartile.cast("bigint").alias("quartile"))


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, ts, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           LAG(value, 2, -1.0) OVER w AS prev2_or_default
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "lag"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD per user ordered by time — value pass-through, so parity
    is exact with no decimal games."""
    events = catalog.load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id", "event_id", "ts", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_or_default"))


@register(
    "window_running_sum",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(12,2)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_so_far
    FROM events
    """,
    tags=("window", "frame"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum/count per user (unbounded-preceding row frame).
    Decimal accumulation keeps the running sum exact at any length."""
    events = catalog.load(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return events.select(
        "user_id", "event_id", "ts",
        F.sum(F.col("value").cast("decimal(12,2)")).over(w)
         .cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_so_far"))


@register(
    "window_sliding_frame",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(12,2)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS sum_last3,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_last3
    FROM events
    """,
    tags=("window", "frame"),
)
def window_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 3-row frame (moving sum + count) per user."""
    events = catalog.load(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-2, W.currentRow))
    return events.select(
        "user_id", "event_id", "ts",
        F.sum(F.col("value").cast("decimal(12,2)")).over(w)
         .cast("double").alias("sum_last3"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_last3"))


@register(
    "window_pct_cume_nth",
    oracle="""
    SELECT p_partkey, p_size,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           nth_value(p_partkey, 3) OVER
             (ORDER BY p_size, p_partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS third_key
    FROM part
    WINDOW w AS (ORDER BY p_size, p_partkey)
    """,
    tags=("window", "rank"),
)
def window_pct_cume_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / nth_value — distributed.

    The ordering (p_size, p_partkey) is unique, so over n rows
    percent_rank = (rn-1)/(n-1) and cume_dist = rn/n, computed from the
    distributed global row_number instead of a single-task window (part
    scales with SF — the round-1 plan moved ALL parts to one task). The
    rank ratios divide identical ints, so doubles are parity-safe.
    nth_value(·, 3) is the rn=3 row broadcast back across the frame.
    """
    part = catalog.load(spark, sf_dir, "part")
    keyed, n = global_row_number(part, ["p_size", "p_partkey"], "__rn")
    if n >= 3:
        third = keyed.filter(F.col("__rn") == 3).select(
            F.col("p_partkey").alias("third_key"))
        keyed = keyed.crossJoin(F.broadcast(third))
    else:
        keyed = keyed.withColumn("third_key", F.lit(None).cast("bigint"))
    pct = (((F.col("__rn") - 1) / F.lit(n - 1)) if n > 1
           else F.lit(0.0))
    return keyed.select(
        "p_partkey", "p_size",
        pct.alias("pct_rank"),
        (F.col("__rn") / F.lit(n)).alias("cume"),
        "third_key")


@register(
    "window_range_frame",
    oracle="""
    SELECT s_suppkey, s_acctbal,
           CAST(COUNT(*) OVER (ORDER BY s_acctbal
                               RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)
                AS BIGINT) AS n_within_500,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2)))
                  OVER (ORDER BY s_acctbal
                        RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS sum_below_500
    FROM supplier
    """,
    tags=("window", "frame", "range"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames (value-based, not row-based): peers within ±500
    account-balance units. RANGE frames include ALL value-peers —
    different semantics from ROWS that the gate would catch if swapped.

    Distributed as a bucketed band self-join instead of a global
    single-task window: bucket = floor(bal/500), probe rows exploded to
    their 3 neighbor buckets, equi-join on bucket, |Δ| ≤ 500 filter,
    then one groupBy per current row. Any pair within 500 units is at
    most one bucket apart, so the join sees every frame member exactly
    once; the shuffle is on the bucket key, never a global sort.
    """
    supplier = catalog.load(spark, sf_dir, "supplier")
    width = 500
    cur = supplier.select(
        "s_suppkey", "s_acctbal",
        F.floor(F.col("s_acctbal") / width).alias("__bucket"))
    probe = supplier.select(
        F.col("s_acctbal").alias("__obal"),
        F.explode(F.array(
            F.floor(F.col("s_acctbal") / width) - 1,
            F.floor(F.col("s_acctbal") / width),
            F.floor(F.col("s_acctbal") / width) + 1)).alias("__bucket"))
    in_frame = (F.col("__obal") >= F.col("s_acctbal") - width) & \
               (F.col("__obal") <= F.col("s_acctbal") + width)
    below = F.col("__obal") <= F.col("s_acctbal")
    return (cur.join(probe, "__bucket")
            .groupBy("s_suppkey", "s_acctbal")
            .agg(
                F.sum(F.when(in_frame, 1).otherwise(0))
                 .cast("bigint").alias("n_within_500"),
                F.sum(F.when(in_frame & below,
                             F.col("__obal").cast("decimal(12,2)")))
                 .cast("double").alias("sum_below_500")))


@register(
    "sessionize_lag",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTES
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_seq,
           ts, event_id
    FROM marked
    """,
    tags=("window", "session"),
)
def sessionize_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (lag + cumulative sum) — the
    window-native construction of what session_window computes natively
    (stream_session_window); exposing both proves the equivalence the
    guide's sessionization pattern claims."""
    events = catalog.load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # interval arithmetic: µs-exact (unlike unix_timestamp's truncated
    # seconds) and valid for both TIMESTAMP and TIMESTAMP_NTZ inputs —
    # events.ts reads as NTZ from plain timestamp[us] parquet, which the
    # unix_micros() family rejects at analysis time
    marked = events.select(
        "user_id", "ts", "event_id",
        F.when(F.lag("ts").over(w).isNull()
               | (F.col("ts") - F.lag("ts").over(w)
                  > F.expr("INTERVAL 30 MINUTES")), 1)
         .otherwise(0).alias("is_new"))
    cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return marked.select(
        "user_id",
        F.sum("is_new").over(cum).cast("bigint").alias("session_seq"),
        "ts", "event_id")


@register(
    "window_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_type,
           CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event type per user via full-partition frames,
    collapsed with DISTINCT — a sessions-summary shape."""
    events = catalog.load(spark, sf_dir, "events")
    full = (W.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    return events.select(
        "user_id",
        F.first("event_type").over(full).alias("first_type"),
        F.last("event_type").over(full).alias("last_type"),
        F.count(F.lit(1)).over(W.partitionBy("user_id"))
         .cast("bigint").alias("n_events"),
    ).distinct()


@register(
    "window_distinct_over_frame",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(COUNT(DISTINCT event_type)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS distinct_types_last5,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_last5
    FROM events
    """,
    tags=("window", "distinct", "frame"),
)
def window_distinct_over_frame(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Distinct count over a sliding row frame (how many DIFFERENT
    event types in the user's last 5 actions — the behavioral-variety
    feature sessionization models use). Spark has no
    COUNT(DISTINCT) OVER, so the operator is expressed as
    size(collect_set() OVER frame) — semantically identical, and the
    per-row set is bounded by the frame length (5), so state stays
    O(frame), never O(cardinality). DuckDB replays it natively with
    COUNT(DISTINCT ...) OVER, making this a two-idiom parity gate.

    Scale: one keyed window (shuffle on user_id + within-partition
    sort shared by both frame expressions); the collect_set buffer is
    frame-bounded, so memory is O(rows_in_partition + frame), the same
    class as the moving sum next to it."""
    events = catalog.load(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-4, W.currentRow))
    return events.select(
        "user_id", "event_id", "ts",
        F.size(F.collect_set("event_type").over(w))
         .cast("bigint").alias("distinct_types_last5"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_last5"))


@register(
    "events_streak_islands",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS grp
      FROM events
    ), islands AS (
      SELECT user_id, event_type,
             CAST(COUNT(*) AS BIGINT) AS streak_len,
             strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS streak_start,
             strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS streak_end
      FROM seq GROUP BY user_id, event_type, grp
    )
    SELECT user_id, event_type, streak_len, streak_start, streak_end
    FROM islands
    ORDER BY streak_len DESC, user_id, streak_start, event_type
    LIMIT 20
    """,
    tags=("window", "gaps-islands", "sequence"),
)
def events_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: the 20 longest runs of CONSECUTIVE same-type
    events per user (did a user click 9 times in a row?) — the
    value-change grouping device (difference of two row_numbers is
    constant within an island), complementary to time-gap
    sessionization (sessionize_lag cuts on elapsed time; this cuts on
    value change regardless of time).

    Scale: both row_number windows sort by the SAME (ts, event_id)
    order and partition by user prefixes of one another, so the
    physical plan pays one user-keyed shuffle with one sort, the
    (user, type) window reusing the (user) sort order; the island
    aggregate is map-combinable and the top-20 is a TakeOrdered merge.
    The deterministic tie-break (len DESC, user, start, type — type
    included because colliding timestamps can start two same-user
    islands at one instant) makes the cut replayable."""
    events = catalog.load(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    wt = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = events.select(
        "user_id", "event_type", "ts",
        (F.row_number().over(wu) - F.row_number().over(wt)).alias("grp"))
    return (seq.groupBy("user_id", "event_type", "grp")
            .agg(F.count(F.lit(1)).cast("bigint").alias("streak_len"),
                 F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss")
                 .alias("streak_start"),
                 F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss")
                 .alias("streak_end"))
            .select("user_id", "event_type", "streak_len",
                    "streak_start", "streak_end")
            .orderBy(F.col("streak_len").desc(), "user_id",
                     "streak_start", "event_type")
            .limit(20))
