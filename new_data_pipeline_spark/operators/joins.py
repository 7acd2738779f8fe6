"""Join operators: every join type, broadcast strategy, theta/self joins,
and a scalable as-of join.

Reference analogs (SURVEY.md §2.1): the key-aligned MIMO zip
(reference serialize.py:731-795) and the binding-table join
(serialize.py:544-580) are both equi-joins on a key; the sorted-zip
multi-image scan (serialize.py:90-91) is a rank-join. The relational
join surface here generalizes all three.

Scale design: dimension sides are broadcast explicitly (`F.broadcast`)
so the big fact side never shuffles for them; big-big joins shuffle on
the join key and rely on AQE for skew splitting. The as-of join is a
single-shuffle union+window composition — the standard way to avoid a
per-row range probe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register


@register(
    "join_broadcast_dim",
    oracle="""
    SELECT r.r_name AS region,
           COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(s.s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("join", "broadcast"),
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact→dim star join with explicit broadcast of the dimensions.

    nation (25 rows) and region (5 rows) are broadcast at any scale
    factor — the supplier scan never shuffles.
    """
    supplier, nation, region = catalog.load_tables(
        spark, sf_dir, "supplier", "nation", "region")
    return (
        supplier
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"),
             F.sum(F.col("s_acctbal").cast("decimal(12,2)"))
              .cast("double").alias("total_acctbal"))
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE)
             AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders.

    COUNT over the nullable right key yields 0 for unmatched rows —
    the null-extension semantics the driver's hash will catch if wrong.
    """
    customer, orders = catalog.load_tables(spark, sf_dir, "customer", "orders")
    return (
        customer
        .join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"),
             F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(12,2)")),
                        F.lit(0).cast("decimal(12,2)"))
              .cast("double").alias("total_spent"))
    )


@register(
    "join_full_outer",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
    )
    SELECT COALESCE(c.c_custkey, p.o_custkey) AS custkey,
           c.c_mktsegment AS segment,
           COALESCE(p.n_orders, 0) AS n_orders
    FROM customer c
    FULL OUTER JOIN per_cust p ON c.c_custkey = p.o_custkey
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of customers against per-customer order counts."""
    customer, orders = catalog.load_tables(spark, sf_dir, "customer", "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        customer
        .join(per_cust, customer.c_custkey == per_cust.o_custkey, "full_outer")
        .select(F.coalesce("c_custkey", "o_custkey").alias("custkey"),
                F.col("c_mktsegment").alias("segment"),
                F.coalesce("n_orders", F.lit(0)).alias("n_orders"))
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS: customers with at least one urgent order.

    Semi joins never duplicate the left side and let Spark stop probing
    on first match — cheaper than join+distinct at scale.
    """
    customer, orders = catalog.load_tables(spark, sf_dir, "customer", "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer
        .join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS: customers that never ordered."""
    customer, orders = catalog.load_tables(spark, sf_dir, "customer", "orders")
    return (
        customer
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "join_theta_self",
    oracle="""
    SELECT p1.p_size AS size,
           COUNT(*) AS n_pairs
    FROM part p1
    JOIN part p2 ON p1.p_size = p2.p_size AND p1.p_partkey < p2.p_partkey
    WHERE p1.p_brand <> p2.p_brand
    GROUP BY p1.p_size
    """,
    tags=("join", "theta"),
)
def join_theta_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self theta-join: same-size part pairs across different brands.

    Scale design: the equi-part (p_size) drives the shuffle; the
    inequality predicates evaluate post-match, so this is NOT a cross
    join — cardinality is bounded per size bucket.
    """
    part = catalog.load(spark, sf_dir, "part")
    p1, p2 = part.alias("p1"), part.alias("p2")
    return (
        p1.join(p2, (F.col("p1.p_size") == F.col("p2.p_size"))
                & (F.col("p1.p_partkey") < F.col("p2.p_partkey")))
        .filter(F.col("p1.p_brand") != F.col("p2.p_brand"))
        .groupBy(F.col("p1.p_size").alias("size"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def asof_join(left: DataFrame, right: DataFrame, partition_key: str,
              left_ts: str, right_ts: str, value_cols: list[str],
              order_tiebreak: str) -> DataFrame:
    """Scalable as-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``partition_key``.

    Implementation is the single-shuffle union+window composition (no
    native Spark as-of join): tag both sides, sort within partition by
    (ts, tag, tiebreak) so a right row at the same ts sorts first, then
    carry the last non-null right value forward and keep left rows.
    At 100 TB this shuffles each side exactly once on partition_key and
    never builds per-row range probes; skewed keys are split by AQE.
    """
    lt = left.withColumn("__tag", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = right.withColumn("__tag", F.lit(0)).withColumn("__ts", F.col(right_ts))
    for c in value_cols:
        lt = lt.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
        rt = rt.withColumn(f"__r_{c}", F.col(c))
    cols = [partition_key, "__tag", "__ts", order_tiebreak] + [f"__r_{c}" for c in value_cols]
    merged = lt.select(*cols, *[c for c in left.columns if c not in cols]) \
               .unionByName(rt.select(*cols),
                            allowMissingColumns=True)
    w = (Window.partitionBy(partition_key)
         .orderBy("__ts", "__tag", order_tiebreak)
         .rowsBetween(Window.unboundedPreceding, 0))
    for c in value_cols:
        merged = merged.withColumn(
            f"asof_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))
    return (merged.filter(F.col("__tag") == 1)
            .drop("__tag", "__ts", *[f"__r_{c}" for c in value_cols]))


@register(
    "join_asof_event_streams",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, value, 1 AS tag FROM events
      WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, event_id, value, 0 AS tag FROM events
      WHERE event_type = 'view'
    ), carried AS (
      SELECT user_id, ts, event_id, value, tag,
             LAST_VALUE(CASE WHEN tag = 0 THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS asof_value
      FROM tagged
    )
    SELECT event_id, user_id, ts, value AS click_value, asof_value
    FROM carried WHERE tag = 1
    """,
    tags=("join", "asof"),
)
def join_asof_event_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event picks up the latest prior view value
    of the same user (ties: the view at the identical ts wins).

    Reference analog: the key-aligned stream zip (serialize.py:731-795)
    aligned streams by exact key; as-of generalizes it to time-aligned
    streams — a core primitive for feature/label alignment in training
    pipelines.
    """
    events = catalog.load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click") \
                   .select("user_id", "ts", "event_id", "value")
    views = events.filter(F.col("event_type") == "view") \
                  .select("user_id", "ts", "event_id", "value")
    out = asof_join(clicks, views, "user_id", "ts", "ts",
                    value_cols=["value"], order_tiebreak="event_id")
    return out.select("event_id", "user_id", "ts",
                      F.col("value").alias("click_value"),
                      F.col("asof_value"))


@register(
    "join_range_bands",
    oracle=f"""
    WITH bands AS (
      SELECT CAST(i AS BIGINT) AS band_id,
             i * 50.0 AS lo, (i + 1) * 50.0 AS hi
      FROM range(10) t(i)
    )
    SELECT band_id, lo, hi,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events JOIN bands ON value >= lo AND value < hi
    GROUP BY band_id, lo, hi
    ORDER BY band_id
    """,
    tags=("join", "range"),
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: events fall into value bands defined by
    [lo, hi) intervals of a generated dimension — the general non-equi
    join every pricing-tier / histogram-bucket workload needs.

    The band table broadcasts, so the inequality join is a broadcast
    nested-loop over 10 intervals per row — O(N·B) with tiny B and zero
    shuffle of events. Scale notes: when intervals are uniform (as
    here) the same query reduces to an equi-join on floor(value/width)
    — use that at 100 TB with irregular-band fallback to this plan; for
    big-big interval joins, bucket both sides by coarse range so each
    bucket pair joins locally.
    """
    events = catalog.load(spark, sf_dir, "events")
    bands = (spark.range(10)
             .select(F.col("id").alias("band_id"),
                     (F.col("id") * 50.0).alias("lo"),
                     ((F.col("id") + 1) * 50.0).alias("hi")))
    return (events.join(
        F.broadcast(bands),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .groupBy("band_id", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
             .alias("sum_value"))
        .orderBy("band_id"))


@register(
    "join_salted_skew",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY segment
    ORDER BY segment
    """,
    tags=("join", "skew", "salted"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant fact⋈dim join through the explicit salting path
    (plans/physical.salted_join): the fact side's key is salted
    deterministically, the dim side is exploded n_salts×, and the join
    runs on (key, salt) so a pathologically hot key spreads over
    n_salts shuffle partitions instead of one straggler task.

    The oracle is the PLAIN join — a hash match proves salting is
    result-invariant, which is the property that makes it safe to
    reach for when AQE's skew handling isn't enough. At this scale the
    salt is pure overhead; at 100 TB with one user generating 10% of
    events it is the difference between 32 balanced tasks and one
    32×-slower straggler.
    """
    from new_data_pipeline_spark.plans.physical import salted_join

    events = catalog.load(spark, sf_dir, "events") \
        .select("user_id", "value")
    cust = catalog.load(spark, sf_dir, "customer") \
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    joined = salted_join(events, cust, "user_id", n_salts=8)
    return (joined
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
                 .alias("sum_value"))
            .orderBy("segment"))


@register(
    "join_temporal_pointintime",
    oracle="""
    WITH changes AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM events WHERE event_type IN ('view', 'click')
    ), purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT COALESCE(c.state, 'unknown') AS state,
           COUNT(*) AS n_purchases,
           CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(p.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM purchases p LEFT JOIN changes c
      ON p.user_id = c.user_id AND p.ts >= c.valid_from
      AND (c.valid_to IS NULL OR p.ts < c.valid_to)
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("join", "temporal", "scd2"),
)
def join_temporal_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join — the consumer side of the SCD2 build
    (scd2_user_state): each purchase event joins the state interval
    that was valid AT its timestamp, answering "what was the user
    doing when they bought". Purchases before the user's first state
    change keep NULL → 'unknown' (left join, never dropped rows).

    Plan shape: the interval join is an equi-join on user_id with range
    residuals — one shuffle on the key, per-user intervals sorted and
    disjoint by construction (each probe matches ≤1 interval, so no
    post-join dedup). At 100 TB this beats the asof-union trick when
    the dimension is reused across many probe tables: build the SCD2
    intervals once, bucket both sides by user_id, and every PIT join
    is shuffle-free.
    """
    events = catalog.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (events.filter(F.col("event_type").isin("view", "click"))
               .select("user_id",
                       F.col("event_type").alias("state"),
                       F.col("ts").alias("valid_from"),
                       F.lead("ts").over(w).alias("valid_to")))
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "value"))
    cond = ((purchases.user_id == changes.user_id)
            & (purchases.ts >= changes.valid_from)
            & (changes.valid_to.isNull()
               | (purchases.ts < changes.valid_to)))
    return (purchases.join(changes, cond, "left")
            .groupBy(F.coalesce("state", F.lit("unknown")).alias("state"))
            .agg(F.count(F.lit(1)).alias("n_purchases"),
                 F.countDistinct(purchases.user_id).cast("bigint")
                 .alias("n_users"),
                 F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
                 .alias("sum_value"))
            .orderBy("state"))


@register(
    "join_asof_nearest",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
               AS is_purchase
      FROM events WHERE event_type IN ('click', 'purchase')
    ), seq AS (
      SELECT *,
             MAX(CASE WHEN is_click = 1 THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, is_click DESC,
                     event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_click_ts,
             MIN(CASE WHEN is_click = 1 THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, is_click DESC,
                     event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_click_ts
      FROM tagged
    )
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
           CASE
             WHEN prev_click_ts IS NULL AND next_click_ts IS NULL
               THEN CAST(-1 AS BIGINT)
             WHEN next_click_ts IS NULL
               THEN CAST(epoch_us(ts) - epoch_us(prev_click_ts) AS BIGINT)
             WHEN prev_click_ts IS NULL
               THEN CAST(epoch_us(next_click_ts) - epoch_us(ts) AS BIGINT)
             ELSE CAST(LEAST(epoch_us(ts) - epoch_us(prev_click_ts),
                             epoch_us(next_click_ts) - epoch_us(ts))
                       AS BIGINT)
           END AS nearest_click_gap_us
    FROM seq WHERE is_purchase = 1
    """,
    tags=("join", "asof", "nearest"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-event as-of: for each purchase, the time gap to the
    closest click in EITHER direction (backward as-of joins answer
    "what preceded"; attribution and sensor alignment often want
    "what's closest"). Same single-shuffle union+window shape as
    asof_join — both directions come from one partitioned sort: a
    running MAX of click times (backward) and a MIN over the following
    frame (forward), then pick the smaller gap. -1 marks purchases by
    users who never clicked.

    Scale: one shuffle on user_id, one within-partition sort, two
    frame aggregates — never a self-join of the event stream.
    """
    from pyspark.sql import Window as W
    events = catalog.load(spark, sf_dir, "events")
    tagged = (events.filter(F.col("event_type").isin("click", "purchase"))
              .select("user_id", "ts", "event_id",
                      (F.col("event_type") == "click").cast("int")
                      .alias("is_click"),
                      (F.col("event_type") == "purchase").cast("int")
                      .alias("is_purchase")))
    order = [F.col("ts"), F.col("is_click").desc(), F.col("event_id")]
    back = (W.partitionBy("user_id").orderBy(*order)
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    fwd = (W.partitionBy("user_id").orderBy(*order)
           .rowsBetween(W.currentRow, W.unboundedFollowing))
    click_ts = F.when(F.col("is_click") == 1, F.col("ts"))
    seq = (tagged
           .withColumn("prev_click_ts", F.max(click_ts).over(back))
           .withColumn("next_click_ts", F.min(click_ts).over(fwd)))
    gap_back = F.unix_micros("ts") - F.unix_micros("prev_click_ts")
    gap_fwd = F.unix_micros("next_click_ts") - F.unix_micros("ts")
    gap = (F.when(F.col("prev_click_ts").isNull()
                  & F.col("next_click_ts").isNull(), F.lit(-1))
           .when(F.col("next_click_ts").isNull(), gap_back)
           .when(F.col("prev_click_ts").isNull(), gap_fwd)
           .otherwise(F.least(gap_back, gap_fwd))).cast("bigint")
    return (seq.filter(F.col("is_purchase") == 1)
            .select("user_id", F.col("event_id").alias("purchase_id"),
                    F.col("ts").alias("purchase_ts"),
                    gap.alias("nearest_click_gap_us")))
