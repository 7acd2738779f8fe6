"""Marketing-style conversion attribution over the event stream:
credit each purchase's preceding touches (the other event types)
under the three standard models — first-touch, last-touch, and
linear — within a fixed lookback window. The analytics twin of the
CEP funnel family: funnels ask "did the path complete", attribution
asks "which channel gets credit for the completion".

Determinism devices:
- touch ordering inside a conversion window is the OHLC composite key
  (zero-padded epoch-micros || zero-padded event_id — reshaping.py's
  device), so first/last are exact min_by/max_by on both engines;
- linear credit is SCALED-INTEGER: each of a conversion's n touches
  gets 10^6 DIV n micro-credits (truncating division, identical in
  Spark DIV and DuckDB //), so channel sums are exact integers and
  the reported double is a single final division.

Scale: the touch join is a per-user interval join (equi-key user_id +
time band), so its fan-out is bounded by per-user activity inside the
lookback — never a cross of conversions × touches; the three credit
models then run on |conversions| and |conversions × channels| sized
frames. All aggregates are map-combinable.

Reference analog: none — SURVEY.md §2.2 extension territory beside
the CEP/funnel family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

CONV_TYPE = "purchase"
LOOKBACK_HOURS = 24
LINEAR_SCALE = 10**6


@register(
    "events_attribution",
    oracle=f"""
    WITH conv AS (
      SELECT user_id, ts AS cts, event_id AS cid
      FROM events WHERE event_type = '{CONV_TYPE}'
    ), touch AS (
      SELECT user_id, ts AS tts, event_id AS tid, event_type AS channel
      FROM events WHERE event_type <> '{CONV_TYPE}'
    ), j AS (
      SELECT c.cid, t.channel,
             lpad(CAST(epoch_us(t.tts) AS VARCHAR), 20, '0')
               || lpad(CAST(t.tid AS VARCHAR), 12, '0') AS okey
      FROM conv c JOIN touch t ON c.user_id = t.user_id
       AND t.tts < c.cts
       AND t.tts >= c.cts - INTERVAL '{LOOKBACK_HOURS} hours'
    ), pc AS (
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS n,
             arg_min(channel, okey) AS first_ch,
             arg_max(channel, okey) AS last_ch
      FROM j GROUP BY cid
    ), cc AS (
      SELECT cid, channel, CAST(COUNT(*) AS BIGINT) AS c
      FROM j GROUP BY 1, 2
    ), lin AS (
      SELECT cc.channel,
             CAST(SUM(cc.c * ({LINEAR_SCALE} // pc.n)) AS BIGINT)
               AS linear_micro
      FROM cc JOIN pc USING (cid) GROUP BY cc.channel
    ), fst AS (
      SELECT first_ch AS channel, CAST(COUNT(*) AS BIGINT) AS first_touch
      FROM pc GROUP BY 1
    ), lst AS (
      SELECT last_ch AS channel, CAST(COUNT(*) AS BIGINT) AS last_touch
      FROM pc GROUP BY 1
    )
    SELECT lin.channel,
           COALESCE(fst.first_touch, 0) AS first_touch,
           COALESCE(lst.last_touch, 0) AS last_touch,
           lin.linear_micro,
           ROUND(CAST(lin.linear_micro AS DOUBLE) / {LINEAR_SCALE}, 6)
             AS linear_credit
    FROM lin
    LEFT JOIN fst USING (channel)
    LEFT JOIN lst USING (channel)
    ORDER BY channel
    """,
    tags=("events", "attribution", "funnel"),
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel conversion attribution: for every {CONV_TYPE} and
    the touches in its preceding {LOOKBACK_HOURS}-hour window,
    first-touch and last-touch conversion counts plus scaled-integer
    linear credit (each touch of an n-touch window earns
    {LINEAR_SCALE} DIV n micro-credits). Conversions with no touch in
    the window earn no credit anywhere (the unattributed tail). See
    module docstring for the determinism devices and the
    per-user-bounded interval join."""
    events = catalog.load(spark, sf_dir, "events")
    conv = (events.filter(F.col("event_type") == CONV_TYPE)
            .select("user_id", F.col("ts").alias("cts"),
                    F.col("event_id").alias("cid")))
    touch = (events.filter(F.col("event_type") != CONV_TYPE)
             .select("user_id", F.col("ts").alias("tts"),
                     F.col("event_id").alias("tid"),
                     F.col("event_type").alias("channel")))
    okey = F.concat(
        F.lpad(F.unix_micros("tts").cast("string"), 20, "0"),
        F.lpad(F.col("tid").cast("string"), 12, "0"))
    # r14: persist the attributed-touch rows and the per-conversion
    # aggregate — j feeds pc and cc (two non-identical consumers) and
    # pc feeds lin/fst/lst (three), so the interval join otherwise
    # re-executes per consumer (only its input shuffles are reused).
    # Both are narrow projections (|attributed touches| and
    # |conversions| rows); one final action, so the fill races at most
    # once and converges into the cache.
    j = (conv.join(touch, "user_id")
         .filter((F.col("tts") < F.col("cts"))
                 & (F.col("tts") >= F.col("cts")
                    - F.expr(f"INTERVAL {LOOKBACK_HOURS} HOURS")))
         .select("cid", "channel", okey.alias("okey"))
         .persist())
    pc = (j.groupBy("cid")
          .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
               F.expr("min_by(channel, okey)").alias("first_ch"),
               F.expr("max_by(channel, okey)").alias("last_ch"))
          .persist())
    cc = (j.groupBy("cid", "channel")
          .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    lin = (cc.join(pc.select("cid", "n"), "cid")
           .groupBy("channel")
           .agg(F.sum(F.col("c") * F.expr(f"{LINEAR_SCALE} DIV n"))
                .cast("bigint").alias("linear_micro")))
    fst = (pc.groupBy(F.col("first_ch").alias("channel"))
           .agg(F.count(F.lit(1)).cast("bigint").alias("first_touch")))
    lst = (pc.groupBy(F.col("last_ch").alias("channel"))
           .agg(F.count(F.lit(1)).cast("bigint").alias("last_touch")))
    return (lin.join(fst, "channel", "left").join(lst, "channel", "left")
            .select("channel",
                    F.coalesce("first_touch", F.lit(0)).cast("bigint")
                    .alias("first_touch"),
                    F.coalesce("last_touch", F.lit(0)).cast("bigint")
                    .alias("last_touch"),
                    "linear_micro",
                    F.round(F.col("linear_micro").cast("double")
                            / LINEAR_SCALE, 6).alias("linear_credit"))
            .orderBy("channel"))
