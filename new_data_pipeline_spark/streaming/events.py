"""Streaming operators over the events stream: windowed aggregation,
sessionization, stateful dedup — built once, run in batch OR streaming.

Reference analog (SURVEY.md §2.1 R3/X1): the reference's "streaming" is
an infinite batch-replay generator polled over HTTP
(reference serialize.py:731-733, server.py:176-205). Structured
Streaming replaces both: the same DataFrame transforms run incremental
with watermark-bounded state.

Every builder below takes a DataFrame that may come from ``spark.read``
(batch — used by the DuckDB-oracled queries) or ``spark.readStream``
(incremental — exercised in tests/test_streaming.py with a file source
and memory sink). That single-definition/two-runtimes property is the
point of the design: no operator forks on batch-vs-stream.

Scale notes: windowed aggs shuffle on (window, key) with partial
aggregation; watermarks bound state size (without one, 100 TB of
late-data state accumulates); file-source streaming at scale becomes
Kafka with the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from new_data_pipeline_spark.functions.exact import money


def _event_time(events: DataFrame) -> DataFrame:
    """Normalize ``ts`` to TIMESTAMP: plain timestamp[us] parquet reads
    as TIMESTAMP_NTZ, which EventTimeWatermark rejects outright. The
    cast is wall-clock-preserving under the engine's pinned UTC session
    zone and a no-op when ts is already TIMESTAMP. Streaming sources
    don't pass through catalog.load, so the builders normalize here."""
    if events.schema["ts"].dataType.simpleString() == "timestamp_ntz":
        return events.withColumn("ts", F.col("ts").cast("timestamp"))
    return events


def tumbling_counts(events: DataFrame, width: str = "1 hour",
                    watermark: str | None = None) -> DataFrame:
    """Tumbling-window counts/sums per event_type.

    In streaming mode the watermark closes windows ``watermark`` past
    the max observed ts and drops later-arriving rows (late-data
    policy); in batch mode it is a no-op and every window closes.
    """
    events = _event_time(events)
    src = events.withWatermark("ts", watermark) if watermark else events
    return (src.groupBy(F.window("ts", width).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(money("value")).cast("double").alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "total_value"))


def sliding_counts(events: DataFrame, width: str = "1 hour",
                   slide: str = "30 minutes",
                   watermark: str | None = None) -> DataFrame:
    """Sliding windows: each event lands in width/slide windows."""
    events = _event_time(events)
    src = events.withWatermark("ts", watermark) if watermark else events
    return (src.groupBy(F.window("ts", width, slide).alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"), "n_events"))


def sessionize(events: DataFrame, gap: str = "30 minutes",
               watermark: str | None = None) -> DataFrame:
    """Session windows per user: events within ``gap`` of each other
    merge; session end = last event + gap (session_window semantics)."""
    events = _event_time(events)
    src = events.withWatermark("ts", watermark) if watermark else events
    return (src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(money("value")).cast("double").alias("total_value"))
            .select("user_id",
                    F.col("s.start").alias("session_start"),
                    F.col("s.end").alias("session_end"),
                    "n_events", "total_value"))


RUNNING_STATS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running event count + value sum, persisted in the state store
    across micro-batches and re-emitted on every update.

    This is the reference's long-lived per-stream accumulators
    (reader flags + sample counters held in server memory, reference
    serialize.py:417-425,665-667) rebuilt on the engine's state store:
    fault-tolerant, partitioned by key, spillable — instead of process
    RAM. The same GroupState API hosts arbitrary Python state (online
    models, CUSUM detectors, …).

    Batch fallback: a plain groupBy produces the same final answer;
    tests pin stream-vs-batch equivalence.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as pd
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [round(total, 2)]})

    return (events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout))


def dedup_keep_first(events: DataFrame, keys: list[str],
                     watermark: str | None = None) -> DataFrame:
    """Stateful stream dedup: first event per key wins.

    With a watermark, uses ``dropDuplicatesWithinWatermark`` — the only
    form whose state is actually TTL'd when the event-time column is
    not part of the dedup keys (plain ``dropDuplicates`` only evicts
    state for keys that INCLUDE the event-time column, so its state
    grows without bound here). The trade: dedup is exact only among
    events within the watermark delay of each other — the bounded-state
    semantics a 100 TB stream needs. Without a watermark: exact global
    dedup, unbounded state — only for bounded replays. Batch: plain
    dropDuplicates, exact.
    """
    if watermark and events.isStreaming:
        return (_event_time(events).withWatermark("ts", watermark)
                .dropDuplicatesWithinWatermark(keys))
    return events.dropDuplicates(keys)


def interval_join(left: DataFrame, right: DataFrame,
                  gap: str = "30 minutes",
                  watermark: str | None = None,
                  how: str = "inner") -> DataFrame:
    """Stream-stream interval join: each left event pairs with right
    events of the same user whose ts falls in (left.ts - gap, left.ts].

    The time bound constrains BOTH directions relative to the other
    stream, which is what lets Structured Streaming evict join state:
    with a watermark on each side, buffered rows older than
    watermark + gap are dropped — bounded state on unbounded streams.
    In batch mode the same plan is a plain range-condition equi-join.

    ``how="left"`` gives the OUTER variant: left events with no match
    emit null-padded rows — in streaming, only once the watermark
    proves no match can still arrive (so outer results trail the
    watermark by one micro-batch; Spark requires watermarks on both
    sides plus the event-time range condition, which this builder
    always supplies).

    Scale: equi-join on user_id (the range condition rides along as a
    post-join filter on the same shuffle); state per key is bounded by
    gap × arrival rate.
    """
    l, r = _event_time(left), _event_time(right)
    if watermark:
        l = l.withWatermark("ts", watermark)
        r = r.withWatermark("ts", watermark)
    l, r = l.alias("l"), r.alias("r")
    cond = ((F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") > F.col("l.ts") - F.expr(f"INTERVAL {gap}"))
            & (F.col("r.ts") <= F.col("l.ts")))
    return (l.join(r, cond, how)
            .select(F.col("l.user_id").alias("user_id"),
                    F.col("l.event_id").alias("left_id"),
                    F.col("r.event_id").alias("right_id"),
                    F.col("l.ts").alias("left_ts"),
                    F.col("r.ts").alias("right_ts")))


def enriched_segment_counts(events: DataFrame, customer: DataFrame,
                            width: str = "1 hour",
                            watermark: str | None = None) -> DataFrame:
    """Stream-STATIC dimension join + windowed aggregation: each event
    enriches against the (bounded, broadcast) customer dimension as it
    arrives, then rolls into tumbling per-segment windows. Users with
    no customer row survive the left join as 'unknown' — a streaming
    inner join would silently drop them.

    The streaming-plan shape that matters at scale: the static side
    broadcasts once per (re)plan, the stream side never shuffles for
    the join, and only the windowed aggregation keeps state. Contrast
    stream_interval_join, where BOTH sides are unbounded and the
    watermark must bound the join state itself.
    """
    events = _event_time(events)
    src = events.withWatermark("ts", watermark) if watermark else events
    dim = customer.select(F.col("c_custkey").alias("user_id"),
                          "c_mktsegment")
    joined = src.join(F.broadcast(dim), ["user_id"], "left")
    return (joined
            .groupBy(F.window("ts", width).alias("w"),
                     F.coalesce("c_mktsegment", F.lit("unknown"))
                     .alias("segment"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(money("value")).cast("double").alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "segment", "n_events", "total_value"))
