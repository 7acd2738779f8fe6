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


@register(
    "profile_referential_integrity",
    oracle="""
    SELECT 'orders_without_customer' AS check_name,
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS n_rows
    UNION ALL
    SELECT 'lineitem_without_order',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem_without_supplier',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey))
    UNION ALL
    SELECT 'customers_without_orders',
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey))
    """,
    tags=("profiling", "quality", "integrity"),
)
def profile_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit: orphaned fact rows per
    foreign key (hard errors) plus unreferenced dimension rows
    (coverage signal). The check a 100 TB ingest runs after every load —
    silent FK breakage is how joins start dropping revenue.

    Scale: each check is a left-anti join on the FK; dimension sides
    broadcast when small, fact-fact (lineitem→orders) shuffles on the
    key that bucketing co-locates at scale. Four independent counts
    union into one 4-row report.
    """
    customer, orders, lineitem, supplier = catalog.load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier")

    def orphans(name: str, fact: DataFrame, dim: DataFrame,
                fk: str, pk: str) -> DataFrame:
        return (fact.join(dim, fact[fk] == dim[pk], "left_anti")
                .agg(F.count(F.lit(1)).alias("n_rows"))
                .select(F.lit(name).alias("check_name"), "n_rows"))

    return (orphans("orders_without_customer", orders, customer,
                    "o_custkey", "c_custkey")
            .unionAll(orphans("lineitem_without_order", lineitem, orders,
                              "l_orderkey", "o_orderkey"))
            .unionAll(orphans("lineitem_without_supplier", lineitem, supplier,
                              "l_suppkey", "s_suppkey"))
            .unionAll(orphans("customers_without_orders", customer, orders,
                              "c_custkey", "o_custkey")))


HIST_BUCKET_W = 50_000  # o_totalprice equi-width bucket size


@register(
    "profile_value_histogram",
    oracle=f"""
    SELECT CAST(floor(o_totalprice / {HIST_BUCKET_W}) AS BIGINT) AS bucket,
           CAST(floor(o_totalprice / {HIST_BUCKET_W}) * {HIST_BUCKET_W}
                AS DOUBLE) AS bucket_lo,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
             AS total_value
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("profiling", "histogram"),
)
def profile_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value distribution of order totals (one bucket per
    50k): the shape check that catches unit regressions (cents vs
    dollars) and truncated loads at a glance.

    Scale: pure integer bucket math per row + one map-combinable
    aggregation — the cheapest full-table distribution profile there
    is; decimal-exact sums for hash parity and drift-free totals.
    """
    orders = catalog.load(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / HIST_BUCKET_W)
    return (orders.groupBy(
                bucket.cast("bigint").alias("bucket"),
                (bucket * HIST_BUCKET_W).cast("double").alias("bucket_lo"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
                  .cast("double").alias("total_value")))


@register(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
      FROM events
    )
    SELECT f.cohort_week, a.active_week,
           CAST(datediff('week', f.cohort_week, a.active_week) AS BIGINT)
             AS weeks_since,
           COUNT(*) AS n_active_users
    FROM firsts f JOIN activity a USING (user_id)
    GROUP BY 1, 2, 3
    """,
    tags=("analytics", "retention", "cohort"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week,
    counted in every week they return — THE product-analytics query,
    and the corpus-freshness query when "users" are data sources.

    Scale: one aggregation for first-weeks (map-combinable MIN), one
    distinct on (user, week), an equi-join on user_id (broadcast when
    the cohort table is small), and a final keyed count. No windows, no
    self-join on events.
    """
    events = catalog.load(spark, sf_dir, "events")
    # TIMESTAMP-typed weeks on BOTH sides: DuckDB's date_trunc('week')
    # yields DATE, Spark's yields TIMESTAMP — and the two gate styles
    # disagree on DATE (pandas turns DuckDB DATE into a midnight
    # Timestamp while Spark DateType stays a date object). A timestamp
    # column converts identically on every path, so the oracle casts
    # its weeks to TIMESTAMP and Spark keeps its native ones.
    firsts = (events.groupBy("user_id")
              .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week")))
    activity = (events
                .select("user_id", F.date_trunc("week", "ts").alias("active_week"))
                .distinct())
    weeks = (F.floor(F.datediff(F.to_date("active_week"),
                                F.to_date("cohort_week")) / 7))
    return (firsts.join(activity, "user_id")
            .groupBy("cohort_week", "active_week",
                     weeks.cast("bigint").alias("weeks_since"))
            .agg(F.count(F.lit(1)).alias("n_active_users")))


@register(
    "anomaly_event_rate",
    oracle="""
    WITH rates AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ), stats AS (
      SELECT median(n) AS med FROM rates
    ), dev AS (
      SELECT user_id, n, abs(n - med) AS ad FROM rates, stats
    ), mad AS (
      SELECT median(ad) AS mad FROM dev
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n_events,
           CAST(ad AS DOUBLE) AS abs_dev,
           (ad > 3 * mad) AS is_anomaly
    FROM dev, mad
    """,
    tags=("profiling", "anomaly", "robust-stats"),
)
def anomaly_event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-statistics anomaly screen over per-user event rates:
    flag users whose |rate − median| exceeds 3×MAD (median absolute
    deviation). Median/MAD instead of mean/stddev because the outliers
    being hunted poison the moments that would detect them.

    Parity: medians interpolate identically ((a+b)/2 on even counts —
    exact in binary for integer inputs) so the gate is hash-exact.
    Scale: rates are one map-combinable count; the two scalar medians
    broadcast back. Exact single-group percentile materializes its
    group in one task — at billions of users switch the scalar to
    approx_percentile (same plan shape, bounded memory).
    """
    events = catalog.load(spark, sf_dir, "events")
    rates = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    med = rates.agg(F.expr("percentile(n, 0.5D)").alias("med"))
    dev = (rates.crossJoin(F.broadcast(med))
           .withColumn("ad", F.abs(F.col("n") - F.col("med"))))
    mad = dev.agg(F.expr("percentile(ad, 0.5D)").alias("mad"))
    return (dev.crossJoin(F.broadcast(mad))
            .select("user_id",
                    F.col("n").cast("bigint").alias("n_events"),
                    F.col("ad").cast("double").alias("abs_dev"),
                    (F.col("ad") > 3 * F.col("mad")).alias("is_anomaly")))


ROLLING_WEEKS = 4  # 28-day active-user window, sliding weekly


@register(
    "active_users_rolling",
    oracle=f"""
    WITH weeks AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
      FROM events
    ), contrib AS (
      SELECT user_id, wk + (7 * o.n) * INTERVAL 1 DAY AS window_week
      FROM weeks, range(0, {ROLLING_WEEKS}) AS o(n)
    )
    SELECT window_week, COUNT(DISTINCT user_id) AS n_active_4w
    FROM contrib
    GROUP BY window_week
    """,
    tags=("analytics", "rolling", "distinct"),
)
def active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 4-week active users per week (the MAU curve): each
    (user, activity-week) pair contributes to the {ROLLING_WEEKS}
    window-weeks it keeps the user "active" in — the explode-into-
    windows construction, the only shape that computes sliding DISTINCT
    counts distributively (a window frame cannot, because distinct
    doesn't decompose over frames).

    Scale: the distinct (user, week) pre-aggregation shrinks events by
    the user's weekly event rate BEFORE the 4× explode; the final
    count-distinct shuffles (window_week, user) pairs once.
    """
    events = catalog.load(spark, sf_dir, "events")
    weeks = (events
             .select("user_id", F.date_trunc("week", "ts").alias("wk"))
             .distinct())
    contrib = weeks.select(
        "user_id",
        F.explode(F.array(*[
            F.col("wk") + F.expr(f"INTERVAL {7 * n} DAYS")
            for n in range(ROLLING_WEEKS)])).alias("window_week"))
    return (contrib.groupBy("window_week")
            .agg(F.countDistinct("user_id").alias("n_active_4w")))


@register(
    "cumulative_unique_users",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS first_week
      FROM events GROUP BY user_id
    ), per_week AS (
      SELECT first_week AS week, COUNT(*) AS n_new FROM firsts GROUP BY 1
    )
    SELECT week,
           CAST(n_new AS BIGINT) AS n_new_users,
           CAST(SUM(n_new) OVER (ORDER BY week
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS n_total_users
    FROM per_week
    """,
    tags=("analytics", "cumulative", "distinct"),
)
def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative unique users per week (the all-time growth curve).
    Running COUNT(DISTINCT) does not decompose over window frames, so
    the plan transforms it: distinct-count becomes each user's FIRST
    week (one aggregation), and the cumulative curve is a running SUM
    of the tiny per-week new-user series — sums decompose where
    distincts cannot.

    Scale: the heavy aggregation keys on user_id (map-combinable MIN);
    the window runs over one row per week — thousands of rows at any
    corpus size, safe even unpartitioned.
    """
    from pyspark.sql import Window as W
    events = catalog.load(spark, sf_dir, "events")
    firsts = (events.groupBy("user_id")
              .agg(F.date_trunc("week", F.min("ts")).alias("first_week")))
    per_week = (firsts.groupBy(F.col("first_week").alias("week"))
                .agg(F.count(F.lit(1)).alias("n_new")))
    w = W.orderBy("week").rowsBetween(W.unboundedPreceding, W.currentRow)
    return per_week.select(
        "week",
        F.col("n_new").cast("bigint").alias("n_new_users"),
        F.sum("n_new").over(w).cast("bigint").alias("n_total_users"))


@register(
    "event_path_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS t1,
             LEAD(event_type, 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || ' > ' || t1 || ' > ' || t2 AS path,
           COUNT(*) AS n
    FROM seq
    WHERE t1 IS NOT NULL AND t2 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 20
    """,
    tags=("analytics", "sequence", "path"),
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: the 20 most common 3-step event-type
    sequences across users (click > view > purchase ...), the sequence
    analysis behind funnel discovery — here over user journeys, in a
    corpus pipeline over document-processing stage logs.

    Scale: one keyed window per user (shuffle on user_id, sort within)
    builds the trigram per row via LEAD — no self-joins; counting is
    map-combinable and the top-20 is a TakeOrdered merge, not a global
    sort.
    """
    from pyspark.sql import Window as W
    events = catalog.load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"))
    return (seq.filter(F.col("t1").isNotNull() & F.col("t2").isNotNull())
            .select(F.concat_ws(" > ", "event_type", "t1", "t2").alias("path"))
            .groupBy("path").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), "path")
            .limit(20))


@register(
    "profile_source_drift",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ), csw AS (
      SELECT source, w, COUNT(*) AS c_sw FROM tok GROUP BY 1, 2
    ), cw AS (
      SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w FROM csw GROUP BY w
    ), ns AS (
      SELECT source, CAST(SUM(c_sw) AS BIGINT) AS n_s,
             COUNT(*) AS n_distinct
      FROM csw GROUP BY source
    ), nn AS (
      SELECT CAST(SUM(c_w) AS BIGINT) AS n FROM cw
    ), terms AS (
      SELECT csw.source,
             CAST(ROUND((CAST(csw.c_sw AS DOUBLE) / ns.n_s)
                        * ROUND(ln(CAST(csw.c_sw * (SELECT n FROM nn)
                                        AS DOUBLE)
                                   / (ns.n_s * cw.c_w)), 6),
                        9) AS DECIMAL(18,9)) AS term
      FROM csw
      JOIN cw ON csw.w = cw.w
      JOIN ns ON csw.source = ns.source
    )
    SELECT ns.source, ns.n_s AS n_tokens, ns.n_distinct,
           ROUND(CAST(t.kl AS DOUBLE), 6) AS kl_divergence
    FROM ns
    JOIN (SELECT source, SUM(term) AS kl FROM terms GROUP BY source) t
      ON ns.source = t.source
    """,
    tags=("profiling", "drift", "kl"),
)
def profile_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution drift: KL(P_source || P_corpus) —
    the domain-shift screen a curation run uses to spot a source whose
    language stopped looking like the rest of the corpus (CCNet runs
    the same comparison against a reference LM).

    KL(P||Q) = Σ_w p·ln(p/q) with p = c_sw/N_s, q = c_w/N; every token
    of a source exists in the corpus, so q > 0 and the sum is finite.

    Scale: three map-combinable aggregates (token counts per source,
    per corpus, totals) joined on the vocabulary-sized key — document
    text never crosses a shuffle twice; the corpus total enters as a
    1-row aggregate.

    Parity devices: ln is 6-dp-rounded FIRST (identical doubles on
    both engines), the p·ln product of identical doubles is IEEE-
    deterministic, each term is 9-dp-rounded into DECIMAL(18,9) so the
    per-source sum is an exact monoid, and the final KL is 6-dp.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("w"))
    # (source, word) counts feed THREE non-identical consumers (corpus
    # counts, per-source totals, the term join) — persist + eager fill
    # so the explode-and-count subtree computes once, not once per
    # consumer (r9 audit: alpha 0.66 → re-measured after; the cache
    # is vocabulary-sized, not token-sized)
    csw = (tok.groupBy("source", "w")
           .agg(F.count(F.lit(1)).alias("c_sw")).persist())
    csw.count()
    cw = csw.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    ns = csw.groupBy("source").agg(F.sum("c_sw").alias("n_s"),
                                   F.count(F.lit(1)).alias("n_distinct"))
    nn = cw.agg(F.sum("c_w").alias("n"))
    lnr = F.round(F.log((F.col("c_sw") * F.col("n")).cast("double")
                        / (F.col("n_s") * F.col("c_w"))), 6)
    term = F.round((F.col("c_sw").cast("double") / F.col("n_s")) * lnr, 9) \
        .cast("decimal(18,9)")
    terms = (csw.join(cw, "w").join(ns, "source").crossJoin(nn)
             .select("source", term.alias("term")))
    kl = terms.groupBy("source").agg(F.sum("term").alias("kl"))
    return (ns.join(kl, "source")
            .select("source", F.col("n_s").alias("n_tokens"), "n_distinct",
                    F.round(F.col("kl").cast("double"), 6)
                    .alias("kl_divergence")))


PATTERN = "view,click,purchase"


@register(
    "events_pattern_match",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             array_to_string(list(event_type ORDER BY ts, event_id), ',')
               AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           (length(s) - length(replace(s, '{PATTERN}', '')))
             // length('{PATTERN}') AS n_patterns
    FROM seq
    WHERE length(s) <> length(replace(s, '{PATTERN}', ''))
    """,
    tags=("analytics", "cep", "pattern"),
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP-style STRICT-contiguity pattern detection: per user, count
    non-overlapping contiguous view→click→purchase runs in the exact
    event sequence (MATCH_RECOGNIZE's simplest pattern class;
    funnel_conversion is the relaxed any-gap version, this is the
    no-intervening-event one).

    The sequence materializes as a per-user ordered token string
    (sort_array over (ts, event_id, type) structs — one keyed
    aggregation, no window, no self-join), and the count falls out of
    length arithmetic on non-overlapping replace — identical
    left-to-right semantics on both engines. Event-type tokens are
    from a fixed closed vocabulary, so a comma-joined pattern cannot
    misalign across token boundaries.

    Scale: state per user is its event-type string — for unbounded
    histories the same count is computable from (prev 2 types, count)
    running state via applyInPandasWithState on the streaming path.
    """
    events = catalog.load(spark, sf_dir, "events")
    seq = (events.groupBy("user_id")
           .agg(F.concat_ws(",", F.transform(
               F.sort_array(F.collect_list(
                   F.struct("ts", "event_id", "event_type"))),
               lambda x: x["event_type"])).alias("s")))
    plen = len(PATTERN)
    stripped = F.replace(F.col("s"), F.lit(PATTERN), F.lit(""))
    n = F.expr(f"(length(s) - length(replace(s, '{PATTERN}', '')))"
               f" DIV {plen}")
    return (seq.filter(F.length("s") != F.length(stripped))
            .select("user_id", n.alias("n_patterns")))


SKIP_PATTERN = "view(,click)+,purchase"
# the synthetic events table is time-sparse per user (~minutes-to-days
# between events), so the session bound is 2 days — 563 sessions / 276
# matches at sf0.01; a web-analytics deployment would use 30 minutes
SESSION_GAP = "INTERVAL 2 DAYS"
# Hard per-session state bound: only the first CAP relevant tokens of a
# session enter the pattern string (row_number filter BEFORE the
# collect_list, so the agg buffer itself is bounded, not just the
# output). At 100× event density a heavy user's whole history can
# collapse into ONE 2-day-gap session; without the cap that session's
# token string is the unbounded object (VERDICT r5). Matches past the
# cap are not counted — the documented bounded-state trade; both
# engines truncate identically so the gate stays exact. 512 × ~9 B
# ≈ 5 KB ceiling per session; max observed session is 52 tokens at
# sf0.01, 65 at sf0.1, so gated output is unchanged at test scales.
SESSION_TOKEN_CAP = 512

# Shared by events_pattern_skip_match (batch regex device, below) and
# cep_stream_funnel (streaming/event_queries.py — the NFA executed in
# batch): both must equal this sessionize→tokenize→regex-count replay,
# proving automaton ≡ regex across engines.
SKIP_MATCH_ORACLE = f"""
    WITH rel AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ), marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > {SESSION_GAP}
                  THEN 1 ELSE 0 END AS is_new
      FROM rel
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, event_type, ts, event_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM marked
    ), capped AS (
      SELECT user_id, session_seq, event_type, ts, event_id
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
                                     ORDER BY ts, event_id) AS rn
        FROM sess
      ) WHERE rn <= {SESSION_TOKEN_CAP}
    ), seqs AS (
      SELECT user_id, session_seq,
             array_to_string(list(event_type ORDER BY ts, event_id), ',')
               AS s
      FROM capped GROUP BY user_id, session_seq
    ), counted AS (
      SELECT user_id, session_seq,
             len(regexp_extract_all(s, '{SKIP_PATTERN}')) AS n
      FROM seqs
    )
    SELECT user_id,
           CAST(SUM(n) AS BIGINT) AS n_matches,
           CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sessions_matched
    FROM counted GROUP BY user_id HAVING SUM(n) > 0
    """


@register(
    "events_pattern_skip_match",
    oracle=SKIP_MATCH_ORACLE,
    tags=("analytics", "cep", "pattern", "quantifier"),
)
def events_pattern_skip_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP skip-till-next-match with a quantifier: count per user the
    non-overlapping ``view click+ purchase`` funnels completed inside a
    2-day-gap session, SKIPPING irrelevant events (error/signup)
    between pattern elements — the MATCH_RECOGNIZE class
    (``PATTERN (V C+ P) AFTER MATCH SKIP PAST LAST ROW`` over a
    relevance-filtered stream with a session time bound) that
    events_pattern_match's strict-contiguity device cannot express.

    Construction: relevance filter → gaps-and-islands sessionization
    (lag + cumulative sum, the sessionize_lag device) → per-session
    ordered token string → leftmost non-overlapping regex count
    (``view(,click)+,purchase``). Java and RE2 regex agree on
    leftmost-earliest non-overlapping counting for this pattern, and
    the closed comma-joined vocabulary cannot misalign across token
    boundaries. The time bound is the session gap: no match spans a
    silence longer than SESSION_GAP.

    Scale: two keyed shuffles (user window, session groupBy) and state
    HARD-bounded at SESSION_TOKEN_CAP relevant tokens per session (see
    the cap comment) — never the corpus, never an unbounded session. On
    the streaming path the same pattern runs as an
    applyInPandasWithState NFA keyed by user, the standard CEP
    deployment; this batch twin is the oracle-checkable shape.
    """
    events = catalog.load(spark, sf_dir, "events")
    return skip_match_counts(events)


def skip_match_counts(events: DataFrame,
                      token_cap: int = None) -> DataFrame:
    """The skip-till-next-match pipeline over an arbitrary events frame
    (unit-testable core of events_pattern_skip_match; columns used:
    user_id, ts, event_id, event_type)."""
    from pyspark.sql import Window as W
    if token_cap is None:
        token_cap = SESSION_TOKEN_CAP
    rel = events.filter(
        F.col("event_type").isin("view", "click", "purchase"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = rel.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(F.lag("ts").over(w).isNull()
               | (F.col("ts") - F.lag("ts").over(w)
                  > F.expr(SESSION_GAP)), 1)
         .otherwise(0).alias("is_new"))
    cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = marked.select(
        "user_id", "event_type", "ts", "event_id",
        F.sum("is_new").over(cum).alias("session_seq"))
    # state bound: first CAP relevant tokens per session; the
    # (user_id, session_seq) window reuses the user_id hash
    # partitioning (HashPartitioning(user_id) satisfies the clustered
    # distribution on the superset key) — a sort, not a new shuffle
    wsess = W.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    sess = (sess.withColumn("rn", F.row_number().over(wsess))
            .filter(F.col("rn") <= token_cap))
    seqs = (sess.groupBy("user_id", "session_seq")
            .agg(F.concat_ws(",", F.transform(
                F.sort_array(F.collect_list(
                    F.struct("ts", "event_id", "event_type"))),
                lambda x: x["event_type"])).alias("s")))
    counted = seqs.select(
        "user_id",
        F.regexp_count(F.col("s"), F.lit(SKIP_PATTERN)).alias("n"))
    return (counted.groupBy("user_id")
            .agg(F.sum("n").cast("bigint").alias("n_matches"),
                 F.sum(F.when(F.col("n") > 0, 1).otherwise(0))
                 .cast("bigint").alias("n_sessions_matched"))
            .filter(F.col("n_matches") > 0))


@register(
    "profile_benford_deviation",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders WHERE o_totalprice > 0
    ), obs AS (
      SELECT digit, COUNT(*) AS n FROM d GROUP BY digit
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS t FROM obs
    )
    SELECT obs.digit, obs.n,
           ROUND(CAST(obs.n AS DOUBLE) / (SELECT t FROM tot), 6)
             AS observed_share,
           ROUND(log10(1.0 + 1.0 / obs.digit), 6) AS benford_share,
           ROUND(ABS(CAST(obs.n AS DOUBLE) / (SELECT t FROM tot)
                     - ROUND(log10(1.0 + 1.0 / obs.digit), 6)), 6)
             AS abs_deviation
    FROM obs
    """,
    tags=("profiling", "quality", "benford"),
)
def profile_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen on order totals (the accounting
    anomaly test: organically-generated amounts follow
    P(d) = log10(1 + 1/d); synthetic or tampered ones don't).
    First digits are taken from explicitly FLOORed integer cents —
    never a bare double→int cast, which truncates on Spark but
    ROUNDS on DuckDB (the engine divergence the differential
    fuzzer's template rules also ban) — shares are single IEEE
    divisions, and log10 is 6-dp-rounded before the deviation so the
    gate stays engine-exact.

    Scale: one map-side digit extraction + a 9-group aggregate; the
    total enters as a scalar aggregate.
    """
    orders = catalog.load(spark, sf_dir, "orders")
    d = (orders.filter(F.col("o_totalprice") > 0)
         .select(F.expr(
             "CAST(substring(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT)"
             " AS STRING), 1, 1) AS INT)").alias("digit")))
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("t"))
    benford = F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6)
    share = F.round(F.col("n").cast("double") / F.col("t"), 6)
    return (obs.crossJoin(tot)
            .select("digit", "n",
                    share.alias("observed_share"),
                    benford.alias("benford_share"),
                    F.round(F.abs(F.col("n").cast("double") / F.col("t")
                                  - benford), 6).alias("abs_deviation")))


@register(
    "profile_gini_concentration",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS rn
      FROM rev
    ), agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
             SUM(rn * rev) AS wsum, SUM(rev) AS tot
      FROM ranked
    )
    SELECT n_customers,
           CAST(tot AS DOUBLE) AS total_revenue,
           ROUND(2.0 * CAST(wsum AS DOUBLE)
                 / (n_customers * CAST(tot AS DOUBLE))
                 - (n_customers + 1.0) / n_customers, 6) AS gini
    FROM agg
    """,
    tags=("profile", "inequality", "concentration"),
)
def profile_gini_concentration(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue — the concentration
    screen a corpus curator runs per source/domain (is 1% of customers
    — or crawl hosts — most of the mass?): G = 2·Σ(i·xᵢ)/(n·Σx) −
    (n+1)/n over revenues sorted ascending, rank ties broken by
    customer key so both engines rank identically (tied revenues
    contribute the same Σ i·xᵢ under any tie order anyway).

    Scale: the global rank comes from the range-partition + offset
    device (``tensorize.global_row_number``) — never a single-task
    ``ROW_NUMBER() OVER (ORDER BY …)``; per-customer sums are exact
    DECIMAL(18,2) (no float reduction-order drift), the rank-weighted
    sum is decimal·bigint (still exact), and doubles appear only in
    the final scalar division — identical IEEE ops on identical exact
    inputs, so the 6-dp round hash-gates.
    """
    from new_data_pipeline_spark.sources.tensorize import global_row_number

    orders = catalog.load(spark, sf_dir, "orders")
    rev = (orders.groupBy("o_custkey")
           .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .alias("rev")))
    ranked, _ = global_row_number(
        rev, [F.col("rev").asc(), F.col("o_custkey").asc()], "__rn")
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("__rn") * F.col("rev")).alias("wsum"),
        F.sum("rev").alias("tot"))
    n = F.col("n_customers").cast("double")
    return agg.select(
        F.col("n_customers").cast("bigint").alias("n_customers"),
        F.col("tot").cast("double").alias("total_revenue"),
        F.round(F.lit(2.0) * F.col("wsum").cast("double")
                / (n * F.col("tot").cast("double"))
                - (n + F.lit(1.0)) / n, 6).alias("gini"))


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS prev_type,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS next_type
      FROM events
    ), c AS (
      SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ), t AS (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY 1
    )
    SELECT c.prev_type, c.next_type, c.n AS n_transitions,
           ROUND(CAST(c.n AS DOUBLE) / t.total, 6) AS prob
    FROM c JOIN t ON c.prev_type = t.prev_type
    ORDER BY c.prev_type, c.next_type
    """,
    tags=("analytics", "sequence", "markov"),
)
def events_markov_transitions(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type), row-normalized
    exact counts — the sequence model behind next-action prediction and
    behavioral anomaly scoring (event_path_trigrams counts raw paths;
    this is the normalized chain).

    Scale: ONE keyed window per user (shuffle on user_id, LEAD within)
    emits transitions per row; counting is map-combinable into a
    |types|² matrix, and the row normalization joins two
    |types|-sized aggregates — everything after the window is
    metadata-sized. Probabilities are single IEEE divisions on exact
    integer operands, rounded 6 dp.
    """
    from pyspark.sql import Window as W

    events = catalog.load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("prev_type"),
        F.lead("event_type", 1).over(w).alias("next_type"))
    c = (seq.filter(F.col("next_type").isNotNull())
         .groupBy("prev_type", "next_type")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    t = c.groupBy("prev_type").agg(
        F.sum("n").cast("bigint").alias("total"))
    return (c.join(t, "prev_type")
            .select("prev_type", "next_type",
                    F.col("n").alias("n_transitions"),
                    F.round(F.col("n").cast("double") / F.col("total"), 6)
                    .alias("prob"))
            .orderBy("prev_type", "next_type"))


@register(
    "profile_shannon_diversity",
    oracle="""
    WITH cl AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ), ns AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_langs
      FROM cl GROUP BY 1
    )
    SELECT cl.source, ns.n AS n_docs, ns.n_langs,
           ROUND(CAST(SUM(CAST(ROUND(
             -(CAST(cl.c AS DOUBLE) / ns.n)
               * ROUND(ln(CAST(cl.c AS DOUBLE) / ns.n), 6),
             9) AS DECIMAL(18,9))) AS DOUBLE), 6) AS entropy
    FROM cl JOIN ns ON cl.source = ns.source
    GROUP BY cl.source, ns.n, ns.n_langs
    ORDER BY cl.source
    """,
    tags=("profile", "diversity", "entropy"),
)
def profile_shannon_diversity(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Per-source Shannon entropy of the language distribution — the
    corpus-diversity screen a mixing pipeline runs before setting
    sampling weights (a source whose languages collapsed to one is a
    crawl regression; compare profile_gini_concentration for mass
    concentration and profile_source_drift for content drift).

    Parity device (the source_drift term monoid): each −p·ln(p) term
    computes in doubles on identical operands with the ln rounded 6 dp
    (libm-ulp shield), is rounded to 9 dp and cast to DECIMAL(18,9),
    and the per-source SUM then runs over exact decimals — associative,
    so reduction order can't flip the hash. Two map-combinable
    aggregates plus a |sources|-sized join; nothing scales past the
    group count.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    cl = (docs.groupBy("source", "lang")
          .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    ns = (cl.groupBy("source")
          .agg(F.sum("c").cast("bigint").alias("n"),
               F.count(F.lit(1)).cast("bigint").alias("n_langs")))
    p = F.col("c").cast("double") / F.col("n")
    term = (F.round(-p * F.round(F.log(p), 6), 9)
            .cast("decimal(18,9)"))
    return (cl.join(ns, "source")
            .groupBy("source", F.col("n").alias("n_docs"), "n_langs")
            .agg(F.round(F.sum(term).cast("double"), 6).alias("entropy"))
            .orderBy("source"))


# Pre-join skew diagnostic: how many of the hottest keys to report the
# row share of. 10 hottest keys' coverage is the number a salting /
# skew-join decision actually reads (one mega-key vs a fat head).
SKEW_TOP_KEYS = 10


@register(
    "profile_join_key_skew",
    oracle=f"""
    WITH freq AS (
      SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    ), stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(MAX(cnt) AS BIGINT) AS max_freq
      FROM freq
    ), top AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS top_rows FROM (
        SELECT cnt FROM freq ORDER BY cnt DESC, key LIMIT {SKEW_TOP_KEYS})
    )
    SELECT n_keys, n_rows, max_freq,
           ROUND(CAST(n_rows AS DOUBLE) / n_keys, 6) AS avg_freq,
           ROUND(CAST(max_freq AS DOUBLE) * n_keys / n_rows, 6)
             AS skew_ratio,
           ROUND(CAST(top_rows AS DOUBLE) / n_rows, 6) AS top{SKEW_TOP_KEYS}_share
    FROM stats CROSS JOIN top
    """,
    tags=("profile", "skew", "join"),
)
def profile_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic over lineitem.l_partkey — the profile a
    pipeline reads BEFORE picking a join strategy at 100 TB: key
    cardinality, max/mean key frequency, the skew ratio (max_freq /
    avg_freq — >>1 means one key's partition dwarfs the mean and a
    plain hash join stalls on its straggler task), and the row share
    of the SKEW_TOP_KEYS hottest keys (one mega-key → salt it; a fat
    head → AQE skew-join split covers it). The decision inputs for
    dedup.py's cap_hot_buckets and the salted-skew join, produced as
    data instead of folklore.

    Scale: one map-combinable frequency aggregate (the only
    O(rows) stage), then O(keys) state: a 1-row stats aggregate and a
    top-{SKEW_TOP_KEYS} TakeOrdered — never a global sort of the
    frequency table (Spark plans orderBy+limit as TakeOrdered; the
    (cnt DESC, key) tie-break makes the cut deterministic for the
    oracle)."""
    freq = (catalog.load(spark, sf_dir, "lineitem")
            .groupBy(F.col("l_partkey").alias("key"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))
    stats = freq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.max("cnt").cast("bigint").alias("max_freq"))
    top = (freq.orderBy(F.col("cnt").desc(), "key")
           .limit(SKEW_TOP_KEYS)
           .agg(F.sum("cnt").cast("bigint").alias("top_rows")))
    return (stats.crossJoin(top)
            .select("n_keys", "n_rows", "max_freq",
                    F.round(F.col("n_rows").cast("double")
                            / F.col("n_keys"), 6).alias("avg_freq"),
                    F.round(F.col("max_freq").cast("double")
                            * F.col("n_keys") / F.col("n_rows"), 6)
                    .alias("skew_ratio"),
                    F.round(F.col("top_rows").cast("double")
                            / F.col("n_rows"), 6)
                    .alias(f"top{SKEW_TOP_KEYS}_share")))


@register(
    "profile_mutual_information",
    oracle="""
    WITH cl AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ), nx AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS nx FROM cl GROUP BY 1
    ), ny AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS ny FROM cl GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_cells FROM cl
    )
    SELECT tot.n AS n_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM nx) AS n_langs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ny) AS n_sources,
           tot.n_cells,
           CAST(SUM(CAST(ROUND(
             (CAST(cl.c AS DOUBLE) / tot.n)
               * ROUND(ln((CAST(tot.n AS DOUBLE) * cl.c)
                          / (CAST(nx.nx AS DOUBLE) * ny.ny)), 6),
             9) AS DECIMAL(18,9))) AS DOUBLE) AS mi_nats,
           CAST(SUM(CAST(ROUND(
             (cl.c - (CAST(nx.nx AS DOUBLE) * ny.ny) / tot.n)
               * (cl.c - (CAST(nx.nx AS DOUBLE) * ny.ny) / tot.n)
               / ((CAST(nx.nx AS DOUBLE) * ny.ny) / tot.n),
             9) AS DECIMAL(18,9))) AS DOUBLE) AS chi2
    FROM cl
    JOIN nx USING (lang)
    JOIN ny USING (source)
    CROSS JOIN tot
    GROUP BY tot.n, tot.n_cells
    """,
    tags=("profile", "association", "mutual-information"),
)
def profile_mutual_information(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Mutual information AND chi-square between the lang and source
    columns — the categorical-association screen a curation pipeline
    runs before trusting a per-source language mix (high MI = language
    is predictable from source = the mixture is segregated; near-zero
    MI = languages spread evenly). Complements
    profile_shannon_diversity (per-source entropy) with the
    cross-column dependence number.

    Parity device (the shannon/source_drift term monoid): each
    p·ln(N·c/(nx·ny)) and (c−e)²/e term computes in doubles on
    identical bigint-derived operands with the ln rounded 6 dp, is
    rounded 9 dp into DECIMAL(18,9), and the sums run over exact
    decimals — associative, order-proof; the final scalars are emitted
    as the unrounded doubles of those decimal sums (no re-round edge).

    Scale: one (lang × source) aggregate, two marginal aggregates, a
    broadcast scalar total — nothing beyond the contingency-table
    cardinality ever shuffles."""
    docs = catalog.load(spark, sf_dir, "documents")
    cl = (docs.groupBy("lang", "source")
          .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    nx = cl.groupBy("lang").agg(F.sum("c").cast("bigint").alias("nx"))
    ny = cl.groupBy("source").agg(F.sum("c").cast("bigint").alias("ny"))
    tot = cl.agg(F.sum("c").cast("bigint").alias("n"),
                 F.count(F.lit(1)).cast("bigint").alias("n_cells"),
                 F.countDistinct("lang").cast("bigint").alias("n_langs"),
                 F.countDistinct("source").cast("bigint")
                 .alias("n_sources"))
    j = (cl.join(nx, "lang").join(ny, "source")
         .crossJoin(F.broadcast(tot)))
    ratio = ((F.col("n").cast("double") * F.col("c"))
             / (F.col("nx").cast("double") * F.col("ny")))
    mi_term = (F.round((F.col("c").cast("double") / F.col("n"))
                       * F.round(F.log(ratio), 6), 9)
               .cast("decimal(18,9)"))
    e = (F.col("nx").cast("double") * F.col("ny")) / F.col("n")
    chi_term = (F.round((F.col("c") - e) * (F.col("c") - e) / e, 9)
                .cast("decimal(18,9)"))
    return (j.groupBy(F.col("n").alias("n_docs"), "n_langs",
                      "n_sources", "n_cells")
            .agg(F.sum(mi_term).cast("double").alias("mi_nats"),
                 F.sum(chi_term).cast("double").alias("chi2"))
            .select("n_docs", "n_langs", "n_sources", "n_cells",
                    "mi_nats", "chi2"))
