"""Sketch aggregates: HyperLogLog distinct-count sketches, including the
merge path that makes them the right tool at 100 TB.

No reference analog (the reference's only "statistic" is a row count,
reference serialize.py:665-667). At scale, COUNT(DISTINCT) is a full
shuffle of every distinct value; an HLL sketch is a few KB per group,
map-side combinable, and — critically — *mergeable after the fact*:
pre-aggregated per-partition/per-day sketches roll up to any coarser
grain without touching raw data again. Estimates are approximate, so
these are rows-only queries; the error bound is gated by unit test
(tests/test_sketches.py) against exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

LG_K = 12  # 2^12 registers → ~1.6% relative standard error


@register(
    "agg_hll_sketch",
    # Bounded-error oracle (same device as the ANN and
    # approx_count_distinct gates): the Datasketches estimate is
    # engine-specific, so the query emits the EXACT count plus an
    # in-bound flag (≤5% ≈ 3σ at lg_k=12) and the oracle replays the
    # exact count with a literal-true flag.
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           CAST(1 AS INTEGER) AS within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("aggregate", "sketch", "approx"),
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via a Datasketches HLL sketch,
    driver-gated through the bounded-error device (exact count +
    in-bound flag); the raw-estimate error bound stays unit-gated."""
    events = catalog.load(spark, sf_dir, "events")
    approx = F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(LG_K)))
    exact = F.count_distinct("user_id")
    return (events.groupBy("event_type")
            .agg(exact.alias("exact_users"),
                 (F.abs(approx - exact) <= 0.05 * exact)
                 .cast("int").alias("within_5pct"))
            .orderBy("event_type"))


@register(
    "agg_hll_mergeable_rollup",
    # The merge path under the same bounded-error gate: the MERGED
    # estimate (union of per-day sketches) must honor the 5% bound
    # against the exact count. NOTE the gate is deliberately NOT
    # "union == single whole-pass sketch": that equality held at
    # sf0.01 but broke at the sf0.1 10x-scale audit — Datasketches
    # sketches promote sparse→dense at a cardinality threshold, and
    # per-day sketches cross it at different points than one whole-pass
    # sketch, so their union is near-but-not-bit-equal once groups
    # outgrow sparse mode. The production guarantee is the error bound
    # on the merged path, which is what this gates.
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT date_trunc('day', ts)) AS n_days_merged,
           COUNT(DISTINCT user_id) AS exact_users,
           CAST(1 AS INTEGER) AS within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("aggregate", "sketch", "approx", "rollup"),
)
def agg_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch *merge* path: build one HLL sketch per (event_type,
    day) — the grain a daily ingest job would persist — then union the
    binary sketches up to per-event_type totals without rescanning rows.

    This two-level plan is the 100 TB pattern: the expensive pass over
    raw events happens once at the fine grain; every coarser rollup
    (type, week, global…) is a cheap merge of kilobyte sketches.
    """
    events = catalog.load(spark, sf_dir, "events")
    daily = (events
             .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
             .agg(F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("sketch")))
    merged = (daily.groupBy("event_type")
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch"))
                   .alias("approx_users"),
                   F.count(F.lit(1)).cast("bigint").alias("n_days_merged")))
    exact = (events.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("exact_users")))
    return (merged.join(exact, ["event_type"])
            .select("event_type", "n_days_merged", "exact_users",
                    (F.abs(F.col("approx_users") - F.col("exact_users"))
                     <= 0.05 * F.col("exact_users"))
                    .cast("int").alias("within_5pct"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# CountMin sketch (Cormode & Muthukrishnan 2005): mergeable approximate
# FREQUENCY estimation — the point-query complement of the registry's
# other summaries (HLL: distinct counts; KLL: quantiles; KMV: set
# intersections; Misra-Gries in text_analysis: exact heavy hitters).
# DEPTH independent md5-derived hash rows × WIDTH counters; a cell is
# the SUM of counts of every token hashing to it (mergeable by cell
# addition), and a point estimate is the MIN over the token's DEPTH
# cells — always ≥ the true count, within εN with high probability.
# The whole sketch is SQL-replayable, so the gate hash-checks cells,
# estimates, AND the one-sided error guarantee.

CM_DEPTH = 4
CM_WIDTH = 1024
CM_PROBES = 20


def _cm_col(row_col: str, term_col: str) -> str:
    """Deterministic column index of ``term_col`` in hash row
    ``row_col`` (both are COLUMN names; the seed string is
    'cm<row>|<term>' on both engines)."""
    return (f"CAST(conv(substring(md5(concat('cm', CAST({row_col} AS STRING),"
            f" '|', {term_col})), 1, 8), 16, 10) AS BIGINT) % {CM_WIDTH}")


@register(
    "agg_countmin_point_estimates",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), cnt AS (
      SELECT w, COUNT(*) AS c FROM tok GROUP BY w
    ), probes AS (
      SELECT w AS term, c AS exact_count
      FROM cnt ORDER BY c DESC, w LIMIT {CM_PROBES}
    ), cells AS (
      SELECT r.r,
             CAST(('0x' || substr(md5('cm' || r.r || '|' || cnt.w), 1, 8))
                  AS BIGINT) % {CM_WIDTH} AS col,
             CAST(SUM(cnt.c) AS BIGINT) AS cell
      FROM cnt, (SELECT unnest(range(0, {CM_DEPTH})) AS r) r
      GROUP BY 1, 2
    ), est AS (
      SELECT p.term, p.exact_count,
             MIN(cells.cell) AS est_count
      FROM probes p
      JOIN cells
        ON cells.col = CAST(('0x' || substr(md5('cm' || cells.r || '|'
                            || p.term), 1, 8)) AS BIGINT) % {CM_WIDTH}
      GROUP BY 1, 2
    )
    SELECT term, exact_count, est_count,
           CAST(est_count >= exact_count AS INTEGER) AS never_under
    FROM est
    """,
    tags=("agg", "sketch", "countmin"),
)
def agg_countmin_point_estimates(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """CountMin point estimates for the corpus' 20 most frequent
    tokens, next to their exact counts and the one-sided-error witness
    (CMS never underestimates — a flag the oracle replays as computed,
    so a broken sketch fails the hash)."""
    docs = catalog.load(spark, sf_dir, "documents")
    cnt = (docs.select(F.explode(F.split("text", " ")).alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
           .persist())
    probes = (cnt.orderBy(F.col("c").desc(), "w").limit(CM_PROBES)
              .select(F.col("w").alias("term"),
                      F.col("c").alias("exact_count")))
    rows = spark.range(CM_DEPTH).select(F.col("id").alias("r"))
    cells = (cnt.crossJoin(rows)
             .select("r", F.expr(_cm_col("r", "w")).alias("col"), "c")
             .groupBy("r", "col").agg(F.sum("c").alias("cell")))
    # pr alias: both sides cross-join the SAME spark.range frame, so a
    # bare r == r condition references one attribute and logs the
    # trivially-true-predicate warning (VERDICT r9 #7 class)
    probe_cells = (probes.crossJoin(rows)
                   .select("term", "exact_count",
                           F.col("r").alias("pr"),
                           F.expr(_cm_col("r", "term")).alias("pcol")))
    est = (probe_cells
           .join(cells, (probe_cells["pr"] == cells["r"])
                 & (probe_cells["pcol"] == cells["col"]))
           .groupBy("term", "exact_count")
           .agg(F.min("cell").alias("est_count")))
    return est.select(
        "term", "exact_count", "est_count",
        (F.col("est_count") >= F.col("exact_count"))
        .cast("int").alias("never_under"))


# ---------------------------------------------------------------------------
# Bloom filter as an aggregate: set-MEMBERSHIP summaries, completing
# the mergeable-sketch suite (HLL: distinct counts; KLL: quantiles;
# KMV: intersections; CMS: frequencies; Misra-Gries: heavy hitters;
# Bloom: membership). The filter is M bits in ceil(M/63) longs (63 usable bits per word — bit 63 stays clear because DuckDB range-checks shifts into the sign bit), built by
# OR-aggregating per-element bit masks — mergeable by word-wise OR,
# exactly how Catalyst's runtime bloom join (plans/physical.py)
# exchanges filters, but here as a first-class query surface with a
# SQL-replayable md5 hash family.

BLOOM_BITS = 4096
BLOOM_HASHES = 4
BLOOM_PROBES = 30


def _bloom_pos(hash_idx: str, elem: str) -> str:
    """Bit position of ``elem`` under hash row ``hash_idx``."""
    return (f"CAST(conv(substring(md5(concat('bf', CAST({hash_idx} AS STRING),"
            f" '|', {elem})), 1, 8), 16, 10) AS BIGINT) % {BLOOM_BITS}")


@register(
    "agg_bloom_membership",
    oracle=f"""
    WITH members AS (
      SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS elem
      FROM orders
    ), bits AS (
      SELECT (CAST(('0x' || substr(md5('bf' || h.h || '|' || m.elem), 1, 8))
                   AS BIGINT) % {BLOOM_BITS}) // 63 AS word,
             bit_or(1::BIGINT <<
                    ((CAST(('0x' || substr(md5('bf' || h.h || '|' || m.elem),
                            1, 8)) AS BIGINT) % {BLOOM_BITS}) % 63)) AS w
      FROM members m, (SELECT unnest(range(0, {BLOOM_HASHES})) AS h) h
      GROUP BY 1
    ), probes AS (
      -- half real customers (members), half shifted keys guaranteed
      -- absent (non-members) so both Bloom outcomes are exercised
      SELECT CASE WHEN side = 1 THEN c_custkey
                  ELSE c_custkey + 1000000 END AS probe,
             CAST(CASE WHEN side = 1 THEN c_custkey
                       ELSE c_custkey + 1000000 END AS VARCHAR) AS elem,
             CAST(CASE WHEN side = 1 THEN c_custkey
                       ELSE c_custkey + 1000000 END
                  IN (SELECT o_custkey FROM orders) AS INTEGER)
               AS actually_member
      FROM (SELECT c_custkey FROM customer
            ORDER BY c_custkey LIMIT {BLOOM_PROBES // 2}),
           (SELECT unnest([1, 2]) AS side)
    ), checks AS (
      SELECT p.probe, p.actually_member, COUNT(*) AS n_hits
      FROM probes p, (SELECT unnest(range(0, {BLOOM_HASHES})) AS h) h
      JOIN bits
        ON bits.word = (CAST(('0x' || substr(md5('bf' || h.h || '|'
                             || p.elem), 1, 8)) AS BIGINT)
                        % {BLOOM_BITS}) // 63
      WHERE (bits.w >> ((CAST(('0x' || substr(md5('bf' || h.h || '|'
                              || p.elem), 1, 8)) AS BIGINT)
                         % {BLOOM_BITS}) % 63)) & 1 = 1
      GROUP BY 1, 2
    )
    SELECT p.probe, p.actually_member,
           CAST(COALESCE(c.n_hits, 0) = {BLOOM_HASHES} AS INTEGER)
             AS bloom_says_member,
           CAST(p.actually_member <=
                CAST(COALESCE(c.n_hits, 0) = {BLOOM_HASHES} AS INTEGER)
                AS INTEGER) AS no_false_negative
    FROM probes p LEFT JOIN checks c ON p.probe = c.probe
    """,
    tags=("agg", "sketch", "bloom", "membership"),
)
def agg_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom membership of the first 30 customers against the set of
    customers who ever ordered: the filter is built as a word-wise
    bit_or aggregate over md5-derived positions, probes AND-check
    their k bits, and the no-false-negative guarantee rides along as a
    hash-gated witness column (false POSITIVES are allowed — that's
    the trade — but a member the filter denies breaks the gate)."""
    orders = catalog.load(spark, sf_dir, "orders")
    customer = catalog.load(spark, sf_dir, "customer")
    members = (orders.select(F.col("o_custkey").cast("string")
                             .alias("elem")).distinct())
    hashes = spark.range(BLOOM_HASHES).select(F.col("id").alias("h"))
    pos_sql = _bloom_pos("h", "elem")
    bits = (members.crossJoin(hashes)
            .select(F.expr(f"({pos_sql}) DIV 63").alias("word"),
                    F.expr(f"shiftleft(CAST(1 AS BIGINT),"
                           f" CAST(({pos_sql}) % 63 AS INT))").alias("mask"))
            .groupBy("word").agg(F.bit_or("mask").alias("w")))
    member_keys = orders.select("o_custkey").distinct()
    base = customer.orderBy("c_custkey").limit(BLOOM_PROBES // 2)
    sides = spark.range(1, 3).select(F.col("id").alias("side"))
    keyed = (base.crossJoin(sides)
             .select(F.when(F.col("side") == 1, F.col("c_custkey"))
                     .otherwise(F.col("c_custkey") + 1000000)
                     .alias("probe")))
    probes = (keyed.join(member_keys,
                         keyed["probe"] == member_keys["o_custkey"],
                         "left")
              .select("probe",
                      F.col("probe").cast("string").alias("elem"),
                      F.col("o_custkey").isNotNull().cast("int")
                      .alias("actually_member")))
    checks = (probes.crossJoin(hashes)
              .select("probe", "actually_member",
                      F.expr(f"({pos_sql}) DIV 63").alias("pword"),
                      F.expr(f"CAST(({pos_sql}) % 63 AS INT)")
                      .alias("pbit"))
              .join(bits, F.col("pword") == F.col("word"))
              .filter(F.expr("(shiftright(w, pbit) & 1) = 1"))
              .groupBy("probe", "actually_member")
              .agg(F.count(F.lit(1)).alias("n_hits")))
    says = F.coalesce(F.col("n_hits"), F.lit(0)) == BLOOM_HASHES
    return (probes.select("probe", "actually_member")
            .join(checks, ["probe", "actually_member"], "left")
            .select("probe", "actually_member",
                    says.cast("int").alias("bloom_says_member"),
                    (F.col("actually_member") <= says.cast("int"))
                    .cast("int").alias("no_false_negative")))
