"""Deterministic sampling and dataset splitting for training pipelines.

The reference hands every record to training (its generator loops the
full keyspace forever, reference serialize.py:731-795); real LLM-data
pipelines need reproducible subsetting: train/valid/test splits, k-fold
assignment, and per-source stratified downsampling.

All three operators key the decision on a cryptographic hash of the
stable record id — not on rand() or row position — so the assignment is
(a) reproducible across runs, engines, and cluster sizes, (b) stable
under repartitioning and insertion order, and (c) a pure per-row
projection: no shuffle, no state, trivially parallel at 100 TB. The
hex-prefix-threshold trick ("h < 'cc'" ≈ 204/256 = 79.7%) avoids any
engine-specific hex→int conversion, keeping the DuckDB oracle exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register


def hash_bucket(id_col: str | Column) -> Column:
    """First hex byte of md5(id) — a uniform, engine-portable 256-bucket
    hash of a stable id column (md5 of the decimal string form)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(c.cast("string").cast("binary")), 1, 2)


def assign_split(id_col: str | Column,
                 train: str = "cc", valid: str = "e6") -> Column:
    """train/valid/test label from the hash bucket; default thresholds
    0xcc/0xe6 give a 79.7 / 10.2 / 10.1 % split."""
    h = hash_bucket(id_col)
    return (F.when(h < train, "train")
            .when(h < valid, "valid")
            .otherwise("test"))


@register(
    "split_train_test",
    oracle="""
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM (
      SELECT CASE WHEN h < 'cc' THEN 'train'
                  WHEN h < 'e6' THEN 'valid'
                  ELSE 'test' END AS split,
             n_chars
      FROM (SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h, n_chars
            FROM documents))
    GROUP BY split
    ORDER BY split
    """,
    tags=("sampling", "split", "pipeline"),
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/valid/test assignment by hashed doc_id, summarized
    per split (count + mean length proves the split is unbiased)."""
    docs = catalog.load(spark, sf_dir, "documents")
    return (docs.select(assign_split("doc_id").alias("split"), "n_chars")
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 (F.sum("n_chars").cast("double") / F.count(F.lit(1)))
                 .alias("avg_chars"))
            .orderBy("split"))


@register(
    "split_kfold_assign",
    oracle="""
    SELECT fold, COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM (
      SELECT doc_id,
             CASE WHEN c < '4' THEN 0
                  WHEN c < '8' THEN 1
                  WHEN c < 'c' THEN 2
                  ELSE 3 END AS fold
      FROM (SELECT doc_id,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS c
            FROM documents))
    GROUP BY fold
    ORDER BY fold
    """,
    tags=("sampling", "split", "pipeline"),
)
def split_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-fold cross-validation assignment from one hash nibble: folds
    are disjoint, exhaustive, and identical on every engine and rerun."""
    docs = catalog.load(spark, sf_dir, "documents")
    c = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    fold = (F.when(c < "4", 0).when(c < "8", 1).when(c < "c", 2)
            .otherwise(3))
    return (docs.select("doc_id", fold.alias("fold"))
            .groupBy("fold")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("min_doc"),
                 F.max("doc_id").alias("max_doc"))
            .orderBy("fold"))


@register(
    "sample_stratified_hash",
    oracle="""
    SELECT source, COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE h < thr) AS n_sampled
    FROM (
      SELECT source,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h,
             CASE WHEN lang = 'en' THEN '40' ELSE '0a' END AS thr
      FROM documents)
    GROUP BY source
    ORDER BY source
    """,
    tags=("sampling", "stratified", "pipeline"),
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-stratum rates (25% of English
    docs, ~4% of the rest — the up/down-weighting move every pretraining
    data mix does), reported as kept-vs-total per source.

    Unlike df.sample/sampleBy, the hash threshold gives the same sample
    on every run and engine, and composes with incremental data: a new
    batch of rows gets the same per-row verdict it would have gotten in
    the original pass.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    thr = F.when(F.col("lang") == "en", "40").otherwise("0a")
    return (docs.select("source", hash_bucket("doc_id").alias("h"),
                        thr.alias("thr"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_total"),
                 F.count_if(F.col("h") < F.col("thr")).alias("n_sampled"))
            .orderBy("source"))


@register(
    "sample_weighted_hash",
    oracle="""
    WITH w AS (
      SELECT source, n_chars,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 3)
                  AS INTEGER) AS h
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_total,
           CAST(SUM(n_chars) AS BIGINT) AS weight_total,
           COUNT(*) FILTER (WHERE h < n_chars) AS n_sampled,
           CAST(coalesce(SUM(n_chars) FILTER (WHERE h < n_chars), 0)
                AS BIGINT) AS weight_sampled
    FROM w
    GROUP BY source
    ORDER BY source
    """,
    tags=("sampling", "weighted", "pipeline"),
)
def sample_weighted_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (Poisson) sampling with inclusion probability
    proportional to document length: keep a doc iff its 12-bit id-hash
    (0..4095) falls below its n_chars weight — P(keep) = n_chars/4096,
    pure integer math, zero randomness, identical on every engine and
    rerun.

    This is the size-biased sampling step of pretraining data mixes
    (long docs carry more tokens, so uniform doc sampling under-weights
    them); the report shows kept weight tracking kept count per source.
    Scale: a per-row predicate — no shuffle beyond the final tiny
    aggregate; incremental batches get the same verdict as a full pass.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    h = (F.conv(F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 3), 16, 10)
         .cast("int"))
    kept = F.col("h") < F.col("n_chars")
    return (docs.select("source", "n_chars", h.alias("h"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_total"),
                 F.sum("n_chars").cast("bigint").alias("weight_total"),
                 F.count_if(kept).alias("n_sampled"),
                 F.coalesce(F.sum(F.when(kept, F.col("n_chars"))), F.lit(0))
                  .cast("bigint").alias("weight_sampled"))
            .orderBy("source"))


@register(
    "mix_temperature_weights",
    oracle="""
    WITH w AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(round(sqrt(COUNT(*)), 6) AS DECIMAL(20,6)) AS w
      FROM documents GROUP BY source
    ), total AS (
      SELECT SUM(w) AS t FROM w
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(w AS DOUBLE) AS weight,
           CAST(w AS DOUBLE) / CAST(t AS DOUBLE) AS share
    FROM w, total
    """,
    tags=("sampling", "mixture", "pipeline"),
)
def mix_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture weights (alpha = 0.5): sample
    share proportional to sqrt(corpus size) — the standard pretraining
    rebalance that up-weights small sources without letting the largest
    dominate. alpha=0.5 keeps the gate exact: sqrt is IEEE correctly
    rounded in both engines (a general pow() is not), and the weights
    are rounded into DECIMAL before summing, so the total is
    order-independent — float sums across partitions are not.

    Scale: one map-combinable count per source + a broadcast scalar
    total. The share column divides two exact decimals as doubles.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    w = (docs.groupBy("source")
         .agg(F.count(F.lit(1)).alias("n_docs"))
         .withColumn("w", F.round(F.sqrt(F.col("n_docs")), 6)
                           .cast("decimal(20,6)")))
    total = w.agg(F.sum("w").alias("t"))
    return (w.crossJoin(F.broadcast(total))
            .select("source", F.col("n_docs").cast("bigint").alias("n_docs"),
                    F.col("w").cast("double").alias("weight"),
                    (F.col("w").cast("double") / F.col("t").cast("double"))
                     .alias("share")))


# The mixture REALIZED (round 12): mix_temperature_weights computes
# the shares; this draws the actual per-source document sample at the
# share-derived quota. Budget = documents one mixture epoch draws.
MIX_BUDGET_DOCS = 200
_COIN_BITS = 24          # md5-coin resolution (the dedup family's coin)
_COIN_MOD = 1 << _COIN_BITS


@register(
    "sample_temperature_mixture",
    oracle=f"""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
      GROUP BY source
    ), w AS (
      -- sqrt = temperature 0.5; 6-dp round into integer micro-units.
      -- The double is first pinned to DECIMAL(20,6) (both engines
      -- round-to-nearest on that cast), THEN multiplied by 1e6 in
      -- exact decimal arithmetic before the BIGINT cast. Multiplying
      -- the raw double by 1e6 is NOT engine-exact: round(sqrt(67),6)
      -- * 1e6 lands just below the integer in binary, and Spark's
      -- double->bigint cast truncates while DuckDB's rounds (ADVICE
      -- r12) — the decimal pin is the same device
      -- mix_temperature_weights uses.
      SELECT source, n_docs,
             CAST(CAST(ROUND(sqrt(CAST(n_docs AS DOUBLE)), 6)
                       AS DECIMAL(20,6)) * 1000000 AS BIGINT) AS w_u
      FROM counts
    ), tot AS (
      SELECT CAST(SUM(w_u) AS BIGINT) AS tot_u FROM w
    ), quota AS (
      SELECT source, n_docs, w_u,
             ({MIX_BUDGET_DOCS} * w_u) // (SELECT tot_u FROM tot) AS quota
      FROM w
    ), sampled AS (
      SELECT d.source, COUNT(*) AS n_sampled
      FROM documents d JOIN quota q ON d.source = q.source
      WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1,
                                {_COIN_BITS // 4}) AS BIGINT) * q.n_docs
            < q.quota * {_COIN_MOD}
      GROUP BY d.source
    )
    SELECT q.source, q.n_docs, q.w_u,
           CAST((10000 * q.w_u) // (SELECT tot_u FROM tot) AS BIGINT)
             AS mix_bp,
           CAST(q.quota AS BIGINT) AS quota,
           CAST(COALESCE(s.n_sampled, 0) AS BIGINT) AS n_sampled
    FROM quota q LEFT JOIN sampled s ON q.source = s.source
    """,
    tags=("sampling", "mixture", "training-prep"),
)
def sample_temperature_mixture(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The temperature-0.5 mixture REALIZED: per source the raw count,
    the sqrt weight in integer micro-units, the normalized mixing
    share in basis points, the document quota for MIX_BUDGET_DOCS, and
    how many documents the deterministic md5-coin Bernoulli at rate
    quota/n actually draws — the step between
    ``mix_temperature_weights``' share table and a training data
    loader. Unlike the fixed-rate samplers above, the coin's rate here
    is DATA-DERIVED (an aggregation result), so the comparison is kept
    integer (hash·n_docs < quota·2^24): the selected document SET is
    engine-exact, not just the rates.

    Scale: one map-combinable count per source, a broadcast
    |sources|-sized quota table joined map-side to the corpus coin
    scan, one partial count — no corpus-sized shuffle anywhere."""
    docs = catalog.load(spark, sf_dir, "documents")
    counts = (docs.groupBy("source")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs")))
    # Decimal-pin BEFORE the 1e6 scale-up (see the oracle comment):
    # double->decimal(20,6) rounds to nearest in both engines, and the
    # decimal * 1000000 product is exact, so the BIGINT is engine-exact
    # for every count — the raw double product truncates differently
    # (Spark floors, DuckDB rounds) for ~2% of counts (67, 69, 258, ...).
    w = counts.withColumn(
        "w_u",
        (F.round(F.sqrt(F.col("n_docs").cast("double")), 6)
         .cast("decimal(20,6)") * F.lit(1000000))
        .cast("bigint"))
    tot = w.agg(F.sum("w_u").cast("bigint").alias("tot_u"))
    quota = (w.crossJoin(F.broadcast(tot))
             .select("source", "n_docs", "w_u", "tot_u",
                     F.expr(f"({MIX_BUDGET_DOCS} * w_u) DIV tot_u")
                     .alias("quota")))
    coin = F.conv(F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1,
        _COIN_BITS // 4), 16, 10).cast("bigint")
    sampled = (docs.select("source", coin.alias("coin"))
               .join(F.broadcast(quota.select("source",
                                              F.col("n_docs").alias("nd"),
                                              "quota")), "source")
               .filter(F.col("coin") * F.col("nd")
                       < F.col("quota") * F.lit(_COIN_MOD))
               .groupBy("source")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_sampled")))
    return (quota.join(sampled, "source", "left")
            .select("source", "n_docs", "w_u",
                    F.expr("CAST((10000 * w_u) DIV tot_u AS BIGINT)")
                    .alias("mix_bp"),
                    F.col("quota").cast("bigint").alias("quota"),
                    F.coalesce(F.col("n_sampled"), F.lit(0))
                    .cast("bigint").alias("n_sampled")))


RESERVOIR_K = 10


@register(
    "sample_reservoir_pergroup",
    oracle=f"""
    SELECT source, rk, doc_id
    FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents)
    WHERE rk <= {RESERVOIR_K}
    """,
    tags=("sampling", "reservoir", "pergroup"),
)
def sample_reservoir_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group 'reservoir': exactly RESERVOIR_K docs
    per source, chosen by ranking on md5(doc_id) — uniform over the
    group like a classic reservoir sample, but reproducible across
    runs, engines, and INCREMENTAL growth (a group's sample only
    changes when a new doc hashes below its current k-th, exactly the
    reservoir property). The eyeball-a-fixed-sample-per-source QA step
    of a curation run.

    Scale: one window partitioned by source (each partition sorts only
    its own group); with huge groups a per-partition bounded-heap
    pre-pass (the sim_bruteforce_topk device) drops the sort to k rows
    per partition.
    """
    from pyspark.sql import Window as W
    docs = catalog.load(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id")
    return (docs.select("source", "doc_id",
                        F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= RESERVOIR_K)
            .select("source", "rk", "doc_id"))


@register(
    "split_group_aware",
    oracle="""
    WITH s AS (
      SELECT source,
             CASE WHEN substr(md5(source), 1, 2) < 'cc' THEN 'train'
                  WHEN substr(md5(source), 1, 2) < 'e6' THEN 'valid'
                  ELSE 'test' END AS split,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY 1, 2
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_sources,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_docs), 6)
             AS avg_chars
    FROM s GROUP BY split ORDER BY split
    """,
    tags=("sampling", "split", "leakage"),
)
def split_group_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware train/valid/test split: the hash is taken over the
    SOURCE (the leakage group), not the document, so every document of
    a source lands in the same split by construction — the standard
    defense against near-duplicate leakage across splits (documents
    from one crawl/site are each other's likeliest near-dups, and a
    doc-hashed split scatters them across train AND test;
    split_leakage_check measures that failure, this operator prevents
    it). Same 80/10/10 hash bands as split_train_test.

    Scale: assignment is a map-only expression on the group key — no
    join against a split table, no shuffle beyond the reporting
    aggregate; at 100 TB the split of any row is recomputable locally
    (pure function of source), which is what makes the split stable
    across reruns and engines."""
    docs = catalog.load(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("source").cast("binary")), 1, 2)
    split = (F.when(h < "cc", "train").when(h < "e6", "valid")
             .otherwise("test"))
    per_source = (docs.select(F.col("source"), split.alias("split"),
                              "n_chars")
                  .groupBy("source", "split")
                  .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                       F.sum("n_chars").cast("bigint").alias("n_chars")))
    return (per_source.groupBy("split")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_sources"),
                 F.sum("n_docs").cast("bigint").alias("n_docs"),
                 F.round(F.sum("n_chars").cast("double")
                         / F.sum("n_docs"), 6).alias("avg_chars"))
            .orderBy("split"))


# Exact-quota stratified split fractions: cumulative 80/10/10. The
# floors are the standard exact-proportion rule (train gets
# floor(0.8·n), valid gets floor(0.9·n) − floor(0.8·n), test the
# remainder), so every stratum's split sizes are DETERMINED by its
# count — what the hash-band split above can only approximate.
STRAT_TRAIN_PCT = 80
STRAT_VALID_PCT = 90  # cumulative


@register(
    "split_stratified",
    oracle=f"""
    WITH cnt AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang
    ), ranked AS (
      SELECT d.doc_id, d.lang, d.n_chars, cnt.n,
             ROW_NUMBER() OVER (
               PARTITION BY d.lang
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
      FROM documents d JOIN cnt USING (lang)
    ), assigned AS (
      SELECT lang, doc_id, n_chars,
             CASE WHEN rn <= (n * {STRAT_TRAIN_PCT}) // 100 THEN 'train'
                  WHEN rn <= (n * {STRAT_VALID_PCT}) // 100 THEN 'valid'
                  ELSE 'test' END AS split
      FROM ranked
    )
    SELECT lang, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars
    FROM assigned GROUP BY lang, split ORDER BY lang, split
    """,
    tags=("sampling", "split", "stratified"),
)
def split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-quota stratified train/valid/test split by language: each
    stratum contributes floor(80%)/floor(90%)−floor(80%)/remainder of
    its documents, assigned by the deterministic within-stratum md5
    rank of doc_id — the split a training pipeline uses when the class
    mix must be preserved EXACTLY per split (the hash-band splits,
    split_train_test / split_group_aware, only approximate the
    proportions; this one hits the floors by construction). The
    emitted sum_doc_ids/avg_chars depend on WHICH documents landed in
    each cell, so the gate pins the assignment mechanism, not just the
    arithmetic of the quotas.

    Scale: the exact quota costs one rank per stratum — a shuffle on
    lang and a per-stratum sort (Spark's window). Strata counts are
    bounded (languages); a 100 TB stratum uses the range-partitioned
    global_row_number device (sources/tensorize.py) for the same rank
    without a single-task sort, and the md5 ordering key keeps the
    rank reproducible across engines and reruns either way. The
    stratum-count join is a broadcast (|langs| rows).
    """
    docs = catalog.load(spark, sf_dir, "documents")
    cnt = (docs.groupBy("lang")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    from pyspark.sql import Window
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id")
    ranked = (docs.join(F.broadcast(cnt), "lang")
              .withColumn("rn", F.row_number().over(w)))
    split = (F.when(F.col("rn") <= F.expr(
                 f"(n * {STRAT_TRAIN_PCT}) DIV 100"), "train")
             .when(F.col("rn") <= F.expr(
                 f"(n * {STRAT_VALID_PCT}) DIV 100"), "valid")
             .otherwise("test"))
    return (ranked.select("lang", split.alias("split"), "doc_id",
                          "n_chars")
            .groupBy("lang", "split")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("doc_id").cast("bigint").alias("sum_doc_ids"),
                 F.round(F.sum("n_chars").cast("double")
                         / F.count(F.lit(1)), 6).alias("avg_chars"))
            .orderBy("lang", "split"))
