"""Corpus preparation operators for LLM training-data pipelines:
chunking, repetition signals, sequence packing, split-leakage checks.

The reference stops at tensor serialization (serialize.py:156-167) —
these are the curation stages a 100 TB text corpus passes through
before it: fixed-window chunking with overlap (context building),
Gopher/C4-style repetition ratios (quality filtering), contiguous
sequence packing (training-batch construction), and train/test
contamination detection over content fingerprints.

Every operator is a pure per-row projection or a keyed aggregation —
no driver loops, no Python in the row path — and every one is
DuckDB-oracle-gated (integer/ratio math only, no libm)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.operators.sampling import assign_split
from new_data_pipeline_spark.registry import register

CHUNK_W = 64   # tokens per chunk
CHUNK_S = 48   # stride (CHUNK_W - CHUNK_S = 16 tokens of overlap)
PACK_TARGET = 512  # tokens per packed training sequence


@register(
    "text_chunk_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ), c AS (
      SELECT doc_id, n, toks,
             unnest(range(0,
                 1 + (greatest(0, n - {CHUNK_W}) + {CHUNK_S - 1})
                     // {CHUNK_S})) AS i
      FROM t
    )
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           array_to_string(toks[i * {CHUNK_S} + 1 :
                                least(i * {CHUNK_S} + {CHUNK_W}, n)], ' ')
             AS chunk_text,
           CAST(least({CHUNK_W}, n - i * {CHUNK_S}) AS INTEGER)
             AS n_chunk_tokens
    FROM c
    """,
    tags=("corpus", "chunking"),
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window chunking with overlap: 64-token chunks on a 48-token
    stride (16 tokens shared between neighbors), the standard context-
    window builder. The chunk count stops once a window reaches the end
    of the doc — no trailing chunks fully contained in their
    predecessor.

    Scale: split + per-row explode; zero shuffle, pushdown-friendly.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    t = t.withColumn("n", F.size("toks"))
    n_chunks = (F.lit(1)
                + F.floor((F.greatest(F.lit(0), F.col("n") - CHUNK_W)
                           + (CHUNK_S - 1)) / CHUNK_S)).cast("int")
    c = t.withColumn("chunk_id", F.explode(F.sequence(
        F.lit(0), n_chunks - 1)))
    start = F.col("chunk_id") * CHUNK_S
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.concat_ws(" ", F.slice("toks", start + 1, F.lit(CHUNK_W)))
         .alias("chunk_text"),
        F.least(F.lit(CHUNK_W), F.col("n") - start)
         .cast("integer").alias("n_chunk_tokens"))


@register(
    "text_repetition_ratio",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), uni AS (
      SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct,
             MAX(c) AS top_cnt
      FROM (SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY 1, 2)
      GROUP BY doc_id
    ), big AS (
      SELECT doc_id, SUM(c) AS n_bi, COUNT(*) AS n_distinct_bi
      FROM (
        SELECT doc_id, bg, COUNT(*) AS c
        FROM (
          SELECT doc_id,
                 unnest([toks[i] || ' ' || toks[i + 1]
                         for i in range(1, len(toks))]) AS bg
          FROM (SELECT doc_id, string_split(text, ' ') AS toks
                FROM documents)
          WHERE len(toks) >= 2)
        GROUP BY 1, 2)
      GROUP BY doc_id
    )
    SELECT u.doc_id,
           CAST(u.n_tokens AS BIGINT) AS n_tokens,
           round(CAST(u.n_distinct AS DOUBLE) / u.n_tokens, 6)
             AS distinct_ratio,
           round(CAST(u.top_cnt AS DOUBLE) / u.n_tokens, 6)
             AS top_token_share,
           round(coalesce(1.0 - CAST(b.n_distinct_bi AS DOUBLE) / b.n_bi,
                          0.0), 6) AS dup_bigram_ratio
    FROM uni u LEFT JOIN big b USING (doc_id)
    """,
    tags=("corpus", "quality", "repetition"),
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition signals per document: distinct-token
    ratio, top-token share, and duplicate-bigram fraction — the three
    cheapest high-precision filters for boilerplate and degenerate text.

    Scale: two keyed aggregations (doc_id×token, doc_id×bigram), both
    map-side combinable; ratios are exact integer divisions.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    uni = (toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
           .groupBy("doc_id")
           .agg(F.sum("c").alias("n_tokens"),
                F.count(F.lit(1)).alias("n_distinct"),
                F.max("c").alias("top_cnt")))
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    bigrams = (t.filter(F.size("toks") >= 2)
               .select("doc_id", F.explode(F.expr(
                   "transform(sequence(1, size(toks) - 1), "
                   "i -> concat(element_at(toks, i), ' ', "
                   "element_at(toks, i + 1)))")).alias("bg")))
    big = (bigrams.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
           .groupBy("doc_id")
           .agg(F.sum("c").alias("n_bi"),
                F.count(F.lit(1)).alias("n_distinct_bi")))
    return (uni.join(big, "doc_id", "left")
            .select(
                "doc_id",
                F.col("n_tokens").cast("bigint").alias("n_tokens"),
                F.round(F.col("n_distinct").cast("double")
                        / F.col("n_tokens"), 6).alias("distinct_ratio"),
                F.round(F.col("top_cnt").cast("double")
                        / F.col("n_tokens"), 6).alias("top_token_share"),
                F.round(F.coalesce(
                    F.lit(1.0) - F.col("n_distinct_bi").cast("double")
                    / F.col("n_bi"), F.lit(0.0)), 6)
                 .alias("dup_bigram_ratio")))


@register(
    "corpus_pack_sequences",
    oracle=f"""
    WITH d AS (
      SELECT source, doc_id,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ), c AS (
      SELECT source, doc_id, n_tok,
             coalesce(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS cum_before
      FROM d
    )
    SELECT source, CAST(cum_before // {PACK_TARGET} AS BIGINT) AS bin,
           COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tokens_in_bin
    FROM c
    GROUP BY 1, 2
    """,
    tags=("corpus", "packing"),
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing: concatenate each source's docs in
    doc_id order and cut at {PACK_TARGET}-token boundaries — bin =
    floor(cumulative_tokens_before / target), the concat-then-slice
    packing training loaders use (docs may straddle a cut; the bin is
    where the doc STARTS).

    Scale: one window per source partition (keyed shuffle, sorted within
    partition) + a map-side-combinable aggregation. Pure int math.
    """
    from pyspark.sql import Window as W
    docs = catalog.load(spark, sf_dir, "documents")
    d = docs.select("source", "doc_id",
                    F.size(F.split("text", " ")).alias("n_tok"))
    w = (W.partitionBy("source").orderBy("doc_id")
         .rowsBetween(W.unboundedPreceding, -1))
    c = d.withColumn("cum_before",
                     F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    return (c.groupBy(
                "source",
                F.floor(F.col("cum_before") / PACK_TARGET)
                 .cast("bigint").alias("bin"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("tokens_in_bin")))


@register(
    "split_leakage_check",
    oracle="""
    WITH fp AS (
      SELECT DISTINCT
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               AS fingerprint,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                  THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                  THEN 'valid'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT a.split AS split_a, b.split AS split_b,
           COUNT(*) AS n_shared_fingerprints
    FROM fp a JOIN fp b
      ON a.fingerprint = b.fingerprint AND a.split < b.split
    GROUP BY 1, 2
    """,
    tags=("corpus", "split", "dedup", "contamination"),
)
def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination detector: normalized-content
    fingerprints that appear in more than one split. The curation step
    every eval pipeline needs before trusting held-out numbers —
    hash-based splits are doc_id-disjoint but NOT content-disjoint when
    the corpus contains near-identical documents.

    Scale: distinct (fingerprint, split) pairs — one shuffle on the
    16-byte md5 — then a self-equi-join on the fingerprint; cluster
    sizes per fingerprint are tiny (≤ number of splits), so the join
    cannot go quadratic.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    fp = (docs.select(
            F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
             .alias("fingerprint"),
            assign_split("doc_id").alias("split"))
          .distinct())
    a = fp.select(F.col("fingerprint"), F.col("split").alias("split_a"))
    b = fp.select(F.col("fingerprint").alias("fpb"),
                  F.col("split").alias("split_b"))
    return (a.join(b, (F.col("fingerprint") == F.col("fpb"))
                   & (F.col("split_a") < F.col("split_b")))
            .groupBy("split_a", "split_b")
            .agg(F.count(F.lit(1)).alias("n_shared_fingerprints")))

@register(
    "corpus_e2e_curation",
    oracle="""
    WITH sig AS (
      SELECT doc_id, lang,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               AS fingerprint,
             len(string_split(text, ' ')) AS n_tok,
             len(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM documents
    ), kept AS (
      SELECT * FROM sig
      WHERE n_tok BETWEEN 10 AND 1000
        AND CAST(n_distinct AS DOUBLE) / n_tok >= 0.3
    ), keeper AS (
      SELECT fingerprint, MIN(doc_id) AS keeper_id FROM kept GROUP BY 1
    ), dedup AS (
      SELECT k.* FROM kept k
      JOIN keeper ON k.fingerprint = keeper.fingerprint
                 AND k.doc_id = keeper.keeper_id
    )
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                THEN 'valid' ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           round(CAST(SUM(n_distinct) AS DOUBLE) / SUM(n_tok), 6)
             AS corpus_distinct_ratio
    FROM dedup
    GROUP BY 1, 2
    """,
    tags=("corpus", "pipeline", "composite"),
)
def corpus_e2e_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as ONE composable plan: quality
    filter (length + distinct-token gates) → exact dedup (min-doc_id
    keeper per normalized fingerprint) → hash split assignment → per
    (split, lang) corpus report. A user of the reference runs these as
    separate jobs with intermediate materializations; here Catalyst
    sees one tree and pushes the quality filter beneath everything.

    The report ratio is SUM(distinct)/SUM(tokens) — integer sums with
    one final division — never an average of per-doc doubles, whose
    summation order differs across engines.

    Scale: one shuffle on the fingerprint (dedup), one on the report
    keys; the filter prunes before both.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sig = docs.select(
        "doc_id", "lang",
        F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
         .alias("fingerprint"),
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_distinct"))
    kept = sig.filter(
        F.col("n_tok").between(10, 1000)
        & (F.col("n_distinct").cast("double") / F.col("n_tok") >= 0.3))
    # kfp alias, not a bare fingerprint==fingerprint: keeper shares
    # kept's lineage, so the same-name condition references one
    # attribute and logs the "trivially true equals predicate" warning
    # every run (self-join dedup re-keyed it correctly; the alias keeps
    # the condition unambiguous — the sim_pq_topk lesson, VERDICT r9 #7)
    keeper = (kept.groupBy("fingerprint")
              .agg(F.min("doc_id").alias("keeper_id"))
              .select(F.col("fingerprint").alias("kfp"), "keeper_id"))
    dedup = kept.join(keeper,
                      (F.col("fingerprint") == F.col("kfp"))
                      & (F.col("doc_id") == F.col("keeper_id"))).select(kept["*"])
    return (dedup
            .groupBy(assign_split("doc_id").alias("split"), "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("total_tokens"),
                 F.round(F.sum("n_distinct").cast("double")
                         / F.sum("n_tok"), 6)
                 .alias("corpus_distinct_ratio")))


CONTAM_W = 8  # word-n-gram width for eval-contamination detection


@register(
    "text_contamination_ngrams",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                  THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                  THEN 'valid' ELSE 'test' END AS split,
             string_split(text, ' ') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, split,
             unnest(list_distinct(
               [CAST('0x' || substr(md5(array_to_string(
                    toks[i:i+{CONTAM_W - 1}], ' ')), 1, 15) AS BIGINT)
                for i in range(1, len(toks) - {CONTAM_W - 2})])) AS gh
      FROM d WHERE len(toks) >= {CONTAM_W}
    ), train_g AS (
      SELECT DISTINCT gh FROM g WHERE split = 'train'
    )
    SELECT g.doc_id, g.split, COUNT(*) AS n_shared_grams
    FROM g JOIN train_g USING (gh)
    WHERE g.split <> 'train'
    GROUP BY 1, 2
    """,
    tags=("corpus", "contamination", "ngram"),
)
def text_contamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination (GPT-3/C4 style): an eval document is
    contaminated when it shares a word-{CONTAM_W}-gram with ANY train
    document. Complements split_leakage_check — that catches exact
    duplicates across splits; this catches partial text overlap, which
    is what actually inflates benchmark scores.

    Scale design: n-grams are hashed to 64-bit before the join (md5 →
    15-hex-digit int, identical in both engines), so the shuffle moves
    8-byte keys instead of ~50-byte strings; the train side is
    distinct-ed before the equi-join. At 100 TB both sides partition by
    the hash; the eval side is typically tiny, so Spark broadcasts it —
    either orientation stays a single equi-join.
    """
    # r14: spread the 1-file scan before the md5-per-gram build (guide
    # §2.5; the hashing-heavy rule) — both the train and probe branches
    # inherit the parallelized exchange, which Spark reuses across them
    docs = catalog.spread(catalog.load(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    grams = F.expr(f"""
        array_distinct(transform(
          sequence(1, size(toks) - {CONTAM_W - 1}),
          i -> CAST(conv(substring(md5(concat_ws(' ',
                 slice(toks, i, {CONTAM_W}))), 1, 15), 16, 10) AS BIGINT)))""")
    # No persist on the shared gram subtree: A/B at sf0.1 shows the
    # double computation (train branch + probe branch) ties or beats
    # materializing 450k hashed-gram rows through the memory store —
    # the md5 work is cheap relative to the block-manager roundtrip at
    # this gram volume. Revisit only if CONTAM_W or the corpus grows
    # the per-gram cost.
    d = (docs.select("doc_id", assign_split("doc_id").alias("split"),
                     toks.alias("toks"))
         .filter(F.size("toks") >= CONTAM_W)
         .select("doc_id", "split", F.explode(grams).alias("gh")))
    train_g = d.filter(F.col("split") == "train").select("gh").distinct()
    return (d.filter(F.col("split") != "train")
            .join(train_g, "gh")
            .groupBy("doc_id", "split")
            .agg(F.count(F.lit(1)).alias("n_shared_grams")))


@register(
    "curriculum_rank_global",
    oracle="""
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id)
             AS curriculum_rank
    FROM documents
    """,
    tags=("corpus", "curriculum", "global-rank"),
)
def curriculum_rank_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: a GLOBAL, contiguous 1-based rank of the
    corpus (longest docs first — the stand-in for any quality score) —
    the export ordering a curriculum-training loader consumes.

    Built on the distributed range-partition rank
    (sources/tensorize.global_row_number — the reference-K1 keying
    machinery), NOT a bare ``row_number() OVER (ORDER BY ...)``: the
    windowed form sorts the entire corpus in ONE task, this one sorts
    each range in parallel and offsets by cumulative range counts, so
    the same query survives a 100x scale-up.
    """
    from new_data_pipeline_spark.sources.tensorize import global_row_number
    docs = catalog.load(spark, sf_dir, "documents")
    ranked, _ = global_row_number(
        docs.select("doc_id", "n_chars"),
        order_by=[F.col("n_chars").desc(), F.col("doc_id")],
        key_col="curriculum_rank")
    return ranked.select("doc_id", F.col("curriculum_rank").cast("bigint"))


SUBSTR_W = 10  # tokens per window; Lee et al. use 50 BPE tokens — the
               # testdata's ~100-token docs need a shorter window to
               # exercise the operator


@register(
    "dedup_exact_substrings",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), spans AS (
      SELECT doc_id,
             unnest([CAST('0x' || substr(md5(array_to_string(
                  w[i:i+{SUBSTR_W - 1}], ' ')), 1, 15) AS BIGINT)
                     for i in range(1, len(w) - {SUBSTR_W - 2})]) AS sh
      FROM t WHERE len(w) >= {SUBSTR_W}
    ), rep AS (
      SELECT sh FROM spans GROUP BY sh
      HAVING COUNT(DISTINCT doc_id) > 1
    ), per_doc AS (
      SELECT s.doc_id,
             COUNT(*) AS n_spans,
             COUNT(*) FILTER (WHERE r.sh IS NOT NULL) AS n_dup_spans
      FROM spans s LEFT JOIN rep r USING (sh)
      GROUP BY s.doc_id
    )
    SELECT doc_id, n_spans, n_dup_spans,
           round(CAST(n_dup_spans AS DOUBLE) / n_spans, 6) AS dup_fraction
    FROM per_doc WHERE n_dup_spans > 0
    """,
    tags=("dedup", "substring", "corpus"),
)
def dedup_exact_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): a {SUBSTR_W}-token
    window occurring in MORE THAN ONE document marks duplicated text —
    the signal their suffix-array pass extracts, here as the
    distributed approximation every large pipeline actually ships:
    hash every token window, keep corpus-repeated hashes, report each
    affected document's duplicated-span fraction (the cut list for a
    span-removal rewrite). Catches partial overlap that document-level
    MinHash misses (a copied paragraph inside an otherwise-unique doc).

    Scale design: windows hash to 64-bit before any shuffle (md5 →
    15-hex-digit int, bit-identical in DuckDB, same device as
    text_contamination_ngrams); the pipeline is two keyed aggregations
    plus one equi-join on the hash — no strings move, no pairwise
    comparison exists anywhere. The repeated-hash table is a small
    fraction of the corpus and broadcasts at any scale.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    t = (docs.select("doc_id", F.split("text", " ").alias("w"))
         .filter(F.size("w") >= SUBSTR_W))
    span_hash = (
        f"transform(sequence(1, size(w) - {SUBSTR_W - 1}), "
        f"i -> cast(conv(substring(md5(concat_ws(' ', slice(w, i, "
        f"{SUBSTR_W}))), 1, 15), 16, 10) as bigint))")
    spans = t.select("doc_id", F.explode(F.expr(span_hash)).alias("sh"))
    rep = (spans.groupBy("sh")
           .agg(F.countDistinct("doc_id").alias("nd"))
           .filter(F.col("nd") > 1)
           .select("sh"))
    per_doc = (spans.join(F.broadcast(rep.withColumn("dup", F.lit(1))),
                          ["sh"], "left")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_spans"),
                    F.count("dup").alias("n_dup_spans")))
    return (per_doc.filter(F.col("n_dup_spans") > 0)
            .select("doc_id", "n_spans", "n_dup_spans",
                    F.round(F.col("n_dup_spans").cast("double")
                            / F.col("n_spans"), 6).alias("dup_fraction")))


# One output shard holds ~this many whitespace tokens (webdataset-style
# shard sizing); the closed-form assignment below packs docs greedily
# in doc_id order: a doc belongs to shard floor(exclusive_cumsum / B).
TOKEN_SHARD_BUDGET = 5_000


@register(
    "corpus_token_shards",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS toks FROM documents
    ), c AS (
      SELECT doc_id, toks,
             SUM(toks) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
               - toks AS excl
      FROM t
    )
    SELECT CAST(excl // {TOKEN_SHARD_BUDGET} AS BIGINT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS shard_tokens
    FROM c GROUP BY 1
    """,
    tags=("corpus", "sharding", "prefix-sum", "ml-prep"),
)
def corpus_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard assignment (the webdataset/TFRecord shard-
    creation step): pack documents in doc_id order into shards of
    ~TOKEN_SHARD_BUDGET whitespace tokens each, via the closed form
    ``shard = floor(exclusive_prefix_tokens / budget)`` — greedy
    sequential packing without a sequential pass.

    The scalable device is the distributed global prefix sum
    (``tensorize.global_running_sum``): a bare ``SUM OVER (ORDER BY
    doc_id)`` — which the DuckDB oracle happily runs at gate scale —
    would single-task the corpus in Spark; instead the corpus is
    range-partitioned on doc_id, per-range totals are collected
    (O(ranges) driver memory), and each range windows only itself with
    its offset added. Identical result, every partition parallel — the
    same zipWithIndex-style device the K1 key assignment uses
    (reference serialize.py:30-32 assigns ITS keys with exactly this
    kind of running counter, single-threaded).

    Output is the per-shard manifest (docs, true token count) a shard
    writer would consume; at 100 TB the assignment column feeds
    ``repartitionByRange(shard_id)`` + one file per shard.
    """
    from new_data_pipeline_spark.sources.tensorize import global_running_sum

    docs = catalog.load(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.size(F.split("text", " ")).alias("toks"))
    c = global_running_sum(t, ["doc_id"], "toks", out_col="excl")
    # integer DIV, not floor(double /): excl is a bigint cumulative sum
    # and the oracle divides with exact //; a double division loses
    # exactness once cumulative tokens approach 2^53 (ADVICE r8)
    return (c.withColumn("shard_id",
                         F.expr(f"excl DIV {TOKEN_SHARD_BUDGET}")
                         .cast("bigint"))
            .groupBy("shard_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("toks").cast("bigint").alias("shard_tokens")))
