"""Text-analysis operators over the documents corpus: token counting,
quality scoring, language-ID heuristic, fingerprinting, term stats.

Descendants of the reference's only text operator — the CountVectorizer
bag-of-words fit (reference serialize.py:220-235, T3 in SURVEY.md §2.1)
— extended to the text-prep surface a training-data pipeline needs.

Scale design: every metric is a built-in-function expression evaluated
in whole-stage codegen over one scan of documents; no Python UDFs, no
shuffle except the final aggregates. Parity design: integer counting +
single double divisions only (no libm), so DuckDB hashes bit-equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

STOPWORDS = ("the", "a", "of", "and", "in")

# language marker words for the n-gram/stopword language-ID heuristic;
# counts are exact substring occurrences, so both engines agree.
LANG_MARKERS = {"en": " the ", "es": " la ", "fr": " le ", "de": " der "}


def _occurrences(col, needle: str):
    """Exact substring-occurrence count: (len - len(remove(needle))) / len(needle)."""
    return ((F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
            / len(needle)).cast("bigint")


def _sql_occurrences(expr: str, needle: str) -> str:
    return (f"CAST((length({expr}) - length(replace({expr}, '{needle}', '')))"
            f" / {len(needle)} AS BIGINT)")


@register(
    "text_token_counts",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
             AS n_distinct_tokens,
           CAST(list_sum([CAST(ceil(length(w) / 4.0) AS BIGINT)
                          for w in string_split(text, ' ')]) AS BIGINT)
             AS n_bpe_est
    FROM documents
    """,
    tags=("text", "tokens"),
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, and a
    BPE-style subword estimate (ceil(len/4) per word — the common
    chars-per-token rule of thumb)."""
    docs = catalog.load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_actual"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_ws_tokens"),
        F.size(F.array_distinct(F.split("text", " "))).cast("bigint")
         .alias("n_distinct_tokens"),
        F.expr("""CAST(aggregate(
                    transform(split(text, ' '),
                              w -> CAST(ceil(length(w) / 4.0) AS BIGINT)),
                    0L, (acc, x) -> acc + x) AS BIGINT)""")
         .alias("n_bpe_est"))


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
             CAST(length(text) AS BIGINT) AS n_chars_actual,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> list_contains({list(STOPWORDS)!r}, w)))
                  AS BIGINT) AS n_stop,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                  AS BIGINT) AS n_digits
      FROM documents
    )
    SELECT doc_id, n_tokens, n_stop,
           CAST(n_chars_actual - (n_tokens - 1) AS DOUBLE) / n_tokens
             AS avg_token_len,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_digits AS DOUBLE) / n_chars_actual AS digit_ratio,
           CASE WHEN n_tokens >= 50 AND n_stop > 0 THEN 'good'
                WHEN n_tokens >= 20 THEN 'fair'
                ELSE 'poor' END AS quality_band
    FROM t
    """,
    tags=("text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/stopword/digit ratios + a banded verdict —
    the standard cheap filters before expensive LLM-data processing."""
    docs = catalog.load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    t = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_actual"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
         .cast("bigint").alias("n_stop"),
        (F.length("text")
         - F.length(F.regexp_replace("text", "[0-9]", "")))
        .cast("bigint").alias("n_digits"))
    return t.select(
        "doc_id", "n_tokens", "n_stop",
        ((F.col("n_chars_actual") - (F.col("n_tokens") - 1)).cast("double")
         / F.col("n_tokens")).alias("avg_token_len"),
        (F.col("n_stop").cast("double") / F.col("n_tokens"))
        .alias("stopword_ratio"),
        (F.col("n_digits").cast("double") / F.col("n_chars_actual"))
        .alias("digit_ratio"),
        F.when((F.col("n_tokens") >= 50) & (F.col("n_stop") > 0), "good")
         .when(F.col("n_tokens") >= 20, "fair")
         .otherwise("poor").alias("quality_band"))


@register(
    "text_langid",
    oracle=f"""
    WITH scores AS (
      SELECT doc_id, lang AS declared_lang,
             {_sql_occurrences("' ' || text || ' '", LANG_MARKERS['en'])} AS s_en,
             {_sql_occurrences("' ' || text || ' '", LANG_MARKERS['es'])} AS s_es,
             {_sql_occurrences("' ' || text || ' '", LANG_MARKERS['fr'])} AS s_fr,
             {_sql_occurrences("' ' || text || ' '", LANG_MARKERS['de'])} AS s_de
      FROM documents
    )
    SELECT doc_id, declared_lang, s_en, s_es, s_fr, s_de,
           CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
                WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
                WHEN s_fr >= s_de THEN 'fr'
                ELSE 'de' END AS predicted_lang
    FROM scores
    """,
    tags=("text", "langid"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-word occurrence scores with a
    deterministic argmax (ties resolve en > es > fr > de).

    A real pipeline swaps the marker table for character-n-gram
    profiles; the plumbing (score columns → argmax) is identical.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    t = docs.select(
        "doc_id", F.col("lang").alias("declared_lang"),
        *[_occurrences(padded, m).alias(f"s_{l}")
          for l, m in LANG_MARKERS.items()])
    s = {l: F.col(f"s_{l}") for l in LANG_MARKERS}
    return t.withColumn(
        "predicted_lang",
        F.when((s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["de"]), "en")
         .when((s["es"] >= s["fr"]) & (s["es"] >= s["de"]), "es")
         .when(s["fr"] >= s["de"], "fr")
         .otherwise("de"))


@register(
    "text_fingerprint",
    oracle="""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT doc_id,
           md5(norm) AS fp_md5,
           CAST(list_reduce(
                  [0::BIGINT] ||
                  [ord(norm[i]) for i in range(1, least(length(norm), 64) + 1)],
                  (acc, c) -> (acc * 31 + c) % 1000000007) AS BIGINT)
             AS fp_rolling
    FROM norm
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full-text md5 + a 64-char polynomial
    rolling hash (base 31 mod 1e9+7) over normalized text — the cheap
    keys exact dedup clusters on."""
    docs = catalog.load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    t = docs.select("doc_id", norm.alias("norm"))
    return t.select(
        "doc_id",
        F.md5("norm").alias("fp_md5"),
        F.expr("""CAST(aggregate(
                    transform(sequence(1, least(length(norm), 64)),
                              i -> ascii(substring(norm, i, 1))),
                    0L, (acc, c) -> (acc * 31 + c) % 1000000007L) AS BIGINT)""")
         .alias("fp_rolling"))


@register(
    "text_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), n AS (SELECT COUNT(*) AS n FROM documents),
    dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf
           FROM toks GROUP BY doc_id, term),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln((n.n + 1.0) / (dft.df + 1.0)) AS tfidf
      FROM tf JOIN dft USING (term) CROSS JOIN n
    ), ranked AS (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rn
      FROM scored
    )
    SELECT doc_id, term AS top_term, round(tfidf, 6) AS top_tfidf
    FROM ranked WHERE rn = 1
    """,
    tags=("text", "tfidf"),
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF over the corpus: tf(term,doc) · ln((N+1)/(df+1))
    (Spark ML's IDF convention — no additive shift), top term per doc.

    Oracled since round 3: ln() is libm, so engines can disagree in the
    last ulp — but the emitted value is rounded to 6 dp (a boundary flip
    needs the true value within ~1 ulp of a decimal rounding edge:
    vanishingly unlikely for the irrational log products, verified MATCH
    at sf0.001/0.01/0.1) and the top-term ranking only diverges on
    sub-ulp tfidf near-ties between different (tf, df) pairs, which do
    not occur. The numpy golden test in tests/test_llm_ops.py remains
    the semantic pin.

    Scale: two aggregates (df per term, tf per doc-term) + a broadcast
    join of the term→idf table; no ML-fit state. The corpus size N is a
    1-row aggregate broadcast-cross-joined into the idf table — one plan
    and one corpus scan serve both, instead of a separate driver-side
    count() job per invocation.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    n_tbl = docs.agg(F.count(F.lit(1)).alias("__n"))
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    df_tbl = (toks.select("doc_id", "term").distinct()
              .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
              .crossJoin(F.broadcast(n_tbl))
              .withColumn("idf", F.log((F.col("__n") + 1) / (F.col("df") + 1)))
              .drop("__n"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = (tf.join(F.broadcast(df_tbl), "term")
              .withColumn("tfidf", F.col("tf") * F.col("idf")))
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", F.col("term").alias("top_term"),
                    F.round("tfidf", 6).alias("top_tfidf")))


BOW_VOCAB = 100


@register(
    "text_bow_vectorize",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), counts AS (
      SELECT term, COUNT(*) AS tf FROM toks GROUP BY term
    ), vocab AS (
      SELECT term,
             CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS INTEGER) AS term_id
      FROM counts
      QUALIFY term_id <= {BOW_VOCAB}
    ), doc_terms AS (
      SELECT t.doc_id, v.term_id, COUNT(*) AS cnt
      FROM toks t JOIN vocab v USING (term)
      GROUP BY t.doc_id, v.term_id
    )
    SELECT doc_id,
           array_to_string(list(term_id ORDER BY term_id), ',') AS term_ids,
           array_to_string(list(CAST(cnt AS INTEGER) ORDER BY term_id), ',')
             AS counts
    FROM doc_terms
    GROUP BY doc_id
    """,
    tags=("text", "bow"),
)
def text_bow_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 descendant: bag-of-words vectorization with a DETERMINISTIC
    vocabulary (rank by count desc, then term — Spark ML's
    CountVectorizer breaks count ties arbitrarily, so the oracle-gated
    path builds the vocab relationally; sparse (term_ids, counts)
    vectors are emitted as ','-joined strings at the query boundary,
    reference serialize.py:220-235).

    Scale: vocab build = distributed TakeOrdered (orderBy + limit(V)),
    then ``global_row_number`` (range-partitioned rank + offsets) over
    the ≤V surviving rows — no unpartitioned window anywhere in the
    plan, and the term dictionary itself is never globally sorted.
    Doc vectors = explode + join-on-broadcast-vocab + grouped sort —
    no Python, no fit/transform state outside the plan.
    """
    from new_data_pipeline_spark.sources.tensorize import global_row_number
    docs = catalog.load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    top = counts.orderBy(F.col("tf").desc(), "term").limit(BOW_VOCAB)
    ranked, _ = global_row_number(
        top, [F.col("tf").desc(), "term"], "__rn", num_ranges=4)
    vocab = ranked.select("term", F.col("__rn").cast("integer").alias("term_id"))
    doc_terms = (toks.join(F.broadcast(vocab), "term")
                 .groupBy("doc_id", "term_id")
                 .agg(F.count(F.lit(1)).cast("integer").alias("cnt")))
    pairs = (doc_terms.groupBy("doc_id")
             .agg(F.sort_array(F.collect_list(F.struct("term_id", "cnt")))
                  .alias("pairs")))
    return pairs.select(
        "doc_id",
        F.array_join(F.expr("transform(pairs, p -> p.term_id)"), ",")
         .alias("term_ids"),
        F.array_join(F.expr("transform(pairs, p -> p.cnt)"), ",")
         .alias("counts"))


@register(
    "text_term_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    )
    SELECT term,
           COUNT(*) AS tf,
           COUNT(DISTINCT doc_id) AS df
    FROM toks
    GROUP BY term
    HAVING COUNT(*) >= 100
    """,
    tags=("text", "terms"),
)
def text_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term/document frequencies (the vocabulary build behind the
    reference's CountVectorizer fit, serialize.py:230-231) for terms
    with tf ≥ 100.

    Scale design: explode → two-level aggregate; partial aggregation
    collapses each partition's term counts before the shuffle. IDF/TF-IDF
    weighting is a log() away — kept out of the oracle gate (libm).
    """
    docs = catalog.load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    return (toks.groupBy("term")
            .agg(F.count(F.lit(1)).alias("tf"),
                 F.countDistinct("doc_id").alias("df"))
            .filter(F.col("tf") >= 100))


@register(
    "text_pii_scrub",
    oracle="""
    WITH seeded AS (
      -- deterministic synthetic PII appended per doc (the corpus itself
      -- is clean); the scrub must remove exactly what was planted
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-01' || CAST(doc_id % 100 AS VARCHAR)
                  AS raw
      FROM documents
    ), scrubbed AS (
      SELECT doc_id, raw,
             regexp_replace(
               regexp_replace(raw,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\+?[0-9][0-9()\\-]{7,}', '<PHONE>', 'g') AS clean,
             CAST(len(regexp_extract_all(raw,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
               AS n_emails,
             CAST(len(regexp_extract_all(raw,
               '\\+?[0-9][0-9()\\-]{7,}')) AS BIGINT) AS n_phones
      FROM seeded
    )
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(n_emails) AS BIGINT) AS total_emails,
           CAST(SUM(n_phones) AS BIGINT) AS total_phones,
           CAST(SUM(CASE WHEN clean <> raw THEN 1 ELSE 0 END) AS BIGINT)
             AS n_redacted,
           CAST(SUM(length(raw) - length(clean)) AS BIGINT) AS chars_removed
    FROM scrubbed
    """,
    tags=("text", "pii", "pipeline"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: find-and-mask emails and phone numbers,
    reporting match counts and redaction deltas corpus-wide.

    The corpus is synthetic and clean, so the query plants deterministic
    PII per row first — the assertion is then exact: every planted email
    and phone is found and masked (total_emails == total_phones ==
    n_docs). Patterns are ASCII-safe in both regex engines (Java util.
    regex vs RE2). One scan, whole-stage codegen, final single-row agg —
    the shape of a 100 TB compliance sweep.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    email_pat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    phone_pat = "\\+?[0-9][0-9()\\-]{7,}"
    raw = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@example.com or +1-555-01"),
        (F.col("doc_id") % 100).cast("string"))
    seeded = docs.select("doc_id", raw.alias("raw"))
    clean = F.regexp_replace(
        F.regexp_replace("raw", email_pat, "<EMAIL>"),
        phone_pat, "<PHONE>")
    scrubbed = seeded.select(
        "raw", clean.alias("clean"),
        F.regexp_count("raw", F.lit(email_pat)).alias("n_emails"),
        F.regexp_count("raw", F.lit(phone_pat)).alias("n_phones"))
    return scrubbed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_emails").alias("total_emails"),
        F.sum("n_phones").alias("total_phones"),
        F.sum(F.when(F.col("clean") != F.col("raw"), 1).otherwise(0))
        .alias("n_redacted"),
        F.sum(F.length("raw") - F.length("clean")).alias("chars_removed"))


@register(
    "text_top_bigrams",
    oracle="""
    WITH toks AS (
      SELECT list_filter(string_split_regex(lower(text), '\\W+'),
                         x -> x <> '') AS t
      FROM documents
    ), bg AS (
      SELECT unnest([t[i] || ' ' || t[i + 1]
                     for i in range(1, len(t))]) AS bigram
      FROM toks
      WHERE len(t) >= 2
    )
    SELECT bigram, COUNT(*) AS n
    FROM bg
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
    tags=("text", "ngram", "pipeline"),
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-20 word bigrams: lowercase, split on non-word runs,
    pair adjacent tokens, count, top-k with lexicographic tiebreak.

    The n-gram counting pass behind phrase mining / contamination
    checks. Spark side builds bigrams with a JVM higher-order transform
    over sequence(1, n-1) — no Python, no UDF; partial aggregation
    collapses per-partition counts before the single shuffle, and the
    global top-20 is a TakeOrdered merge, not a sort.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), "\\W+"), lambda x: x != "")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.concat(F.element_at("t", i), F.lit(" "),
                           F.element_at("t", i + 1)))
    return (docs.select(toks.alias("t"))
            .filter(F.size("t") >= 2)
            .select(F.explode(bigrams).alias("bigram"))
            .groupBy("bigram")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), "bigram")
            .limit(20))


HH_SHARE = 0.005   # heavy hitter = token holding > 0.5% of all tokens
HH_CAPACITY = 400  # Misra-Gries counters per partition; N/400 < 0.5%·N


def _misra_gries_fn(capacity: int):
    """Per-partition Misra-Gries summary over a token stream.

    Maintains at most ``capacity`` counters; on overflow subtracts the
    smallest surviving value from every counter and drops the
    non-positive (the batched decrement). Any token whose true count in
    the partition exceeds n_partition/capacity survives, so the union
    of partition summaries is a superset of every token with global
    share > 1/capacity — the exact-recount pass then filters precisely.

    Returned as a closure so cloudpickle serializes it by value (the
    grading driver's Python workers cannot import this package).
    """
    def summarize(iterator):
        import numpy as np
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in iterator:
            for w, c in pdf["w"].value_counts().items():
                counters[w] = counters.get(w, 0) + int(c)
            if len(counters) > capacity:
                vals = np.sort(np.fromiter(counters.values(), dtype=np.int64))
                m = int(vals[len(vals) - capacity - 1])
                counters = {w: n - m for w, n in counters.items() if n > m}
        # dtype=object: an empty partition must still yield a
        # string-convertible column, not pandas' default float64
        yield pd.DataFrame({"w": pd.Series(list(counters), dtype=object)})

    return summarize


@register(
    "text_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), total AS (
      SELECT COUNT(*) AS n FROM toks
    )
    SELECT w, COUNT(*) AS cnt,
           round(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(total.n), 6) AS share
    FROM toks, total
    GROUP BY w
    HAVING COUNT(*) > {HH_SHARE} * ANY_VALUE(total.n)
    """,
    tags=("text", "heavy-hitters", "sketch"),
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (> 0.5% token share) in two bounded-memory
    passes: per-partition Misra-Gries summaries (zero shuffle, ≤ 400
    counters per task) propose candidates; a broadcast semi-join +
    recount gives their exact counts. Identical output to a full
    groupBy, but the shuffle carries only candidate tokens — on a
    100 TB corpus with billions of distinct tokens that is the
    difference between shuffling the vocabulary and shuffling a
    few hundred rows.

    The oracle is the plain exact SQL — the MG candidate pass is
    provably a superset of the heavy hitters, so both plans agree
    bit-for-bit.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("w"))
    cands = (toks.mapInPandas(_misra_gries_fn(HH_CAPACITY), "w string")
             .distinct())
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    return (toks.join(F.broadcast(cands), "w", "left_semi")
            .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
            .crossJoin(F.broadcast(total))
            .filter(F.col("cnt") > HH_SHARE * F.col("n"))
            .select("w", "cnt",
                    F.round(F.col("cnt").cast("double") / F.col("n"), 6)
                     .alias("share")))


HASH_DIM = 1024


@register(
    "text_hashing_vectorize",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), bucketed AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT)
               % {HASH_DIM} AS b,
             COUNT(*) AS cnt
      FROM toks GROUP BY 1, 2
    )
    SELECT doc_id,
           array_to_string(list(b ORDER BY b), ',') AS bucket_ids,
           array_to_string(list(CAST(cnt AS INTEGER) ORDER BY b), ',')
             AS counts
    FROM bucketed GROUP BY doc_id
    """,
    tags=("text", "vectorize", "hashing-trick"),
)
def text_hashing_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick vectorizer (Weinberger et al. 2009): terms map
    straight to md5-derived buckets mod 1024 — the STATELESS,
    fixed-dimension counterpart of text_bow_vectorize. No vocabulary is
    built, broadcast, or versioned, so the operator is one map-side
    expression plus a grouped count: an open-vocabulary web corpus and
    incremental batches vectorize identically with zero fit state. The
    cost is collisions (dimension picks the trade), which downstream
    linear models absorb.

    Scale: groupBy (doc_id, bucket) then per-doc assembly — both
    map-combinable; nothing vocabulary-sized exists anywhere.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    bucketed = (toks.select(
        "doc_id",
        F.expr(f"CAST(conv(substring(md5(term), 1, 8), 16, 10) AS BIGINT)"
               f" % {HASH_DIM}").alias("b"))
        .groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("cnt")))
    pairs = F.sort_array(F.collect_list(F.struct("b", "cnt")))
    return (bucketed.groupBy("doc_id")
            .agg(F.concat_ws(",", F.transform(pairs, lambda p:
                                              p["b"].cast("string")))
                 .alias("bucket_ids"),
                 F.concat_ws(",", F.transform(pairs, lambda p:
                                              p["cnt"].cast("int")
                                              .cast("string")))
                 .alias("counts")))
