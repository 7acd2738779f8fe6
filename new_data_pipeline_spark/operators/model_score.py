"""Model-based document scoring: batch inference of a linear (logistic)
quality classifier over engineered text features — the fasttext-style
"model filter" stage of real curation pipelines (Common Crawl quality
classifiers, fineweb-edu-style scorers), distinct from the rule-based
heuristics in text_analysis.text_quality_score.

Inference shape, which is the point: the model is a WEIGHT VECTOR that
broadcasts (a closed-form expression here; a real trained model rides
the same path as a broadcast variable feeding an Arrow-batched UDF),
features are built-in expressions computed in whole-stage codegen, and
scoring is map-only — no shuffle until the final report aggregate. At
100 TB, model filtering costs one scan.

Parity devices: all features are integer counts and single divisions
(engine-exact); the logit is a FIXED left-to-right sum of products;
the only libm call (exp in the sigmoid) is rounded to 6 dp on both
engines — the same device text_tfidf uses for log — and the keep/drop
decision compares the ROUNDED score so a last-ulp exp divergence can
never flip a bucket.

Reference analog: none — the reference's CountVectorizer fit
(serialize.py:220-235) builds features but never scores; SURVEY.md
§2.2 text-analysis extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.operators.text_analysis import STOPWORDS
from new_data_pipeline_spark.registry import register

# hand-set "trained" weights: (feature, weight). Chosen so the corpus
# splits non-trivially (both buckets populated at every scale factor).
BIAS = -3.0
WEIGHTS: tuple[tuple[str, float], ...] = (
    ("stopword_ratio", 9.0),      # English-like prose has stopwords
    ("distinct_ratio", 2.0),      # vocabulary diversity
    ("avg_token_len", 0.25),      # degenerate short/long tokens
    ("digit_ratio", -8.0),        # number soup is low quality
)
THRESHOLD = 0.5


def _features(docs: DataFrame) -> DataFrame:
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks).cast("bigint")
    n_chars = F.length("text").cast("bigint")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
         .cast("double") / n_tokens).alias("stopword_ratio"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tokens)
        .alias("distinct_ratio"),
        ((n_chars - (n_tokens - 1)).cast("double") / n_tokens)
        .alias("avg_token_len"),
        ((n_chars - F.length(F.regexp_replace("text", "[0-9]", "")))
         .cast("double") / n_chars).alias("digit_ratio"))


def score_documents(docs: DataFrame) -> DataFrame:
    """doc_id + features + 6-dp logistic score + keep/drop bucket."""
    feats = _features(docs)
    logit = F.lit(BIAS)
    for name, w in WEIGHTS:           # fixed left-to-right sum order
        logit = logit + F.lit(w) * F.col(name)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    return (feats
            .withColumn("score", score)
            .withColumn("bucket",
                        F.when(F.col("score") >= THRESHOLD, "keep")
                        .otherwise("drop")))


def _oracle_logit() -> str:
    terms = [str(BIAS)] + [f"{w} * {name}" for name, w in WEIGHTS]
    return " + ".join(terms)


@register(
    "text_model_quality_filter",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> list_contains({list(STOPWORDS)!r}, w)))
                  AS DOUBLE)
               / len(string_split(text, ' ')) AS stopword_ratio,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS distinct_ratio,
             CAST(length(text) - (len(string_split(text, ' ')) - 1)
                  AS DOUBLE)
               / len(string_split(text, ' ')) AS avg_token_len,
             CAST(length(text)
                  - length(regexp_replace(text, '[0-9]', '', 'g'))
                  AS DOUBLE) / length(text) AS digit_ratio
      FROM documents
    ), scored AS (
      SELECT doc_id, n_tokens,
             ROUND(1.0 / (1.0 + exp(-({_oracle_logit()}))), 6) AS score
      FROM f
    )
    SELECT CASE WHEN score >= {THRESHOLD} THEN 'keep' ELSE 'drop' END
             AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           -- mean via EXACT decimal sum (scores are 6-dp-rounded, so
           -- DECIMAL(10,6) holds them exactly); a double AVG would be
           -- reduction-order nondeterministic across engines
           ROUND(CAST(SUM(CAST(score AS DECIMAL(10,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_score,
           ROUND(MIN(score), 6) AS min_score,
           ROUND(MAX(score), 6) AS max_score
    FROM scored
    GROUP BY bucket
    """,
    tags=("text", "model", "inference", "curation"),
)
def text_model_quality_filter(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Corpus report of the logistic quality filter: per keep/drop
    bucket, document and token counts plus score distribution — the
    numbers a curation run logs before committing to a filter."""
    docs = catalog.load(spark, sf_dir, "documents")
    scored = score_documents(docs)
    return (scored.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("n_tokens"),
                 # exact decimal sum, single division (see oracle note)
                 F.round(F.sum(F.col("score").cast("decimal(10,6)"))
                         .cast("double") / F.count(F.lit(1)), 6)
                 .alias("mean_score"),
                 F.round(F.min("score"), 6).alias("min_score"),
                 F.round(F.max("score"), 6).alias("max_score")))
