"""Statistical language-model quality scoring: a corpus-trained bigram
LM with add-k smoothing, scoring every document by average negative
log-likelihood — the CCNet / KenLM-perplexity-filter stage of real
pretraining pipelines (Wenzek et al. 2020 rank Common Crawl by LM
perplexity; this is that operator with the LM trained distributed, on
the corpus itself).

Execution shape at 100 TB:
- training IS aggregation: bigram counts (groupBy w1,w2) and context
  counts (a second groupBy over the vocabulary-sized count table, never
  over the corpus) — both map-side-combinable, the model never exists
  on the driver;
- scoring is a hashed equi-join of the exploded doc bigrams against the
  vocabulary²-bounded count table (the same hashed-gram-join shape as
  text_contamination_ngrams) followed by a per-doc aggregate — no
  broadcast assumption, so an open-vocabulary web corpus works;
- the vocabulary size enters as a 1-row aggregate cross-joined in (the
  repo's standard scalar-aggregate device), not a collected literal.

Parity devices (see cross-engine notes in conftest):
- add-k with k=0.5 is written as (2·c2+1)/(2·c1+V) — integer numerator
  and denominator, one IEEE division, no float literal drift;
- ln() rounded to 6 dp on both engines (the text_tfidf device) and cast
  to DECIMAL(18,6), so the per-doc SUM is an exact decimal monoid —
  reduction order cannot shift the result;
- final avg = ROUND(-CAST(sum AS DOUBLE)/n, 6): one deterministic
  division on identical operands.

Reference analog: the reference's CountVectorizer vocabulary fit
(serialize.py:220-235) is the closest surface — it counts tokens but
never models them; SURVEY.md §2.2 text-analysis extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register


def train_bigram_counts(docs: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(bigram counts c2, context counts c1, 1-row vocab size) from a
    ``documents``-shaped frame; all three are aggregates, never
    collected."""
    base = (docs.select("doc_id", F.split("text", " ").alias("t"))
            .filter(F.size("t") >= 2))
    bg = (base.select("doc_id", F.explode(F.expr(
        "transform(sequence(1, size(t) - 1),"
        " i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"))
        .alias("b"))
        .select("doc_id", "b.w1", "b.w2"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (docs.select(F.explode(F.split("text", " ")).alias("w"))
             .agg(F.countDistinct("w").alias("v")))
    return c2, c1, vocab


@register(
    "text_lm_perplexity",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ), bg AS (
      SELECT doc_id, b.w1 AS w1, b.w2 AS w2
      FROM (SELECT doc_id,
                   unnest([{'w1': t[i], 'w2': t[i + 1]}
                           for i in range(1, len(t))]) AS b
            FROM base)
    ), c2 AS (
      SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2
    ), c1 AS (
      SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1
    ), v AS (
      SELECT COUNT(DISTINCT w) AS v
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    ), scored AS (
      SELECT bg.doc_id,
             CAST(ROUND(ln(CAST(2 * c2.c2 + 1 AS DOUBLE)
                           / (2 * c1.c1 + (SELECT v FROM v))), 6)
                  AS DECIMAL(18,6)) AS logp
      FROM bg
      JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
      JOIN c1 ON bg.w1 = c1.w1
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(-CAST(SUM(logp) AS DOUBLE) / COUNT(*), 6) AS avg_nll
    FROM scored GROUP BY doc_id
    """,
    tags=("text", "lm", "quality", "curation"),
)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-likelihood under the
    corpus-trained add-0.5-smoothed bigram LM (low = typical corpus
    prose, high = outlier text the perplexity filter would drop)."""
    return score_documents(catalog.load(spark, sf_dir, "documents"))


def score_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, avg_nll) for every ≥2-token doc, under the
    bigram LM trained on ``docs`` itself."""
    c2, c1, vocab = train_bigram_counts(docs)
    base = (docs.select("doc_id", F.split("text", " ").alias("t"))
            .filter(F.size("t") >= 2))
    bg = (base.select("doc_id", F.explode(F.expr(
        "transform(sequence(1, size(t) - 1),"
        " i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"))
        .alias("b"))
        .select("doc_id", "b.w1", "b.w2"))
    scored = (bg.join(c2, ["w1", "w2"]).join(c1, ["w1"]).crossJoin(vocab)
              .select("doc_id",
                      F.round(F.log((2 * F.col("c2") + 1).cast("double")
                                    / (2 * F.col("c1") + F.col("v"))), 6)
                      .cast("decimal(18,6)").alias("logp")))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round((-F.sum("logp")).cast("double")
                         / F.count(F.lit(1)), 6).alias("avg_nll")))
