"""Multinomial Naive Bayes source classifier — TRAINED by aggregation,
the distributed-training counterpart to model_score.py's fixed-weight
inference: real curation pipelines train exactly this shape of model
(fasttext/NB domain and quality classifiers) over the corpus they are
about to filter, and the training pass must itself be a scalable Spark
plan, not a driver-side fit.

Training IS two aggregations: per-(source, token) counts and per-source
token totals — the sufficient statistics of multinomial NB. "The model"
is the (vocab × sources) log-likelihood table plus per-source log
priors; add-1 smoothing makes every (token, source) cell well-defined.
Inference is one pass over token instances: join the broadcast model,
sum log-probabilities per (doc, candidate source), argmax.

Scale shape: the model table is vocab×S rows (S = #sources, a small
constant) — broadcast-sized the way real NB/fasttext models ship to
executors; scoring fans tokens out ×S but the partial aggregate
collapses to |docs|·S rows before the shuffle (map-side combine), and
the argmax is a map-side min_by, not a window. Training adds ONE
shuffle (the count groupBy). No Python UDFs anywhere.

Parity devices (the lm_score.py playbook): every log is rounded to
6 dp and cast to DECIMAL(18,6) on BOTH engines, so the per-document
sum is EXACT decimal arithmetic — float reduction order cannot shift
a score, and the argmax tie-break is pinned (score DESC, source ASC).

Reference analog: none — the reference's CountVectorizer fit
(serialize.py:220-235) builds token counts but never trains or scores;
SURVEY.md §2.2 text-analysis/ML extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register


@register(
    "text_nb_source_classifier",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source AS actual, unnest(string_split(text, ' ')) AS w
      FROM documents
    ), cnt AS (
      SELECT actual AS s, w, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ), ns AS (
      SELECT s, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1
    ), v AS (
      SELECT COUNT(DISTINCT w) AS v FROM cnt
    ), pri AS (
      SELECT source AS ps,
             CAST(ROUND(ln(CAST(COUNT(*) AS DOUBLE)
                           / (SELECT COUNT(*) FROM documents)), 6)
                  AS DECIMAL(18,6)) AS plp
      FROM documents GROUP BY 1
    ), scored AS (
      SELECT t.doc_id, t.actual, ns.s,
             CAST(ROUND(ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)
                           / (ns.n + (SELECT v FROM v))), 6)
                  AS DECIMAL(18,6)) AS lp
      FROM tok t
      CROSS JOIN ns
      LEFT JOIN cnt c ON c.s = ns.s AND c.w = t.w
    ), agg AS (
      SELECT doc_id, actual, s, SUM(lp) AS tok_lp
      FROM scored GROUP BY 1, 2, 3
    ), fullsc AS (
      SELECT a.doc_id, a.actual, a.s, a.tok_lp + p.plp AS score
      FROM agg a JOIN pri p ON p.ps = a.s
    ), pick AS (
      SELECT doc_id, actual, s AS predicted,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, s) AS rn
      FROM fullsc
    )
    SELECT actual, predicted, COUNT(*) AS n_docs
    FROM pick WHERE rn = 1
    GROUP BY 1, 2
    """,
    tags=("text", "ml", "classifier", "curation"),
)
def text_nb_source_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train multinomial NB on (source → token counts), classify every
    document, and report the confusion matrix (actual, predicted,
    n_docs) — the self-test a production classifier stage runs before
    it is trusted to filter.

    The oracle replays training AND inference end-to-end in SQL: the
    gate's hash match proves the distributed training produced the
    same model, not just a similar one.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    n_total = docs.count()
    # r14: fan the one-file scan out before the explode — the tokenize
    # + score map work otherwise serializes on a single core (guide
    # §2.5; catalog.spread docstring)
    docs = catalog.spread(docs)
    tok = docs.select("doc_id", F.col("source").alias("actual"),
                      F.explode(F.split("text", " ")).alias("w"))
    # sufficient statistics: the (source, token) count table is THE
    # model. It feeds ns, the vocab count, and the scoring join —
    # non-identical consumers, so persist + eager fill (repo rule).
    cnt = (tok.groupBy(F.col("actual").alias("s"), "w")
           .agg(F.count(F.lit(1)).alias("c")).persist())
    cnt.count()
    ns = cnt.groupBy("s").agg(F.sum("c").alias("n"))
    v = cnt.select("w").distinct().count()  # O(1) driver scalar, like
    #                                         the count-derived moduli
    pri = (docs.groupBy(F.col("source").alias("ps"))
           .agg(F.round(F.log(F.count(F.lit(1)).cast("double")
                              / F.lit(float(n_total))), 6)
                .cast("decimal(18,6)").alias("plp")))
    # r14: collapse repeated tokens per doc BEFORE the ×S fan-out —
    # sum(lp) over m identical tokens equals lp·m EXACTLY in decimal
    # arithmetic (integer m scales the scale-6 decimal losslessly), so
    # the scoring join and the per-doc aggregate process one row per
    # DISTINCT (doc, token) instead of one per token instance. The
    # partial aggregate collapses in the same task the explode runs in
    # (doc rows never split across partitions), so the shuffle moves
    # fewer rows too (guide §2.3 "aggregate before you shuffle").
    # r14: re-cluster the collapsed rows by doc_id — the groupBy above
    # hash-partitions by (doc_id, actual, w), scattering each doc's
    # tokens across every partition, so the ×S scoring aggregate's
    # partial agg could not collapse (profiled: a 46.6 MB exchange for
    # a |docs|·S-row result). HashPartitioning(doc_id) satisfies the
    # clustered distribution of BOTH downstream groupBys (doc_id is a
    # prefix subset), so the score aggregate and the argmax run with
    # zero further exchanges and full map-side collapse; the
    # repartition moves only the 2.6 MB distinct-token rows.
    dtok = (tok.groupBy("doc_id", "actual", "w")
            .agg(F.count(F.lit(1)).alias("m"))
            .repartition("doc_id"))
    # r14: lp depends only on (s, w) — evaluate the log/round/decimal
    # chain once per MODEL cell (vocab×S rows) and once per source for
    # the unseen-token default, not once per scored row (was |dtok|·S
    # evaluations inside the scoring stage). The operands are the
    # identical doubles, so the rounded decimals are bit-equal.
    model = (cnt.join(F.broadcast(ns), "s")
             .select("s", "w",
                     F.round(F.log((F.col("c") + 1).cast("double")
                                   / (F.col("n") + F.lit(v))), 6)
                     .cast("decimal(18,6)").alias("mlp")))
    defaults = ns.select(
        "s",
        F.round(F.log(F.lit(1).cast("double")
                      / (F.col("n") + F.lit(v))), 6)
        .cast("decimal(18,6)").alias("lp0"))
    scored = (dtok.crossJoin(F.broadcast(defaults))
              .join(F.broadcast(model), ["s", "w"], "left")
              .withColumn("lp", F.coalesce(F.col("mlp"), F.col("lp0"))))
    agg = (scored.groupBy("doc_id", "actual", "s")
           .agg(F.sum(F.col("lp") * F.col("m")).alias("tok_lp")))
    fullsc = (agg.join(F.broadcast(pri), agg["s"] == pri["ps"])
              .withColumn("score", F.col("tok_lp") + F.col("plp")))
    # argmax by (score DESC, s ASC) as a map-side min_by over the
    # negated exact-decimal score — never a row_number shuffle
    pred = (fullsc.withColumn("negscore", -F.col("score"))
            .groupBy("doc_id", "actual")
            .agg(F.expr("min_by(s, struct(negscore, s))")
                 .alias("predicted")))
    return (pred.groupBy("actual", "predicted")
            .agg(F.count(F.lit(1)).alias("n_docs")))
