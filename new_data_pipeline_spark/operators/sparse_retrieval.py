"""Sparse TF-IDF retrieval via an inverted-index join — the SPARSE
complement to the dense ANN family (similarity.py / pq.py /
random_projection.py): candidates are found through shared terms, not
through a geometric index, which is how production text retrieval
(BM25/TF-IDF stacks) actually runs at corpus scale.

Execution shape, which is the point at 100 TB:
- postings = (shingle, doc, weight) — ONE shingle+aggregate pass (df
  per shingle, tf per doc-shingle; terms are WORD TRIGRAMS, not
  unigrams: the fixture corpus draws from a ~31-word vocabulary whose
  every unigram appears in ~78% of documents, so unigram posting
  lists carry no selectivity anywhere — the dedup family's shingling
  lesson applied to retrieval);
- the df cap (DF_CAP) prunes stop-word posting lists BEFORE the join:
  a term in half the corpus would contribute |corpus|·|queries|
  candidate pairs while carrying near-zero IDF signal — dropping it
  bounds each query's candidate fan-out by Σ|posting(t ≤ cap)|, the
  classic impact-ordered pruning of sparse retrieval;
- the candidate join is query-postings ⋈ corpus-postings on term with
  the query side broadcast (|queries|·|terms per doc| rows), and the
  per-(query, candidate) dot product partially aggregates map-side —
  no all-pairs stage anywhere.

Cross-engine parity: per-term weights are rounded to 6 dp and cast to
DECIMAL(18,6); dot products and squared norms are then DECIMAL sums —
order-independent, so the shuffle's nondeterministic reduce order
cannot flip a bit (the float-sum trap the array operators dodge with
fixed-order folds; sparse sums have no array to fold). The final
cosine divides the decimal-exact dot by sqrt-of-double norms computed
from identical operands on both engines, rounded to 4 dp.

Reference analog: none — SURVEY.md §2.2 extension territory beside
similarity search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

DF_CAP = 64        # max doc frequency for a shingle to stay indexed
                   # (drops crawl-boilerplate shingles at real scale;
                   # at fixture scale trigram df tops out at ~7, so the
                   # cap is exercised by the unit test, not the gate)
RETR_QUERIES = 8   # query docs: doc_id < RETR_QUERIES
RETR_TOP_K = 10
SHINGLE_W = 3      # words per shingle term


@register(
    "text_tfidf_retrieval",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), toks AS (
      SELECT doc_id,
             unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                     for i in range(1, len(ws) - 1)]) AS term
      FROM w WHERE len(ws) >= {SHINGLE_W}
    ), n AS (SELECT COUNT(*) AS n FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM toks GROUP BY doc_id, term
    ), dft AS (
      -- df derives FROM tf: tf's rows ARE the distinct (doc, term)
      -- pairs, so the shingle stream is aggregated exactly once
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), post AS (
      -- ln rounded to 6 dp BEFORE the multiply (ADVICE r11: the
      -- transcendental is the only cross-engine ulp source; the BM25
      -- twin already did this and the verify recipe mandates it)
      SELECT tf.doc_id, tf.term,
             CAST(ROUND(tf.tf * ROUND(ln((n.n + 1.0) / (dft.df + 1.0)),
                                      6), 6)
                  AS DECIMAL(18,6)) AS w
      FROM tf JOIN dft USING (term) CROSS JOIN n
      WHERE dft.df <= {DF_CAP}
    ), nrm AS (
      SELECT doc_id, sqrt(CAST(SUM(w * w) AS DOUBLE)) AS nrm
      FROM post GROUP BY doc_id
    ), pairs AS (
      SELECT q.doc_id AS query_id, c.doc_id AS candidate_id,
             CAST(SUM(q.w * c.w) AS DOUBLE) AS dot,
             CAST(COUNT(*) AS BIGINT) AS n_shared_terms
      FROM post q JOIN post c USING (term)
      WHERE q.doc_id < {RETR_QUERIES} AND q.doc_id <> c.doc_id
      GROUP BY 1, 2
    ), scored AS (
      SELECT p.query_id, p.candidate_id, p.n_shared_terms,
             p.dot / (nq.nrm * nc.nrm) AS cos
      FROM pairs p
      JOIN nrm nq ON p.query_id = nq.doc_id
      JOIN nrm nc ON p.candidate_id = nc.doc_id
    ), ranked AS (
      SELECT query_id, candidate_id, n_shared_terms, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, candidate_id) AS rn
      FROM scored
    )
    SELECT query_id, candidate_id, n_shared_terms,
           ROUND(cos, 4) AS cosine, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {RETR_TOP_K}
    """,
    tags=("text", "similarity", "retrieval", "inverted-index"),
)
def text_tfidf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{RETR_TOP_K} sparse TF-IDF cosine retrieval for each of the
    first {RETR_QUERIES} documents over word-trigram shingle terms,
    candidates discovered through the inverted-index join with
    boilerplate posting lists pruned at df ≤ {DF_CAP}. Cosine is
    taken over the PRUNED vector space (both
    dots and norms exclude capped terms — consistent, and exactly what
    a capped index can serve). See module docstring for the decimal
    order-independent dot-product device and the 100 TB fan-out
    bound."""
    docs = catalog.load(spark, sf_dir, "documents")
    n_tbl = docs.agg(F.count(F.lit(1)).alias("__n"))
    # r14: parallelize the 1-file scan's shingle explode (guide §2.5)
    docs = catalog.spread(docs)
    ws = F.split("text", " ")
    toks = (docs.select("doc_id", ws.alias("ws"))
            .filter(F.size("ws") >= SHINGLE_W)
            .select("doc_id", F.explode(F.expr(
                "transform(sequence(0, size(ws) - 3), "
                "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))
                .alias("term")))
    # ONE aggregation of the shingle stream: tf's rows ARE the
    # distinct (doc, term) pairs, so df derives from tf instead of a
    # second explode+distinct pass over the corpus (same-session 10x
    # audit: 26.0 s → 4.0 s, alpha 0.87 → 0.02; both draws shared a
    # background test-suite load, the direction not the exact ratio
    # is the claim). tf feeds dft and the postings join → persist.
    tf = (toks.groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf")).persist())
    dft = (tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint")
                                  .alias("df"))
           .filter(F.col("df") <= DF_CAP))
    # ln-first 6-dp rounding (ADVICE r11; the BM25 twin's device): the
    # transcendental is the only cross-engine ulp source — round it
    # before the tf multiply so both engines multiply identical doubles
    idf = F.round(F.log((F.col("__n") + 1) / (F.col("df") + 1)), 6)
    post = (tf.join(dft, "term")
            .crossJoin(F.broadcast(n_tbl))
            .select("doc_id", "term",
                    F.round(F.col("tf") * idf, 6)
                    .cast("decimal(18,6)").alias("w")))
    # postings feed three NON-identical consumers (norms, query side,
    # candidate side): persist + eager fill before the fan-out, the
    # repo's cold-cache-race rule (BASELINE.md round 8)
    post = post.persist()
    post.count()
    nrm = (post.groupBy("doc_id")
           .agg(F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double"))
                .alias("nrm")))
    q = (post.filter(F.col("doc_id") < RETR_QUERIES)
         .select(F.col("doc_id").alias("query_id"), "term",
                 F.col("w").alias("qw")))
    pairs = (F.broadcast(q).join(
                post.select(F.col("doc_id").alias("candidate_id"),
                            "term", F.col("w").alias("cw")), "term")
             .filter(F.col("query_id") != F.col("candidate_id"))
             .groupBy("query_id", "candidate_id")
             .agg(F.sum(F.col("qw") * F.col("cw")).cast("double")
                  .alias("dot"),
                  F.count(F.lit(1)).cast("bigint")
                  .alias("n_shared_terms")))
    nq = nrm.select(F.col("doc_id").alias("query_id"),
                    F.col("nrm").alias("qn"))
    nc = nrm.select(F.col("doc_id").alias("candidate_id"),
                    F.col("nrm").alias("cn"))
    scored = (pairs.join(F.broadcast(nq), "query_id").join(nc, "candidate_id")
              .select("query_id", "candidate_id", "n_shared_terms",
                      (F.col("dot") / (F.col("qn") * F.col("cn")))
                      .alias("cos")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("cos").desc(), "candidate_id"))
    return (scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= RETR_TOP_K)
            .select("query_id", "candidate_id", "n_shared_terms",
                    F.round("cos", 4).alias("cosine"), "rn"))


# BM25 (Robertson/Spärck Jones; the Lucene +1 idf form, always
# positive). k1/b are the universal defaults; both literals parse to
# identical doubles in both engines.
BM25_K1 = 1.2
BM25_B = 0.75


@register(
    "text_bm25_retrieval",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), toks AS (
      SELECT doc_id,
             unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                     for i in range(1, len(ws) - 1)]) AS term
      FROM w WHERE len(ws) >= {SHINGLE_W}
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM toks GROUP BY doc_id, term
    ), dl AS (
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
    ), stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ), dft AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), post AS (
      -- ln is rounded to 6 dp BEFORE the multiply (the lm_perplexity
      -- device): the transcendental is the ONLY cross-engine ulp
      -- source — every downstream mul/div runs on identical doubles.
      -- Caught live: one weight of the first cut flipped a 6-dp edge
      -- (6.442250 vs 6.442249) and broke the hash.
      SELECT tf.doc_id, tf.term,
             CAST(ROUND(
               ROUND(ln(1.0 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)),
                     6)
               * (tf.tf * ({BM25_K1} + 1.0))
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                                       + {BM25_B} * dl.dl / stats.avgdl)),
               6) AS DECIMAL(18,6)) AS w
      FROM tf
      JOIN dft USING (term)
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats
      WHERE dft.df <= {DF_CAP}
    ), qt AS (
      SELECT doc_id AS query_id, term FROM tf
      WHERE doc_id < {RETR_QUERIES}
    ), pairs AS (
      SELECT qt.query_id, p.doc_id AS candidate_id,
             CAST(SUM(p.w) AS DOUBLE) AS score,
             CAST(COUNT(*) AS BIGINT) AS n_shared_terms
      FROM qt JOIN post p USING (term)
      WHERE qt.query_id <> p.doc_id
      GROUP BY 1, 2
    ), ranked AS (
      SELECT query_id, candidate_id, n_shared_terms, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, candidate_id) AS rn
      FROM pairs
    )
    -- score is emitted at its native decimal scale, NOT re-rounded to
    -- 4 dp: the sum of scale-6 decimals can land EXACTLY on a 4-dp
    -- half (caught live: 6.442250 → Spark HALF_UP 6.4423, DuckDB
    -- binary-double 6.4422). The 6-dp-scale double round-trips
    -- identically on both engines.
    SELECT query_id, candidate_id, n_shared_terms,
           score AS bm25, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {RETR_TOP_K}
    """,
    tags=("text", "similarity", "retrieval", "bm25"),
)
def text_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{RETR_TOP_K} retrieval over the same trigram-shingle
    inverted index as text_tfidf_retrieval — the OTHER standard sparse
    ranking function (Robertson/Spärck Jones; Lucene's +1 idf form so
    weights stay positive), with document-length normalization
    (k1={BM25_K1}, b={BM25_B}). The query side contributes term
    PRESENCE (the classic short-query convention), so a candidate's
    score is the sum of its own BM25 term weights over the shared
    terms — per-term weights rounded to 6 dp into DECIMAL(18,6), sums
    order-independent, the tfidf twin's parity device.

    Scale shape is the tfidf twin's: one aggregation of the shingle
    stream (dl and df both derive from the doc-term aggregate), a
    broadcast |queries|-sized probe of the df-capped posting lists,
    map-side partial sums per (query, candidate)."""
    docs = catalog.load(spark, sf_dir, "documents")
    # r14: parallelize the 1-file scan's shingle explode (guide §2.5)
    docs = catalog.spread(docs)
    ws = F.split("text", " ")
    toks = (docs.select("doc_id", ws.alias("ws"))
            .filter(F.size("ws") >= SHINGLE_W)
            .select("doc_id", F.explode(F.expr(
                "transform(sequence(0, size(ws) - 3), "
                "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))
                .alias("term")))
    tf = (toks.groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf")).persist())
    tf.count()  # three non-identical consumers (dl, dft, post, qt)
    dl = (tf.groupBy("doc_id")
          .agg(F.sum("tf").cast("bigint").alias("dl")))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"))
    dft = (tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint")
                                  .alias("df"))
           .filter(F.col("df") <= DF_CAP))
    # ln-first 6-dp rounding (the lm_perplexity device; see oracle)
    idf = F.round(F.log(1.0 + (F.col("n") - F.col("df") + 0.5)
                        / (F.col("df") + 0.5)), 6)
    tfc = (F.col("tf") * (BM25_K1 + 1.0)) \
        / (F.col("tf") + BM25_K1 * (1.0 - BM25_B
                                    + BM25_B * F.col("dl")
                                    / F.col("avgdl")))
    post = (tf.join(dft, "term")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .select("doc_id", "term",
                    F.round(idf * tfc, 6).cast("decimal(18,6)")
                    .alias("w")))
    qt = (tf.filter(F.col("doc_id") < RETR_QUERIES)
          .select(F.col("doc_id").alias("query_id"), "term"))
    pairs = (F.broadcast(qt)
             .join(post.withColumnRenamed("doc_id", "candidate_id"),
                   "term")
             .filter(F.col("query_id") != F.col("candidate_id"))
             .groupBy("query_id", "candidate_id")
             .agg(F.sum("w").cast("double").alias("score"),
                  F.count(F.lit(1)).cast("bigint")
                  .alias("n_shared_terms")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("score").desc(), "candidate_id"))
    return (pairs.withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= RETR_TOP_K)
            .select("query_id", "candidate_id", "n_shared_terms",
                    F.col("score").alias("bm25"), "rn"))
