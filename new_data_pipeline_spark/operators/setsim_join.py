"""Set-similarity join with LOSSLESS prefix filtering (PPJoin family,
Xiao et al. 2008 / Chaudhuri et al. SSJoin): all document pairs whose
word-3-gram shingle sets have Jaccard ≥ τ, found WITHOUT comparing all
pairs and WITHOUT the possibility of a lost pair.

The prefix-filter principle: order every shingle by a global total
order (rarest first — (corpus frequency, shingle) ascending). A doc
with n distinct shingles keeps only its first
L = n − ⌈τ·n⌉ + 1 shingles as its *prefix*. For any pair with
Jaccard ≥ τ, |A∩B| ≥ τ·max(|A|,|B|), and a set's prefix is too long
for the intersection to avoid it — so the prefixes of a qualifying
pair must share a shingle. Candidate generation is therefore an
equi-join on PREFIX shingles only, and exact verification runs only on
candidates. Unlike MinHash LSH (probabilistic recall) or the
prefix-of-text blocking in dedup_ngram_jaccard (heuristic recall),
this blocking provably loses nothing — which is why the oracle can be
the UNBLOCKED join and still hash-match.

Execution shape at 100 TB:
- the frequency table is a shingle-count aggregate; ordering is the
  VALUE (freq, shingle) itself — no global rank, no unpartitioned
  window (each doc sorts only its own shingles in a window partitioned
  by doc_id);
- rare-first prefixes mean hot shingles (the skew killers of naive
  token joins) are exactly the ones the filter drops from candidate
  generation;
- ⌈τ·n⌉ with τ=2/5 is computed as (2n+4) DIV 5 — integer-exact, no
  float boundary to disagree across engines.

Reference analog: none — SURVEY.md §2.2 joins/dedup extension, the
exact-counterpart to operators/dedup.py's MinHash (probabilistic) and
operators/fuzzy_join.py's q-gram blocking (edit distance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

# τ = 2/5 kept as an exact rational so prefix lengths use integer math
TAU_NUM, TAU_DEN = 2, 5
TAU = TAU_NUM / TAU_DEN
SHINGLE_W = 3


def shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, grams): distinct word-3-gram shingle set per doc."""
    return (docs.select("doc_id", F.split("text", " ").alias("t"))
            .filter(F.size("t") >= SHINGLE_W)
            .select("doc_id", F.expr(
                "array_distinct(transform(sequence(1, size(t) - 2),"
                " i -> concat_ws(' ', element_at(t, i),"
                " element_at(t, i + 1), element_at(t, i + 2))))")
                .alias("grams")))


def prefix_candidates(sh: DataFrame) -> DataFrame:
    """Distinct (doc_a, doc_b) candidate pairs from the rare-first
    prefix equi-join; provably a superset of all pairs with
    Jaccard ≥ TAU."""
    freq = (sh.select(F.explode("grams").alias("g"))
            .groupBy("g").agg(F.count(F.lit(1)).alias("f")))
    exploded = (sh.select("doc_id", F.size("grams").alias("n"),
                          F.explode("grams").alias("g"))
                .join(freq, "g"))
    # prefix length L = n - ceil(tau*n) + 1; ceil(2n/5) = (2n+4) DIV 5
    w = Window.partitionBy("doc_id").orderBy("f", "g")
    prefix = (exploded.withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= F.col("n")
                      - F.expr(f"({TAU_NUM} * n + {TAU_DEN - 1})"
                               f" DIV {TAU_DEN}") + 1)
              .select("doc_id", "g"))
    a = prefix.select(F.col("doc_id").alias("doc_a"), "g")
    b = prefix.select(F.col("doc_id").alias("doc_b"),
                      F.col("g").alias("gb"))
    return (a.join(b, (F.col("g") == F.col("gb"))
                   & (F.col("doc_a") < F.col("doc_b")))
            .select("doc_a", "doc_b").distinct())


@register(
    "join_set_similarity",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= {SHINGLE_W}
    ), g AS (
      SELECT doc_id,
             list_distinct([t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
                            for i in range(1, len(t) - 1)]) AS grams
      FROM base
    ), tok AS (
      SELECT doc_id, unnest(grams) AS w FROM g
    ), sz AS (
      SELECT doc_id, len(grams) AS n FROM g
    ), c AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(CAST(c.c AS DOUBLE) / (sa.n + sb.n - c.c), 6) AS jaccard
    FROM c
    JOIN sz sa ON c.doc_a = sa.doc_id
    JOIN sz sb ON c.doc_b = sb.doc_id
    WHERE CAST(c.c AS DOUBLE) / (sa.n + sb.n - c.c) >= {TAU}
    """,
    tags=("join", "similarity", "prefix-filter", "dedup"),
)
def join_set_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All doc pairs with shingle-set Jaccard ≥ 0.4, via lossless
    prefix-filtered candidate generation + exact verification; the
    oracle runs the UNBLOCKED join, so a hash match proves zero lost
    pairs."""
    docs = catalog.load(spark, sf_dir, "documents")
    # persist: the shingle subtree feeds frequency counts, prefix
    # explosion, AND both verification sides (the minhash-persist
    # rationale, dedup.py:196)
    sh = shingle_sets(docs).persist()
    cand = prefix_candidates(sh)
    ga = sh.select(F.col("doc_id").alias("doc_a"),
                   F.col("grams").alias("grams_a"),
                   F.size("grams").alias("na"))
    gb = sh.select(F.col("doc_id").alias("doc_b"),
                   F.col("grams").alias("grams_b"),
                   F.size("grams").alias("nb"))
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    jac = inter.cast("double") / (F.col("na") + F.col("nb") - inter)
    return (cand.join(ga, "doc_a").join(gb, "doc_b")
            .filter(jac >= F.lit(TAU))
            .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard")))
