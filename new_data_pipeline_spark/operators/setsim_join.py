"""Set-similarity join: all document pairs whose word-3-gram shingle
sets have Jaccard ≥ τ — as TWO registered physical strategies over the
same semantics, because the optimal distributed plan depends on the
corpus' shingle-frequency skew:

- ``join_set_similarity`` — overlap counting: explode shingles,
  equi-join on the shingle, partially-aggregated per-pair match counts,
  then one size join computes Jaccard. Optimal when shingle buckets
  are benign (this corpus): the join output collapses map-side and no
  record payloads ever move. Hot shingles make a bucket quadratic —
  the regime the prefix variant (and MinHash, dedup.py) exists for.
- ``join_set_similarity_prefix`` — LOSSLESS prefix filtering (PPJoin
  family: Chaudhuri et al. SSJoin 2006, Xiao et al. 2008; distributed
  formulation per Vernica et al. 2010): order shingles rarest-first by
  (corpus frequency, shingle); a doc with n shingles exposes only its
  first L = n − ⌈τ·n⌉ + 1 to candidate generation, so hot shingles
  never generate candidates. PPJoin's POSITIONAL filter then prunes
  candidates whose first shared prefix position already caps the
  overlap below the Jaccard requirement, and exact verification runs
  only on survivors. For any pair with Jaccard ≥ τ,
  |A∩B| ≥ ⌈τ·max(|A|,|B|)⌉, which a prefix that long cannot dodge —
  so blocking provably loses nothing, and the oracle (the UNBLOCKED
  join) hash-matches.

Both variants (and the oracle) operate on md5-derived 60-bit shingle
hashes rather than shingle strings: the payload that crosses every
shuffle shrinks ~3× and the join keys become fixed-width longs. A hash
collision would merge two shingles — but identically on every engine
(the md5 device from similarity.py), so the gate stays bit-exact by
construction, not by collision-improbability.

Integer-exact thresholds: τ = 2/5, prefix length uses
⌈2n/5⌉ = (2n+4) DIV 5, positional filter uses the required overlap
⌈τ/(1+τ)·(na+nb)⌉ = ⌈2(na+nb)/7⌉ = (2(na+nb)+6) DIV 7 — no float
boundary can disagree across engines.

Reference analog: none — SURVEY.md §2.2 joins/dedup extension, the
exact counterpart to operators/dedup.py's MinHash (probabilistic
recall) and operators/fuzzy_join.py's q-gram blocking (edit distance).
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

_HASH = ("CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)")


def shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, hs): distinct md5-derived 60-bit hashes of the doc's
    word-3-gram shingles."""
    return (docs.select("doc_id", F.split("text", " ").alias("t"))
            .filter(F.size("t") >= SHINGLE_W)
            .select("doc_id", F.expr(
                "array_distinct(transform("
                "  transform(sequence(1, size(t) - 2),"
                "    i -> concat_ws(' ', element_at(t, i),"
                "         element_at(t, i + 1), element_at(t, i + 2))),"
                f" s -> {_HASH}))")
                .alias("hs")))


_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= {SHINGLE_W}
    ), g AS (
      SELECT doc_id,
             list_distinct([CAST(('0x' || substr(md5(
                 t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]), 1, 15))
                 AS BIGINT)
               for i in range(1, len(t) - 1)]) AS hs
      FROM base
    ), tok AS (
      SELECT doc_id, unnest(hs) AS h FROM g
    ), sz AS (
      SELECT doc_id, len(hs) AS n FROM g
    ), c AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM tok a JOIN tok b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(CAST(c.c AS DOUBLE) / (sa.n + sb.n - c.c), 6) AS jaccard
    FROM c
    JOIN sz sa ON c.doc_a = sa.doc_id
    JOIN sz sb ON c.doc_b = sb.doc_id
    WHERE CAST(c.c AS DOUBLE) / (sa.n + sb.n - c.c) >= {TAU}
    """


@register(
    "join_set_similarity",
    oracle=_ORACLE,
    tags=("join", "similarity", "dedup"),
)
def join_set_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap-counting strategy: shingle equi-join with map-side
    partial per-pair counts; nothing but (pair, count) rows cross the
    shuffle — no record payloads."""
    # r14: spread the 1-file scan before the md5-per-trigram shingle
    # build (guide §2.5; the hashing-heavy rule from the tokenizer A/B)
    docs = catalog.spread(catalog.load(spark, sf_dir, "documents"))
    sh = shingle_sets(docs).persist()
    # eager cache fill: the consumers below are NON-IDENTICAL
    # projections, so a cold cache gets raced by independent stages,
    # each paying the shingle build (the incremental-LSH lesson,
    # BASELINE.md round 8; measured ~2x at sf0.1 here)
    sh.count()
    tok = sh.select("doc_id", F.explode("hs").alias("h"))
    sz = sh.select("doc_id", F.size("hs").alias("n"))
    a = tok.select(F.col("doc_id").alias("doc_a"), "h")
    b = tok.select(F.col("doc_id").alias("doc_b"), F.col("h").alias("hb"))
    c = (a.join(b, (F.col("h") == F.col("hb"))
                & (F.col("doc_a") < F.col("doc_b")))
         .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("c")))
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    return (c.join(sa, "doc_a").join(sb, "doc_b")
            .filter(jac >= F.lit(TAU))
            .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard")))


def prefix_candidates(sh: DataFrame) -> DataFrame:
    """(doc_a, doc_b) candidate pairs from the rare-first prefix
    equi-join, pruned by PPJoin's positional filter; provably a
    superset of all pairs with Jaccard ≥ TAU.

    Positional filter: pa/pb are the rarest-first ranks of the FIRST
    shingle the two prefixes share (the same shingle attains both
    minima — shared shingles appear in the same relative order under
    one global order). No earlier shingle is shared, so
    overlap ≤ 1 + min(na − pa, nb − pb); prune when that bound misses
    the required overlap ⌈2(na+nb)/7⌉.

    Length filter (round 10, the quiet re-audit of VERDICT r9 #2
    measured alpha 0.50 without it): Jaccard ≥ τ forces
    min(na, nb) ≥ ⌈τ·max(na, nb)⌉ (overlap ≤ min, and
    overlap ≥ τ/(1+τ)·(na+nb)), so size-incompatible pairs are pruned
    INSIDE the prefix equi-join before they reach the pair aggregate —
    LOSSLESS, integer-exact (TAU_DEN·min ≥ TAU_NUM·max), and on a
    densifying corpus it is the filter that keeps candidate growth
    tied to genuinely similar mass rather than to bucket co-occupancy.
    """
    freq = (sh.select(F.explode("hs").alias("h"))
            .groupBy("h").agg(F.count(F.lit(1)).alias("f")))
    exploded = (sh.select("doc_id", F.size("hs").alias("n"),
                          F.explode("hs").alias("h"))
                .join(freq, "h"))
    # prefix length L = n - ceil(tau*n) + 1; ceil(2n/5) = (2n+4) DIV 5
    w = Window.partitionBy("doc_id").orderBy("f", "h")
    prefix = (exploded.withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= F.col("n")
                      - F.expr(f"({TAU_NUM} * n + {TAU_DEN - 1})"
                               f" DIV {TAU_DEN}") + 1)
              .select("doc_id", "n", "h", "rk"))
    a = prefix.select(F.col("doc_id").alias("doc_a"),
                      F.col("n").alias("na"),
                      F.col("rk").alias("pa"), "h")
    b = prefix.select(F.col("doc_id").alias("doc_b"),
                      F.col("n").alias("nb"),
                      F.col("rk").alias("pb"),
                      F.col("h").alias("hb"))
    return (a.join(b, (F.col("h") == F.col("hb"))
                   & (F.col("doc_a") < F.col("doc_b"))
                   & (F.lit(TAU_DEN) * F.least("na", "nb")
                      >= F.lit(TAU_NUM) * F.greatest("na", "nb")))
            .groupBy("doc_a", "doc_b")
            .agg(F.min("pa").alias("pa"), F.min("pb").alias("pb"),
                 F.first("na").alias("na"), F.first("nb").alias("nb"))
            .filter(F.lit(1) + F.least(F.col("na") - F.col("pa"),
                                       F.col("nb") - F.col("pb"))
                    >= F.expr("(2 * (na + nb) + 6) DIV 7"))
            .select("doc_a", "doc_b"))


@register(
    "join_set_similarity_prefix",
    oracle=_ORACLE,
    tags=("join", "similarity", "prefix-filter", "dedup"),
)
def join_set_similarity_prefix(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Prefix-filter strategy (the hot-shingle-skew scale path):
    rare-first prefixes generate candidates, the positional filter
    prunes them, exact intersection verifies survivors; identical
    results to the counting strategy, proven by the shared UNBLOCKED
    oracle."""
    # r14: spread the 1-file scan before the md5-per-trigram shingle
    # build (guide §2.5; the hashing-heavy rule from the tokenizer A/B)
    docs = catalog.spread(catalog.load(spark, sf_dir, "documents"))
    # persist: the shingle subtree feeds frequency counts, prefix
    # explosion, AND both verification sides (the minhash-persist
    # rationale, dedup.py:196)
    sh = shingle_sets(docs).persist()
    # eager cache fill: the consumers below are NON-IDENTICAL
    # projections, so a cold cache gets raced by independent stages,
    # each paying the shingle build (the incremental-LSH lesson,
    # BASELINE.md round 8; measured ~2x at sf0.1 here)
    sh.count()
    cand = prefix_candidates(sh)
    ga = sh.select(F.col("doc_id").alias("doc_a"),
                   F.col("hs").alias("hs_a"),
                   F.size("hs").alias("na"))
    gb = sh.select(F.col("doc_id").alias("doc_b"),
                   F.col("hs").alias("hs_b"),
                   F.size("hs").alias("nb"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    jac = inter.cast("double") / (F.col("na") + F.col("nb") - inter)
    return (cand.join(ga, "doc_a").join(gb, "doc_b")
            .filter(jac >= F.lit(TAU))
            .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard")))


# containment threshold 4/5, kept rational for integer-exact filtering
CONT_NUM, CONT_DEN = 4, 5

_CONT_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= {SHINGLE_W}
    ), g AS (
      SELECT doc_id,
             list_distinct([CAST(('0x' || substr(md5(
                 t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]), 1, 15))
                 AS BIGINT)
               for i in range(1, len(t) - 1)]) AS hs
      FROM base
    ), tok AS (
      SELECT doc_id, unnest(hs) AS h FROM g
    ), sz AS (
      SELECT doc_id, len(hs) AS n FROM g
    ), c AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM tok a JOIN tok b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(CAST(c.c AS DOUBLE) / LEAST(sa.n, sb.n), 6)
             AS containment
    FROM c
    JOIN sz sa ON c.doc_a = sa.doc_id
    JOIN sz sb ON c.doc_b = sb.doc_id
    WHERE {CONT_DEN} * c.c >= {CONT_NUM} * LEAST(sa.n, sb.n)
    """


@register(
    "join_set_containment",
    oracle=_CONT_ORACLE,
    tags=("join", "similarity", "containment", "dedup"),
)
def join_set_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment join: pairs where the SMALLER shingle set is ≥ 80%
    covered by the other — max(c/na, c/nb) = c/min(na, nb) ≥ 4/5.

    Why it exists beside Jaccard: containment catches TRUNCATED or
    EXTENDED near-duplicates (a snippet inside a long page, a doc with
    boilerplate appended) that Jaccard structurally misses — with
    nb ≫ na and c = na the Jaccard c/(na+nb−c) ≈ na/nb is tiny while
    containment is exactly 1. This is the contamination-check
    semantics (is this eval set INSIDE the training corpus?), the
    asymmetric half of the dedup family.

    Plan: the overlap-counting shape of ``join_set_similarity`` — the
    shingle equi-join moves only (pair) rows with map-side partial
    counts, sizes attach afterwards, and the threshold is the
    integer-exact CONT_DEN·c ≥ CONT_NUM·min(na, nb). Hot-shingle skew
    falls to the same MinHash/prefix alternatives as Jaccard; at this
    threshold no length filter applies (containment is intentionally
    size-asymmetric)."""
    # r14: spread the 1-file scan before the md5-per-trigram shingle
    # build (guide §2.5; the hashing-heavy rule from the tokenizer A/B)
    docs = catalog.spread(catalog.load(spark, sf_dir, "documents"))
    sh = shingle_sets(docs).persist()
    sh.count()  # eager fill: tok + both size projections (3 consumers)
    tok = sh.select("doc_id", F.explode("hs").alias("h"))
    sz = sh.select("doc_id", F.size("hs").alias("n"))
    a = tok.select(F.col("doc_id").alias("doc_a"), "h")
    b = tok.select(F.col("doc_id").alias("doc_b"), F.col("h").alias("hb"))
    c = (a.join(b, (F.col("h") == F.col("hb"))
                & (F.col("doc_a") < F.col("doc_b")))
         .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("c")))
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    cont = F.col("c").cast("double") / F.least("na", "nb")
    return (c.join(sa, "doc_a").join(sb, "doc_b")
            .filter(F.lit(CONT_DEN) * F.col("c")
                    >= F.lit(CONT_NUM) * F.least("na", "nb"))
            .select("doc_a", "doc_b",
                    F.round(cont, 6).alias("containment")))
