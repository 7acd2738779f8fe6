"""Fuzzy string matching: edit-distance join with lossless q-gram
blocking.

The entity-resolution workhorse (catalog reconciliation, near-identical
product/author/file names) the reference's exact-key model cannot
express (its only string handling is path parsing,
reference serialize.py:200-214).

Scale design — never the O(n²) cross join:
1. Dedup to DISTINCT strings first (the fuzzy-join granularity; carry
   multiplicities to re-expand afterwards).
2. Candidate generation is an equi-join on POSITIONAL q-grams
   (gram, occurrence#): two strings match once per shared multiset
   occurrence, so the join-match count IS the multiset q-gram
   intersection.
3. The classic count filter makes blocking LOSSLESS, not heuristic:
   edit distance ≤ d  ⇒  |Gq(a) ∩ Gq(b)| ≥ max(|a|,|b|) − (q−1) − d·q
   (each edit destroys at most q grams — Gravano et al., VLDB 2001).
   Candidates failing the bound are provably non-matches; strings too
   short for the bound to bite (len < 1 + (q−1) + d·q) fall back to a
   length-banded block so no pair is ever silently lost.
4. Exact levenshtein only on surviving candidates.

The oracle deliberately runs the UNBLOCKED full pairwise join — a gate
mismatch would prove the blocking dropped a true pair, so losslessness
itself is driver-verified. At 100 TB: distinct strings shrink the input
by orders of magnitude, the gram join shuffles (gram, occ) keys, and
hot (stop-)grams get prefix filtering — rarest-gram-first — which the
unit tests exercise via adversarial repeated-gram corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

Q = 2          # gram width
FUZZY_D = 2    # max edit distance
# below this length the count bound is vacuous → length-banded fallback
MIN_BOUNDED_LEN = 1 + (Q - 1) + FUZZY_D * Q


def positional_qgrams(names: DataFrame, name_col: str = "name") -> DataFrame:
    """(name, gram, occ) rows: the k-th occurrence of each q-gram is its
    own join key, so an equi-join on (gram, occ) matches a pair exactly
    min(count_a, count_b) times — the MULTISET intersection the count
    bound is stated over (distinct-gram joins undercount on inputs like
    'aaaa' and would break losslessness)."""
    grams = names.select(
        name_col,
        F.posexplode(F.expr(
            f"transform(sequence(1, length({name_col}) - {Q - 1}), "
            f"i -> substring({name_col}, i, {Q}))")).alias("pos", "gram"))
    occ = Window.partitionBy(name_col, "gram").orderBy("pos")
    return grams.withColumn("occ", F.row_number().over(occ)).drop("pos")


def fuzzy_pairs(names: DataFrame, name_col: str = "name",
                d: int = FUZZY_D) -> DataFrame:
    """All unordered pairs of ``names`` rows with edit distance ≤ d,
    via lossless q-gram blocking. Input must be distinct on
    ``name_col``; output columns: name_a, name_b, dist."""
    n = names.select(F.col(name_col).alias("name"),
                     F.length(name_col).alias("len"))
    bounded = n.filter(F.col("len") >= MIN_BOUNDED_LEN)

    g = positional_qgrams(bounded)
    a = g.select(F.col("name").alias("name_a"), "gram", "occ")
    b = g.select(F.col("name").alias("name_b"), "gram", "occ")
    shared = (a.join(b, ["gram", "occ"])
              .filter(F.col("name_a") < F.col("name_b"))
              .groupBy("name_a", "name_b")
              .agg(F.count(F.lit(1)).alias("n_shared")))
    la, lb = F.length("name_a"), F.length("name_b")
    bound = F.greatest(la, lb) - (Q - 1) - d * Q
    cand_long = (shared
                 .filter(F.abs(la - lb) <= d)
                 .filter(F.col("n_shared") >= bound)
                 .select("name_a", "name_b"))

    # short strings: the bound is vacuous, so block by length band only
    # (tiny by construction in name-like corpora; still no lost pairs)
    short = n.filter(F.col("len") < MIN_BOUNDED_LEN)
    sa = short.select(F.col("name").alias("name_a"),
                      F.col("len").alias("la"))
    nb = n.select(F.col("name").alias("name_b"), F.col("len").alias("lb"))
    cand_short = (sa.join(nb, F.abs(F.col("la") - F.col("lb")) <= d)
                  .filter(F.col("name_a") != F.col("name_b"))
                  .select(F.least("name_a", "name_b").alias("name_a"),
                          F.greatest("name_a", "name_b").alias("name_b")))

    cand = cand_long.union(cand_short).distinct()
    return (cand
            .withColumn("dist", F.levenshtein("name_a", "name_b")
                        .cast("bigint"))
            .filter(F.col("dist") <= d))


@register(
    "join_fuzzy_qgram",
    oracle=f"""
    WITH names AS (
      SELECT p_name AS name, COUNT(*) AS n_parts FROM part GROUP BY p_name
    )
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b ON a.name < b.name
    WHERE levenshtein(a.name, b.name) <= {FUZZY_D}
    """,
    tags=("join", "fuzzy", "qgram"),
)
def join_fuzzy_qgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names (edit distance ≤ 2) with the part
    multiplicity each name carries — the Spark side blocks on
    positional q-grams, the oracle runs the full unblocked pairwise
    join, so a hash match PROVES the blocking lost no pair.
    """
    parts = catalog.load(spark, sf_dir, "part")
    names = parts.groupBy(F.col("p_name").alias("name")).agg(
        F.count(F.lit(1)).alias("n_parts"))
    pairs = fuzzy_pairs(names, "name")
    na = names.select(F.col("name").alias("name_a"),
                      F.col("n_parts").alias("n_parts_a"))
    nb = names.select(F.col("name").alias("name_b"),
                      F.col("n_parts").alias("n_parts_b"))
    return (pairs.join(F.broadcast(na), ["name_a"])
            .join(F.broadcast(nb), ["name_b"])
            .select("name_a", "name_b", "dist", "n_parts_a", "n_parts_b"))


@register(
    "entity_resolution_parts",
    oracle=f"""
    WITH RECURSIVE names AS (
      SELECT p_name AS name, COUNT(*) AS n_parts FROM part GROUP BY 1
    ), fpairs AS (
      SELECT a.name AS u, b.name AS v
      FROM names a JOIN names b ON a.name < b.name
      WHERE levenshtein(a.name, b.name) <= {FUZZY_D}
    ), edges AS (
      SELECT u, v FROM fpairs UNION SELECT v, u FROM fpairs
    ), reach(a, b) AS (
      SELECT u, u FROM edges
      UNION
      SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
    ), labeled AS (
      SELECT a AS name, MIN(b) AS canonical FROM reach GROUP BY a
    )
    SELECT COALESCE(l.canonical, n.name) AS canonical,
           COUNT(*) AS n_names,
           CAST(SUM(n.n_parts) AS BIGINT) AS n_parts
    FROM names n LEFT JOIN labeled l USING (name)
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("join", "fuzzy", "entity-resolution", "graph"),
)
def entity_resolution_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: fuzzy candidate pairs (lossless
    q-gram blocking) → connected components over the match graph →
    one canonical entity per component (min name), with every isolated
    name its own entity. The composition matters: pairwise matching
    alone under-merges ('cold bolt'~'old bolt' and 'old bolt'~'old
    belt' must land in ONE entity even if 'cold bolt'~'old belt'
    misses the distance bar).

    Oracle replays blocking-free matching + a recursive CTE for the
    transitive closure — hash match verifies blocking losslessness AND
    the iterative component labeling in one gate. Min-label on strings
    is lexicographic in both engines.
    """
    from new_data_pipeline_spark.operators.dedup import connected_components

    parts = catalog.load(spark, sf_dir, "part")
    names = parts.groupBy(F.col("p_name").alias("name")).agg(
        F.count(F.lit(1)).alias("n_parts"))
    pairs = fuzzy_pairs(names, "name")
    labels = connected_components(pairs, "name_a", "name_b")
    return (names.join(labels, names["name"] == labels["id"], "left")
            .groupBy(F.coalesce("label", "name").alias("canonical"))
            .agg(F.count(F.lit(1)).alias("n_names"),
                 F.sum("n_parts").cast("bigint").alias("n_parts"))
            .orderBy("canonical"))
