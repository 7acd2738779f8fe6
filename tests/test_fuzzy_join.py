"""Losslessness gates for the q-gram-blocked fuzzy join: the blocked
pipeline must find EXACTLY the pairs the brute-force cross join finds,
including the adversarial corners the count bound is famous for
(repeated grams, strings too short for the bound to bite)."""

from __future__ import annotations

from pyspark.sql import functions as F

from new_data_pipeline_spark.operators import fuzzy_join


ADVERSARIAL = [
    "aaaa", "aaab", "aaaaaa",          # repeated grams: multiset counts matter
    "ab", "cd", "x",                   # too short for the bound → fallback
    "small ring", "small king",        # realistic near-pair
    "blue bolt", "glue bolt", "blue boat",
    "entirely different string",
    "entirely different strung",
]


def _brute(spark, names):
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    a = df.select(F.col("name").alias("name_a"))
    b = df.select(F.col("name").alias("name_b"))
    return {(r["name_a"], r["name_b"], r["dist"]) for r in
            (a.crossJoin(b)
             .filter(F.col("name_a") < F.col("name_b"))
             .withColumn("dist", F.levenshtein("name_a", "name_b")
                         .cast("bigint"))
             .filter(F.col("dist") <= fuzzy_join.FUZZY_D)
             .collect())}


def test_blocked_equals_bruteforce_adversarial(spark):
    df = spark.createDataFrame([(n,) for n in ADVERSARIAL], ["name"])
    blocked = {(r["name_a"], r["name_b"], r["dist"]) for r in
               fuzzy_join.fuzzy_pairs(df, "name").collect()}
    brute = _brute(spark, ADVERSARIAL)
    assert blocked == brute, (
        f"missed: {brute - blocked}, extra: {blocked - brute}")
    # the corpus is built so both code paths fire
    assert ("aaaa", "aaab", 1) in brute          # multiset-gram path
    assert ("ab", "cd", 2) in brute              # short-string fallback


def test_positional_qgrams_multiset_semantics(spark):
    g = fuzzy_join.positional_qgrams(
        spark.createDataFrame([("aaaa",)], ["name"]), "name").collect()
    assert sorted((r["gram"], r["occ"]) for r in g) == \
        [("aa", 1), ("aa", 2), ("aa", 3)]
