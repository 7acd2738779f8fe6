"""Spark ML variant implementations of the LSH/vectorize operators —
the library alternatives to the hand-built, oracle-replayable versions
in operators/dedup.py and operators/similarity.py.

Why both exist: the hand-built paths use md5-derived hash families so
the DuckDB oracle can replay them bit-for-bit; Spark ML's MinHashLSH /
BucketedRandomProjectionLSH / CountVectorizer use JVM-private seeds and
tie-orders, so they can't be SQL-oracled — but they are the batteries-
included production route with approxSimilarityJoin's optimized
implementation. Tests (tests/test_ml_variants.py) cross-check the two
routes against each other, which gates BOTH.

Not registered in the query registry (no oracle, and ML fit state
doesn't fit the stateless (spark, sf_dir) contract cleanly) — this is
library surface, exercised by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:
    from pyspark.ml.feature import (
        CountVectorizer, IDF, MinHashLSH, BucketedRandomProjectionLSH,
        RegexTokenizer,
    )
    HAS_ML = True
except ImportError:  # pragma: no cover - ML is part of stock pyspark
    HAS_ML = False


def shingle_vectors(docs: DataFrame, vocab_size: int = 1 << 18) -> DataFrame:
    """documents(text) → sparse shingle-count vectors for MinHashLSH
    (tokenize → CountVectorizer), reference T3 via the ML route."""
    toks = (RegexTokenizer(inputCol="text", outputCol="tokens",
                           pattern=r"\s+")
            .transform(docs))
    cv = CountVectorizer(inputCol="tokens", outputCol="features",
                         vocabSize=vocab_size, binary=True)
    model = cv.fit(toks)
    out = model.transform(toks)
    # MinHashLSH requires at least one non-zero entry; vector_to_array +
    # exists stays JVM-side (a row-at-a-time Python UDF here would drag
    # every vector across the Arrow boundary just for a boolean)
    from pyspark.ml.functions import vector_to_array
    return out.filter(
        F.exists(vector_to_array("features"), lambda x: x != 0.0))


def ml_minhash_pairs(docs: DataFrame, threshold: float = 0.4,
                     num_tables: int = 8, seed: int = 42) -> DataFrame:
    """Near-dup candidate pairs via Spark ML MinHashLSH
    approxSimilarityJoin (distance = 1 - Jaccard ≤ threshold)."""
    feats = shingle_vectors(docs)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=num_tables, seed=seed)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, threshold,
                                       distCol="jaccard_dist")
    return (pairs
            .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
            .select(F.col("datasetA.doc_id").alias("doc_a"),
                    F.col("datasetB.doc_id").alias("doc_b"),
                    (1 - F.col("jaccard_dist")).alias("jaccard")))


def ml_ann_neighbors(emb: DataFrame, key_vec_id: int, k: int = 5,
                     bucket_length: float = 2.0, seed: int = 42) -> DataFrame:
    """Approx nearest neighbors (Euclidean) via
    BucketedRandomProjectionLSH.approxNearestNeighbors."""
    from pyspark.ml.functions import array_to_vector
    feats = emb.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>"))
        .alias("features"))
    lsh = BucketedRandomProjectionLSH(inputCol="features", outputCol="hashes",
                                      bucketLength=bucket_length,
                                      numHashTables=4, seed=seed)
    model = lsh.fit(feats)
    key = feats.filter(F.col("vec_id") == key_vec_id).first()["features"]
    return (model.approxNearestNeighbors(feats, key, k + 1)
            .filter(F.col("vec_id") != key_vec_id)
            .select("vec_id", "distCol"))


def tfidf_vectors(docs: DataFrame, vocab_size: int = 4096) -> DataFrame:
    """CountVectorizer + IDF pipeline (the ML twin of the relational
    text_tfidf query)."""
    toks = (RegexTokenizer(inputCol="text", outputCol="tokens",
                           pattern=r"\s+").transform(docs))
    cv_model = CountVectorizer(inputCol="tokens", outputCol="tf",
                               vocabSize=vocab_size).fit(toks)
    tf = cv_model.transform(toks)
    idf_model = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    return idf_model.transform(tf).select("doc_id", "tfidf")
