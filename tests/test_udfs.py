"""UDF-surface tests: every pandas UDF pinned against its built-in
(JVM) equivalent, proving the Arrow path computes the same thing the
codegen path does."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.functions import udfs
from tests.conftest import SF_DIR


def test_scalar_pandas_udf_matches_builtin(spark):
    emb = catalog.load(spark, SF_DIR, "embeddings") \
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    got = emb.select("vec_id", udfs.vector_l2_norm("v").alias("n")).collect()
    want = emb.select(
        "vec_id",
        F.sqrt(F.expr("aggregate(v, 0D, (a, x) -> a + x * x)")).alias("n")
    ).collect()
    g = {r["vec_id"]: r["n"] for r in got}
    for r in want:
        assert g[r["vec_id"]] == pytest.approx(r["n"], rel=1e-12)


def test_grouped_agg_pandas_udf(spark):
    li = catalog.load(spark, SF_DIR, "lineitem")
    got = {r["l_returnflag"]: r["wm"] for r in
           li.groupBy("l_returnflag")
             .agg(udfs.weighted_mean("l_extendedprice", "l_quantity")
                  .alias("wm")).collect()}
    want = {r["l_returnflag"]: r["wm"] for r in
            li.groupBy("l_returnflag")
              .agg((F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                    / F.sum("l_quantity")).alias("wm")).collect()}
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-9)


def test_grouped_map_zscore(spark):
    cust = catalog.load(spark, SF_DIR, "customer") \
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    z = udfs.zscore_per_group(cust, "c_mktsegment", "c_acctbal")
    stats = (z.groupBy("c_mktsegment")
             .agg(F.avg("zscore").alias("m"),
                  F.stddev_pop("zscore").alias("s")).collect())
    for r in stats:  # standardized: mean≈0, std≈1 per group
        assert r["m"] == pytest.approx(0.0, abs=1e-9)
        assert r["s"] == pytest.approx(1.0, abs=1e-9)


def test_map_in_pandas_featurize(spark):
    docs = catalog.load(spark, SF_DIR, "documents").limit(100)
    feats = udfs.batch_featurize(docs)
    joined = feats.join(docs, "doc_id")
    bad = joined.filter(
        (F.col("n_chars_py") != F.length("text"))
        | (F.col("n_words_py") != F.size(F.split("text", " ")))).count()
    assert bad == 0
