"""Oracle-checked queries for the ingest surface: the reference's
keying / batching / alignment / flatten semantics re-expressed over the
testdata tables so DuckDB can gate them (SURVEY.md §7 Milestone 2).

File-based ingest itself (binaryFile scans, CSV/JSON fixtures, the
multi-stream sink) is exercised by tests/test_ingest.py on generated
fixtures — DuckDB has no binaryFile analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register
from new_data_pipeline_spark.sources.tensorize import (
    assign_batches, assign_keys, flatten_features, pop_label,
)


@register(
    "ingest_key_assignment",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS key
    FROM documents
    """,
    tags=("ingest", "keying"),
)
def ingest_key_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1: contiguous 1-based keys in a declared stable order.

    Runs the scalable range-partition + offset keying (tensorize
    .assign_keys), which must equal the single-partition ROW_NUMBER the
    oracle computes — same semantics, parallel plan
    (reference serialize.py:30-32; intent per SURVEY §1.4, numeric not
    lexicographic order).
    """
    docs = catalog.load(spark, sf_dir, "documents").select("doc_id")
    return assign_keys(docs, order_col="doc_id").select("doc_id", "key")


@register(
    "ingest_batch_assignment",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ROW_NUMBER() OVER (ORDER BY doc_id) AS key,
             COUNT(*) OVER () AS n
      FROM documents
    )
    SELECT CAST((key - 1) // 32 AS BIGINT) AS batch,
           COUNT(*) AS batch_rows,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM keyed
    WHERE (key - 1) // 32 < n // 32
    GROUP BY 1
    """,
    tags=("ingest", "batching"),
)
def ingest_batch_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3: batch = floor((key-1)/batch_size), remainder batch dropped
    (n_batches = n // batch_size, reference serialize.py:670), then a
    per-batch aggregate standing in for the batch scan."""
    docs = catalog.load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    keyed = assign_keys(docs, order_col="doc_id")
    batched = assign_batches(keyed, batch_size=32)
    return (batched.groupBy("batch")
            .agg(F.count(F.lit(1)).alias("batch_rows"),
                 F.sum("n_chars").cast("bigint").alias("total_chars")))


@register(
    "ingest_mimo_zip",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, ROW_NUMBER() OVER (ORDER BY doc_id) AS rn
      FROM documents
    ), e AS (
      SELECT vec_id, label, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
      FROM embeddings
    )
    SELECT CAST(d.rn AS BIGINT) AS key, d.doc_id, d.lang, e.vec_id, e.label
    FROM d JOIN e ON d.rn = e.rn
    """,
    tags=("ingest", "mimo"),
)
def ingest_mimo_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/R3 stream alignment: the i-th record of stream A pairs with
    the i-th of stream B — the reference's sorted-zip / key-aligned MIMO
    batch (serialize.py:90-91, 731-795) as a rank equi-join."""
    docs = catalog.load(spark, sf_dir, "documents").select("doc_id", "lang")
    embs = catalog.load(spark, sf_dir, "embeddings").select("vec_id", "label")
    dk = assign_keys(docs, order_col="doc_id")
    ek = assign_keys(embs, order_col="vec_id")
    return (dk.join(ek, "key")
            .select("key", "doc_id", "lang", "vec_id", "label"))


@register(
    "ingest_binding_join",
    oracle="""
    WITH binding AS (
      SELECT o_orderkey, 'ord_' || CAST(o_orderkey AS VARCHAR) AS stem
      FROM orders
    ), assets AS (
      SELECT 'ord_' || CAST(l_orderkey AS VARCHAR) AS stem, COUNT(*) AS n_files
      FROM lineitem GROUP BY 1
    )
    SELECT b.o_orderkey, b.stem, COALESCE(a.n_files, 0) AS n_files
    FROM binding b LEFT JOIN assets a ON b.stem = a.stem
    """,
    tags=("ingest", "binding"),
)
def ingest_binding_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 binding-driven scan shape: a binding table derives the asset
    path stem per record and left-joins the asset listing (missing
    assets → 0, not a crash — fixing the reference's per-row open,
    serialize.py:28-40)."""
    orders = catalog.load(spark, sf_dir, "orders")
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    binding = orders.select(
        "o_orderkey",
        F.concat(F.lit("ord_"), F.col("o_orderkey").cast("string")).alias("stem"))
    assets = (lineitem
              .select(F.concat(F.lit("ord_"), F.col("l_orderkey").cast("string"))
                      .alias("stem"))
              .groupBy("stem").agg(F.count(F.lit(1)).alias("n_files")))
    return (binding.join(assets, "stem", "left")
            .select("o_orderkey", "stem",
                    F.coalesce("n_files", F.lit(0)).alias("n_files")))


@register(
    "ingest_flatten_cast",
    oracle="""
    SELECT c_custkey,
           CAST(CAST(c_acctbal AS REAL) AS DOUBLE) AS f0,
           CAST(CAST(c_nationkey AS REAL) AS DOUBLE) AS f1,
           c_mktsegment AS label
    FROM customer
    """,
    tags=("ingest", "tensorize"),
)
def ingest_flatten_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1+T2: label pop + numeric columns flattened to a float32 vector
    (the reference's np.float32 coercion, serialize.py:304).

    The gate output unpacks the fixed-width vector into scalar double
    columns (f0, f1): array cells are unhashable in pandas-based
    comparison layers, and float→string joins format differently across
    engines. The float32 rounding itself is what's under test, and it
    survives the upcast to double.
    """
    cust = catalog.load(spark, sf_dir, "customer")
    keyed = cust.withColumnRenamed("c_custkey", "key")
    features, labels = pop_label(keyed, "c_mktsegment")
    flat = flatten_features(features, ["c_acctbal", "c_nationkey"])
    return (flat.join(labels, "key")
            .select(F.col("key").alias("c_custkey"),
                    F.element_at(F.col("features").cast("array<double>"), 1)
                     .alias("f0"),
                    F.element_at(F.col("features").cast("array<double>"), 2)
                     .alias("f1"),
                    F.col("c_mktsegment").alias("label")))


@register(
    "ingest_datum_source_scan",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE doc_id < 250
    GROUP BY lang
    """,
    tags=("ingest", "source", "datum"),
)
def ingest_datum_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/W1/R3 as a first-class Spark source: serialize documents to the
    reference's Datum wire format (reference serialize.py:796 layout),
    write them through the ``ndpdatum`` Python DataSource (one file per
    partition + manifest), read them BACK through the same source with a
    key-range filter — which must prune non-matching files via the
    manifest before any byte is read — then wire-decode and aggregate.

    End-to-end proof that the custom source round-trips bytes exactly
    and that its file-level data skipping returns the same answer as a
    direct scan (the DuckDB oracle never sees the Datum detour).
    """
    import hashlib
    import os
    import shutil
    import tempfile

    from new_data_pipeline_spark.sources.datum_bridge import (
        from_datum, to_datum)
    from new_data_pipeline_spark.sources.datum_source import (
        register_datum_source)

    register_datum_source(spark)
    docs = catalog.load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("key"),
        F.struct(
            F.col("doc_id").cast("string").alias("identifier"),
            F.col("lang").alias("slabel"),
            F.col("n_chars").cast("int").alias("nlabel"),
            F.lit(None).cast("binary").alias("multilabel"),
        ).alias("classs"))
    wire = to_datum(docs, passthrough=["key"])

    # stable scratch name (md5, not the per-process-salted hash()):
    # reruns overwrite one generation instead of leaking a dataset per
    # process — the same fix as the r8 layout-gate sweep
    out = os.path.join(
        tempfile.gettempdir(),
        f"ndp_datum_scan_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}")
    shutil.rmtree(out, ignore_errors=True)
    (wire.repartitionByRange(8, "key")
         .write.format("ndpdatum").mode("append").save(out))

    back = (spark.read.format("ndpdatum").load(out)
            .filter(F.col("key") < 250))
    decoded = from_datum(back, passthrough=["key"])
    return (decoded
            .groupBy(F.col("classs.slabel").alias("lang"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col("classs.nlabel").cast("bigint"))
                  .alias("total_chars")))
