"""Unit gates for the trained-by-aggregation NB source classifier
(operators/nb_classifier.py) beyond its DuckDB oracle: sanity of the
model it learns and the physical shape of the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from new_data_pipeline_spark.operators.nb_classifier import (
    text_nb_source_classifier)
from tests.conftest import SF_DIR


def test_confusion_matrix_covers_every_document(spark):
    cm = text_nb_source_classifier(spark, SF_DIR)
    total = cm.agg(F.sum("n_docs")).first()[0]
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert total == n_docs, "every document must receive one verdict"
    spark.catalog.clearCache()


def test_training_beats_chance_on_its_own_corpus(spark):
    """Trained and evaluated on the same corpus, NB must beat the
    1/S random baseline by a wide margin — a model that doesn't was
    not actually fit on the counts."""
    cm = text_nb_source_classifier(spark, SF_DIR).collect()
    total = sum(r["n_docs"] for r in cm)
    diag = sum(r["n_docs"] for r in cm if r["actual"] == r["predicted"])
    n_sources = len({r["actual"] for r in cm})
    assert n_sources > 1, "fixture must have multiple sources"
    assert diag / total > 2.0 / n_sources, (
        f"accuracy {diag/total:.3f} vs chance {1/n_sources:.3f}")
    spark.catalog.clearCache()


def test_plan_has_no_python_udf_and_no_window(spark):
    """Training + inference must stay JVM-side: no Python UDFs, and the
    argmax is a map-side min_by, never a row_number shuffle."""
    df = text_nb_source_classifier(spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution
        .ExplainMode.fromString("formatted"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan
    spark.catalog.clearCache()
