"""The Python-UDF surface: Arrow-batched pandas UDFs (scalar, grouped
aggregate), applyInPandas (grouped map), and mapInPandas (partition
batch) — the engine's sanctioned slow path.

Reference analogs (SURVEY.md §2.1 / §2.2 UDF row): the cv2 decode
(reference serialize.py:34) and the CountVectorizer fit
(serialize.py:230) are the reference's only "UDFs"; both ran row-at-a-
time in reader threads. Here every Python touchpoint is Arrow-batched
(~10-100× the row-at-a-time throughput) and kept OUT of the oracle-
gated hot path — built-ins cover those; these exist for the semantics
built-ins can't express (custom models, scipy-style math).

Each function has a built-in-equivalent twin in tests/test_udfs.py that
pins its semantics, so the UDF surface is verified without a DuckDB
oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


@F.pandas_udf(DoubleType())
def vector_l2_norm(v: pd.Series) -> pd.Series:
    """Scalar pandas UDF: L2 norm of an array column, one Arrow batch at
    a time (numpy-vectorized inside the batch)."""
    return v.map(lambda a: float(np.sqrt(np.dot(a, a))))


@F.pandas_udf(DoubleType())
def weighted_mean(value: pd.Series, weight: pd.Series) -> float:
    """Grouped-aggregate pandas UDF: Σ(v·w)/Σ(w) per group (the
    ``-> float`` hint is what makes this GROUPED_AGG, not scalar).

    Used under groupBy().agg(); Spark feeds each group's columns as
    full pandas Series (grouped-agg UDFs don't stream, so groups must
    fit in executor memory — document the contract, salt if they don't).
    """
    w = weight.sum()
    return float((value * weight).sum() / w) if w else float("nan")


def zscore_per_group(df: DataFrame, group_col: str, value_col: str,
                     out_col: str = "zscore") -> DataFrame:
    """Grouped-map applyInPandas: per-group standardization
    ((x - mean) / std), emitted with the original columns."""
    schema = f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)}, {out_col} double"

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=0)
        mean = pdf[value_col].mean()
        pdf[out_col] = 0.0 if std == 0 else (pdf[value_col] - mean) / std
        return pdf

    return df.groupBy(group_col).applyInPandas(standardize, schema=schema)


def batch_featurize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """mapInPandas partition-batch operator: derive cheap text features
    per Arrow batch (the shape a custom tokenizer/model-scoring stage
    takes; swap the body for the real model at deploy time)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            t = pdf[text_col].astype(str)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_chars_py": t.str.len().astype("int64"),
                "n_words_py": t.str.split(" ").map(len).astype("int64"),
                "upper_ratio": (t.map(lambda s: sum(c.isupper() for c in s))
                                / t.str.len().clip(lower=1)),
            })

    return df.mapInPandas(
        run, schema="doc_id bigint, n_chars_py bigint, n_words_py bigint, "
                    "upper_ratio double")
