"""Shared test fixtures: local SparkSession + DuckDB oracle comparator.

The comparator mirrors the driver's gate (row-count + column names +
order-insensitive value comparison) but compares actual values instead
of hashes so failures are debuggable. Float cells are compared
bit-exactly by default — the driver hashes exactly, so a "close enough"
local pass would hide a driver failure.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from new_data_pipeline_spark.catalog import TABLES, table_path
from new_data_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
SMOKE_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests")
    yield s


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')")
    yield con
    con.close()


def _canon_cell(v):
    """Canonicalize one cell for order-insensitive exact comparison.

    Type-tagged so an int column can never silently equal a float column
    (2 == 2.0 in Python, but an exact value-hash distinguishes them —
    the driver's gate is a hash, so the local gate must be as strict).
    """
    if v is None:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (float, np.floating)):
        return f"f:{float(v)!r}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(_canon_cell(v) for v in row)
            for row in pdf[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def assert_oracle_match(spark, oracle_con, spec, sf_dir: str = SF_DIR) -> None:
    """Run the Spark query and its DuckDB oracle; assert driver-style parity."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = spec.fn(spark, sf_dir)
    complex_cols = [f.name for f in df.schema.fields
                    if isinstance(f.dataType, (ArrayType, MapType, StructType))]
    assert not complex_cols, (
        f"{spec.name}: oracle-gated query emits complex-typed columns "
        f"{complex_cols} — the driver's pandas canonicalizer crashes on "
        f"list/dict cells; flatten at the boundary (concat_ws / explode / "
        f"scalar unpack)")
    sdf = df.toPandas()
    odf = oracle_con.execute(spec.oracle).df()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{spec.name}: column mismatch spark={sorted(sdf.columns)} "
        f"oracle={sorted(odf.columns)}")
    assert len(sdf) == len(odf), (
        f"{spec.name}: row count spark={len(sdf)} oracle={len(odf)}")

    srows, orows = canonical_rows(sdf), canonical_rows(odf)
    mismatches = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not mismatches, (
        f"{spec.name}: {len(mismatches)}/{len(srows)} rows differ; "
        f"first: spark={mismatches[0][0]!r} oracle={mismatches[0][1]!r}")
