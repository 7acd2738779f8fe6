"""Driver-gate mirror: every registered SQL-expressible query must match
its DuckDB oracle exactly (columns + row count + order-insensitive values).

Queries with no oracle get a rows-run smoke check here; their semantics
are pinned by dedicated golden unit tests in their own test modules.
"""

from __future__ import annotations

import pytest

import new_data_pipeline_spark as engine
from tests.conftest import SF_DIR, assert_oracle_match

engine.load_all()

ORACLE_SPECS = [s for s in engine.QUERIES.values() if s.oracle is not None]
NO_ORACLE_SPECS = [s for s in engine.QUERIES.values() if s.oracle is None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity(spark, oracle_con, spec):
    assert_oracle_match(spark, oracle_con, spec)


@pytest.mark.parametrize("spec", NO_ORACLE_SPECS, ids=lambda s: s.name)
def test_rows_only_runs(spark, spec):
    df = spec.fn(spark, SF_DIR)
    assert df.columns, f"{spec.name}: empty schema"
    df.limit(1).collect()  # plan executes


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0


def test_contract_shape():
    import __spark_entry__ as e
    q, o = e.queries(), e.oracle_sql()
    assert q, "queries() must not be empty"
    assert set(o) <= set(q)
