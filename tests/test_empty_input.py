"""Degenerate-input sweep: every registered query must plan and execute
over ZERO-ROW tables with the production schemas.

At 100 TB scale empty inputs are routine — a filter that eliminates a
partition, a source with no new files, a split with no members. A query
that divides by a collected count, indexes row 1, or builds a map from
collected offsets crashes exactly here, so the whole registry gets the
sweep.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import new_data_pipeline_spark as engine
from new_data_pipeline_spark.catalog import TABLES

engine.load_all()

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        schema = pq.read_schema(os.path.join(SRC, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


# Queries whose output size is schema-derived, not data-derived: they
# legitimately emit a fixed row set even over zero-row input.
FIXED_ROWS = {
    "profile_table_quality": 6,          # one row per profiled column
    "profile_referential_integrity": 4,  # one row per FK check
    "graph_kcore_peeling": 6,            # one (all-zero) row per round
    "graph_kcore_auto": 6,               # same fixed-round trace shape
}


@pytest.mark.parametrize("spec", list(engine.QUERIES.values()),
                         ids=lambda s: s.name)
def test_runs_on_empty_tables(spark, empty_sf_dir, spec):
    df = spec.fn(spark, empty_sf_dir)
    # ungrouped aggregates legitimately return one (null-filled) summary
    # row over empty input — ANSI semantics — and unions of them (the
    # funnel report) a fixed handful; the sweep asserts the plan builds
    # and executes with no data-derived rows, not an exact zero
    limit = FIXED_ROWS.get(spec.name, 3)
    assert df.count() <= limit, f"{spec.name}: unexpected rows from empty input"
