"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``new_data_pipeline_spark`` package; this
module only adapts the registry to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import new_data_pipeline_spark as engine

engine.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "flagship_revenue_by_nation"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return engine.QUERIES[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Gate-priority order (registry.GATE_PRIORITY): the driver's correctness
    window covers the first 50 entries, so the families left unchecked in
    round 1 (dedup/similarity/text/streaming/ingest/sampling/scalar/
    subquery) lead; the round-1-verified block follows.
    """
    return {name: spec.fn for name, spec in engine.registry.gate_ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {name: spec.oracle for name, spec in engine.registry.gate_ordered().items()
            if spec.oracle is not None}
