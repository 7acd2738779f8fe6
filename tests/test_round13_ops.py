"""Golden tests for round-13 changes — semantics pinned against
independent recomputation (oracle parity proves Spark == DuckDB; these
prove both equal the intended algorithm)."""

from __future__ import annotations

import math

import duckdb

import new_data_pipeline_spark as engine

engine.load_all()

# Counts where round(sqrt(n), 6) * 1e6 computed in BINARY doubles lands
# just below the integer, so Spark's truncating double->bigint cast and
# DuckDB's rounding cast disagree by 1 (ADVICE r12). The decimal-pin
# device must make both engines produce the round-to-nearest value.
_ADVERSARIAL_COUNTS = [67, 69, 258, 260, 264, 1, 2, 3, 100, 10_000]


def _expected_w_u(n: int) -> int:
    # round-to-nearest of the 6-dp sqrt in micro-units — what an exact
    # decimal pipeline produces.
    return round(round(math.sqrt(n), 6) * 1_000_000)


def test_mixture_w_u_decimal_pin_spark(spark):
    """Spark's decimal-pinned w_u expression must equal the exact
    round-to-nearest micro-unit value for every adversarial count —
    the raw double*1e6 cast gives w_u-1 for 67, 69, 258, ...."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(n,) for n in _ADVERSARIAL_COUNTS],
                               "n_docs bigint")
    got = {r["n_docs"]: r["w_u"] for r in df.withColumn(
        "w_u",
        (F.round(F.sqrt(F.col("n_docs").cast("double")), 6)
         .cast("decimal(20,6)") * F.lit(1000000))
        .cast("bigint")).collect()}
    for n in _ADVERSARIAL_COUNTS:
        assert got[n] == _expected_w_u(n), n
    # and the old (broken) expression really was off by one somewhere,
    # else this pin tests nothing
    broken = {r["n_docs"]: r["b"] for r in df.withColumn(
        "b",
        (F.round(F.sqrt(F.col("n_docs").cast("double")), 6) * 1000000)
        .cast("bigint")).collect()}
    assert any(broken[n] != _expected_w_u(n) for n in _ADVERSARIAL_COUNTS)


def test_mixture_w_u_decimal_pin_duckdb():
    """DuckDB's side of the same device must give the identical
    round-to-nearest value."""
    con = duckdb.connect()
    rows = con.execute(
        "SELECT n, CAST(CAST(ROUND(sqrt(CAST(n AS DOUBLE)), 6)"
        "          AS DECIMAL(20,6)) * 1000000 AS BIGINT)"
        " FROM (SELECT UNNEST(?) AS n)",
        [_ADVERSARIAL_COUNTS]).fetchall()
    for n, w_u in rows:
        assert w_u == _expected_w_u(n), n
