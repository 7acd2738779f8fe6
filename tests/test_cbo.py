"""Cost-based-optimization gate: the SAME 3-table join must plan a
sort-merge join when the catalog has no statistics and an all-broadcast
pipeline once ANALYZE'd column stats let FilterEstimation see that the
date-equality keeps ~6 of 15,000 orders — with identical results both
ways. Pins the one Catalyst scale lever file-size heuristics can't
provide (VERDICT r3 next-round item 3)."""

from __future__ import annotations

import contextlib
import io

import pytest

from new_data_pipeline_spark.plans import cbo
from tests.conftest import SF_DIR

CUSTKEY = 605   # ~25 of 15k orders reference this customer

CONFS = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # between the filtered-orders CBO estimate (~KB) and the raw
    # orders/lineitem file sizes (hundreds of KB) at sf0.01
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024),
    # freeze the static plan: AQE would re-plan at runtime and hide
    # the compile-time decision this test pins
    "spark.sql.adaptive.enabled": "false",
}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def cbo_session(spark):
    saved = {k: spark.conf.get(k, None) for k in CONFS}
    for k, v in CONFS.items():
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_stats_flip_smj_to_broadcast(cbo_session):
    spark = cbo_session
    cbo.register_catalog_tables(spark, SF_DIR)   # fresh, NO stats

    no_stats_plan = _plan(cbo.pinpoint_order_revenue(spark, CUSTKEY))
    assert "SortMergeJoin" in no_stats_plan, (
        "without stats the filtered orders side must look table-sized "
        "and shuffle")
    no_stats_rows = sorted(
        tuple(r) for r in
        cbo.pinpoint_order_revenue(spark, CUSTKEY).collect())

    cbo.analyze_columns(spark)
    stats_plan = _plan(cbo.pinpoint_order_revenue(spark, CUSTKEY))
    assert "SortMergeJoin" not in stats_plan, (
        "with column stats the equality selectivity must shrink "
        "the build side below the broadcast threshold")
    assert stats_plan.count("BroadcastHashJoin") >= 2, (
        "both joins should broadcast once estimates are row-accurate")

    stats_rows = sorted(
        tuple(r) for r in
        cbo.pinpoint_order_revenue(spark, CUSTKEY).collect())
    assert stats_rows == no_stats_rows and stats_rows, (
        "CBO must change the plan, never the answer")


def test_analyze_populates_column_stats(cbo_session):
    spark = cbo_session
    cbo.register_catalog_tables(spark, SF_DIR, tables=("orders",))
    cbo.analyze_columns(spark, tables=("orders",))
    desc = {r["info_name"]: r["info_value"] for r in spark.sql(
        f"DESCRIBE EXTENDED {cbo.DB}.orders o_custkey").collect()}
    assert int(desc["distinct_count"]) > 1000
    assert desc["min"] != "NULL" and desc["max"] != "NULL"
