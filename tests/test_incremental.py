"""Incremental-maintenance gates: a targeted refresh must rewrite ONLY
the named partitions (mtime-asserted), and the merged report must equal
a direct full recompute bit-exactly (decimal monoid). Day-grain runs on
a restricted window so the partition count stays test-sized; the
registered query covers month grain end-to-end."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.functions.exact import money
from new_data_pipeline_spark.operators import incremental
from tests.conftest import SF_DIR


def _window_lineitem(spark):
    """~3 months of lineitem → ~90 day partitions."""
    return catalog.load(spark, SF_DIR, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1995-04-01"))


def _partition_mtimes(path: str) -> dict[str, float]:
    out = {}
    for d in os.listdir(path):
        if not d.startswith("grain="):
            continue
        full = os.path.join(path, d)
        out[d] = max(os.path.getmtime(os.path.join(full, f))
                     for f in os.listdir(full) if f.endswith(".parquet"))
    return out


def test_day_refresh_touches_only_named_partitions(spark, tmp_path):
    path = str(tmp_path / "partials")
    li = _window_lineitem(spark)
    incremental.write_partials(spark, li, path, grain="day")
    before = _partition_mtimes(path)
    assert len(before) > 10

    days = sorted(before)[:2]
    refreshed = [d.split("=", 1)[1] for d in days]
    incremental.refresh_partials(spark, li, path, refreshed, grain="day")
    after = _partition_mtimes(path)

    assert set(after) == set(before), "refresh changed the partition set"
    for d in before:
        if d in days:
            assert after[d] > before[d], f"{d} was not rewritten"
        else:
            assert after[d] == before[d], f"{d} rewritten needlessly"


def test_merged_report_equals_full_recompute(spark, tmp_path):
    path = str(tmp_path / "partials")
    li = _window_lineitem(spark)
    incremental.write_partials(spark, li, path, grain="day")
    merged = {r["month"]: (r["n_rows"], r["sum_qty"], r["revenue"])
              for r in incremental.monthly_report(spark, path).collect()}

    rev = money("l_extendedprice") * (F.lit(1).cast("decimal(12,2)")
                                      - money("l_discount"))
    direct = {r["month"]: (r["n_rows"], r["sum_qty"], r["revenue"])
              for r in (li.groupBy(F.date_format("l_shipdate", "yyyy-MM")
                                   .alias("month"))
                        .agg(F.count(F.lit(1)).alias("n_rows"),
                             F.sum(money("l_quantity")).cast("double")
                             .alias("sum_qty"),
                             F.sum(rev).cast("double").alias("revenue"))
                        .collect())}
    assert merged == direct  # bit-exact, not approximately equal


def test_refresh_after_correction_converges(spark, tmp_path):
    """Refreshing a day from unchanged source is idempotent: partials
    and report stay bit-identical (the late-data correction path)."""
    path = str(tmp_path / "partials")
    li = _window_lineitem(spark)
    incremental.write_partials(spark, li, path, grain="day")
    report1 = sorted(map(tuple, incremental.monthly_report(spark, path)
                         .collect()))
    some_day = incremental.read_partials(spark, path) \
        .select("grain").first()["grain"]
    incremental.refresh_partials(spark, li, path, [some_day], grain="day")
    report2 = sorted(map(tuple, incremental.monthly_report(spark, path)
                         .collect()))
    assert report1 == report2


def test_refresh_emptied_day_drops_from_report(spark, tmp_path):
    """A correction that removes ALL rows for a refreshed day must drop
    that day from the store (dynamic overwrite alone would leave the
    stale partition directory behind and the report would keep counting
    deleted rows)."""
    path = str(tmp_path / "partials")
    li = _window_lineitem(spark)
    incremental.write_partials(spark, li, path, grain="day")
    some_day = incremental.read_partials(spark, path) \
        .select("grain").first()["grain"]

    corrected = li.filter(
        F.date_format("l_shipdate", "yyyy-MM-dd") != some_day)
    incremental.refresh_partials(spark, corrected, path, [some_day],
                                 grain="day")
    remaining = {r["grain"] for r in
                 incremental.read_partials(spark, path)
                 .select("grain").collect()}
    assert some_day not in remaining
    assert not os.path.exists(os.path.join(path, f"grain={some_day}"))

    # report now equals a full recompute over the corrected source
    merged = {r["month"]: r["n_rows"] for r in
              incremental.monthly_report(spark, path).collect()}
    direct = {r["month"]: r["n_rows"] for r in
              (corrected.groupBy(F.date_format("l_shipdate", "yyyy-MM")
                                 .alias("month"))
               .agg(F.count(F.lit(1)).alias("n_rows")).collect())}
    assert merged == direct


def test_hll_partials_merge_equals_whole_pass(spark, tmp_path):
    """Sketch-store path: the union of per-day HLL partials must track
    a whole-pass sketch (equality holds at this corpus size where the
    sketches stay sparse-exact; above the sparse→dense promotion the
    guarantee weakens to closeness — see test_sketches), and the flags
    in the registered query's output must all be in-bound."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "hll_partials")
    events = catalog.load(spark, SF_DIR, "events")
    incremental.write_distinct_partials(spark, events, path, grain="day")
    merged = {r["month"]: r["approx_users"] for r in
              incremental.monthly_distinct(spark, path).collect()}
    whole = {r["month"]: r["est"] for r in
             (events.groupBy(F.date_format("ts", "yyyy-MM").alias("month"))
              .agg(F.hll_sketch_estimate(
                  F.hll_sketch_agg("user_id", F.lit(incremental._LG_K)))
                  .alias("est")).collect())}
    assert merged and set(merged) == set(whole)
    for month, est in merged.items():
        assert abs(est - whole[month]) <= 0.02 * max(whole[month], 1), \
            (month, est, whole[month])
    for r in incremental.incremental_monthly_distinct(spark, SF_DIR) \
            .collect():
        assert r["within_5pct"] == 1, r
