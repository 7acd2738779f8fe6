"""One-off extended differential sweep: run fuzz seeds [START, END)
against DuckDB — the same check as tests/test_differential.py, but for
a larger seed range than the suite pins (the suite stays at 200 seeds
to bound its wall; this tool shakes out divergences in bulk when a new
shape family lands).

Usage: python tools/fuzz_sweep.py [start] [end]   (default 200 800)
Prints one line per failure (seed, kind, SQL) and a final tally.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from new_data_pipeline_spark import fuzz
from new_data_pipeline_spark.catalog import TABLES, table_path

SMOKE_DIR = "/root/testdata/sf0.001"


def main() -> None:
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    end = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    spark = (SparkSession.builder.master("local[8]")
             .appName("fuzz-sweep")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{table_path(SMOKE_DIR, t)}')")
    from tests.conftest import canonical_rows

    failures = 0
    for seed in range(start, end):
        case = fuzz.generate(seed)
        kind = getattr(case, "kind", "agg")
        try:
            sql = case.sql()
            sdf = case.spark_df(spark, SMOKE_DIR).toPandas()
            odf = con.execute(sql).df()
            ok = (sorted(sdf.columns) == sorted(odf.columns)
                  and len(sdf) == len(odf))
            if ok:
                s, o = canonical_rows(sdf), canonical_rows(odf)
                ok = all(a == b for a, b in zip(s, o))
            if not ok:
                failures += 1
                print(f"FAIL seed={seed} kind={kind}\n  {sql}")
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            failures += 1
            try:  # sql() itself may be what failed — never abort the sweep
                shown = case.sql()
            except Exception:  # noqa: BLE001
                shown = "<sql unavailable>"
            print(f"ERROR seed={seed} kind={kind}: {exc}\n  {shown}")
        if (seed - start + 1) % 100 == 0:
            print(f"... {seed - start + 1}/{end - start} swept, "
                  f"{failures} failures", flush=True)
    print(f"SWEEP DONE seeds [{start},{end}): {failures} failures")
    spark.stop()


if __name__ == "__main__":
    main()
