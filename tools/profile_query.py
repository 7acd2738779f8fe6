#!/usr/bin/env python
"""Per-stage profile of one or more registered queries via the Spark UI
REST API (guide §7.1 applied headlessly: stage wall, task time, shuffle
bytes, input bytes — the empirical loop's raw numbers).

Usage: python tools/profile_query.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), PROFILE_RUNS (default 2 — the
first run fills page cache / JIT; the LAST run's jobs are reported).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import new_data_pipeline_spark as engine
from new_data_pipeline_spark.session import get_spark


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("PROFILE_RUNS", "2"))
    engine.load_all()
    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    spark = (get_spark(app_name="profile_query"))
    # the session factory disables the UI; re-enable needs a fresh ctx,
    # so build directly when needed
    if spark.sparkContext.uiWebUrl is None:
        spark.stop()
        from pyspark.sql import SparkSession
        cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count()))
        spark = (SparkSession.builder.appName("profile_query")
                 .master(f"local[{cpus}]")
                 .config("spark.sql.shuffle.partitions", cpus)
                 .config("spark.sql.adaptive.enabled", "true")
                 .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
                 .config("spark.sql.adaptive.skewJoin.enabled", "true")
                 .config("spark.sql.session.timeZone", "UTC")
                 .config("spark.sql.execution.arrow.pyspark.enabled", "true")
                 .config("spark.sql.autoBroadcastJoinThreshold", "64m")
                 .config("spark.driver.memory", "16g")
                 .config("spark.ui.enabled", "true")
                 .config("spark.sql.parquet.aggregatePushdown", "true")
                 .config("spark.sql.legacy.parquet.nanosAsLong", "true")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("WARN")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    for name in names:
        spec = engine.QUERIES[name]
        spark.catalog.clearCache()
        for _ in range(runs - 1):
            spec.fn(spark, sf_dir).write.mode("overwrite") \
                .format("noop").save()
            spark.catalog.clearCache()
        jobs_before = {j["jobId"] for j in _get(f"{base}/jobs")}
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"profile:{name}")
        spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        jobs = [j for j in _get(f"{base}/jobs")
                if j["jobId"] not in jobs_before]
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs ===")
        stage_rows = []
        for j in sorted(jobs, key=lambda x: x["jobId"]):
            for sid in j["stageIds"]:
                try:
                    for s in _get(f"{base}/stages/{sid}"):
                        if s["status"] == "SKIPPED":
                            continue
                        dur = (s.get("executorRunTime", 0)) / 1000.0
                        sub = s.get("submissionTime")
                        comp = s.get("completionTime")
                        stage_rows.append(
                            (j["jobId"], sid, s["numCompleteTasks"],
                             dur,
                             s.get("inputBytes", 0) / 1e6,
                             s.get("shuffleReadBytes", 0) / 1e6,
                             s.get("shuffleWriteBytes", 0) / 1e6,
                             s.get("name", "")[:70]))
                except Exception:
                    pass
        stage_rows.sort(key=lambda r: -r[3])
        print(f"{'job':>4} {'stage':>5} {'tasks':>5} {'exec_s':>8} "
              f"{'in_MB':>8} {'shR_MB':>8} {'shW_MB':>8}  name")
        for r in stage_rows:
            print(f"{r[0]:>4} {r[1]:>5} {r[2]:>5} {r[3]:>8.2f} "
                  f"{r[4]:>8.1f} {r[5]:>8.2f} {r[6]:>8.2f}  {r[7]}")
    spark.stop()


if __name__ == "__main__":
    main()
