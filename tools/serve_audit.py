"""Scale audit for the ANN SERVING join under the persisted bucketed
index (VERDICT r12 #8): build the bucketed IVF index ONCE per scale
(the pay-the-shuffle-once layout), then time ONLY the request path —
ivf_serve_batch probing the catalog table — at 1x (sf0.1) and 10x
(tools/make_scale_data.py output), reps interleaved. Also re-asserts
the no-Exchange-over-index plan property at BOTH scales, so the timed
join is provably the shuffle-free layout.

Usage: python tools/serve_audit.py [reps]
"""
from __future__ import annotations

import contextlib
import hashlib
import io
import math
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

BASE = os.environ.get("SCALE_BASE", "/root/testdata/sf0.1")
BIG = os.environ.get("SCALE_OUT", "/tmp/ndp_scale10")
FACTOR = int(os.environ.get("SCALE_FACTOR", "10"))


def _setup(spark, sf_dir: str):
    """Index build (NOT timed): centroids + bucketed inverted lists."""
    from new_data_pipeline_spark import catalog
    from new_data_pipeline_spark.operators.similarity import (
        IVF_CENT_RESIDUE, N_QUERIES, _ivf_assign_and_probes, _normalized,
        ivf_mod)
    from new_data_pipeline_spark.plans import physical
    from new_data_pipeline_spark.plans.layout_queries import (
        _sweep_stale_bucketed)

    n = _normalized(catalog.load(spark, sf_dir, "embeddings"))
    mod = ivf_mod(catalog.load(spark, sf_dir, "embeddings").count())
    res = IVF_CENT_RESIDUE % mod
    cents = (n.filter(F.col("vec_id") % mod == res)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("v").alias("cent_v"),
                     F.col("nrm").alias("cent_n")).persist())
    cents.count()
    tbl = ("ndp_b_srvaud_"
           + hashlib.md5(sf_dir.encode()).hexdigest()[:8])
    _sweep_stale_bucketed(spark, keep={tbl}, prefixes=("ndp_b_srvaud_",))
    physical.write_bucketed(_ivf_assign_and_probes(spark, sf_dir)[0],
                            tbl, "cell")
    idx = spark.table(tbl)
    queries = (n.filter(F.col("vec_id") < N_QUERIES)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("v").alias("qv"), F.col("nrm").alias("qn"))
               .persist())
    queries.count()
    return queries, cents, idx, tbl


def _assert_index_shuffle_free(served, tbl: str) -> int:
    """No Exchange between the bucketed index scan and its join — the
    actual pay-the-shuffle-once guarantee, walked on the REAL JVM plan
    tree (r14: the former GLOBAL exchange-count bound broke when the
    scan-spread added a legitimate probe-side repartition; the
    tests/test_physical.py device). Returns the global exchange count
    for the report line."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        served.explain("formatted")
    plan = buf.getvalue()
    assert tbl in plan, "bucketed index table not in plan"
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))

    def unwrap(node):
        if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            return unwrap(node.initialPlan())
        return node

    def find(node, path):
        node = unwrap(node)
        kids = node.children()
        if kids.length() == 0:
            if (node.getClass().getSimpleName() == "FileSourceScanExec"
                    and tbl in node.toString()):
                return path
            return None
        for i in range(kids.length()):
            r = find(kids.apply(i), path + [node])
            if r is not None:
                return r
        return None

    path = find(served._jdf.queryExecution().executedPlan(), [])
    assert path is not None, f"no parquet scan for {tbl} in plan"
    for node in reversed(path):
        name = node.nodeName()
        assert "Exchange" not in name, \
            f"exchange above the bucketed index scan: {name}"
        if "Join" in name:
            break
    return n_ex


def main(reps: int = 3) -> None:
    from new_data_pipeline_spark.streaming.ann_serve import ivf_serve_batch

    spark = (SparkSession.builder.master("local[16]")
             .appName("serve-audit")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             # pin the AT-SCALE plan shape: the r14-compacted bucketed
             # index estimates under the auto-broadcast threshold at
             # 1x and Spark would (correctly) broadcast it — the audit
             # times the over-threshold layout the guarantee is about
             .config("spark.sql.autoBroadcastJoinThreshold", "-1")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ctx = {}
    for scale, d in (("1x", BASE), ("10x", BIG)):
        q, c, idx, tbl = _setup(spark, d)
        served = ivf_serve_batch(q, c, idx)
        n_ex = _assert_index_shuffle_free(served, tbl)
        served.write.mode("overwrite").format("noop").save()  # warm
        ctx[scale] = (served, n_ex)
    walls: dict[str, list[float]] = {"1x": [], "10x": []}
    for _ in range(reps):                       # interleaved draws
        for scale in ("1x", "10x"):
            t0 = time.perf_counter()
            ctx[scale][0].write.mode("overwrite").format("noop").save()
            walls[scale].append(time.perf_counter() - t0)
    t1 = statistics.median(walls["1x"])
    t10 = statistics.median(walls["10x"])
    import json
    print(json.dumps({
        "op": "ivf_serve_batch over bucketed catalog index (probe only)",
        "t1_med": round(t1, 3), "t1_all": [round(x, 3) for x in walls["1x"]],
        "t10_med": round(t10, 3),
        "t10_all": [round(x, 3) for x in walls["10x"]],
        "alpha": round(math.log(t10 / t1) / math.log(FACTOR), 2),
        "exchanges_1x": ctx["1x"][1], "exchanges_10x": ctx["10x"][1],
    }))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
