"""KLL sketch gates: rank-error bound, weight exactness, merge
associativity, determinism, and the Spark partition-sketch → merge
pipeline against exact quantiles."""

from __future__ import annotations

import bisect
import random

from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.functions.kll import KLL
from new_data_pipeline_spark.operators.quantile_sketch import (
    kll_group_quantiles)
from tests.conftest import SF_DIR

QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def _worst_rank_err(sketch: KLL, sorted_data: list[float]) -> float:
    n = len(sorted_data)
    return max(abs(bisect.bisect_right(sorted_data, sketch.quantile(q)) / n
                   - q) for q in QS)


def test_rank_error_and_weight_exactness():
    rng = random.Random(3)
    data = [rng.gauss(0, 1) for _ in range(100_000)]
    s = KLL()
    for v in data:
        s.add(v)
    total_w = sum((1 << lv) * len(items)
                  for lv, items in enumerate(s.levels))
    assert total_w == len(data)          # compaction never loses weight
    stored = sum(len(items) for items in s.levels)
    assert stored < 1000                 # bounded memory (~600 at K=400)
    assert _worst_rank_err(s, sorted(data)) < 0.01


def test_merge_matches_single_sketch_bound():
    rng = random.Random(5)
    data = [rng.uniform(0, 1) for _ in range(50_000)]
    parts = [data[i::16] for i in range(16)]
    merged = KLL()
    for p in parts:
        s = KLL()
        for v in p:
            s.add(v)
        merged.merge(s)
    assert merged.n == len(data)
    assert _worst_rank_err(merged, sorted(data)) < 0.01


def test_deterministic_and_serde():
    data = [((i * 2654435761) % 1000) / 7.0 for i in range(20_000)]
    s1, s2 = KLL(), KLL()
    for v in data:
        s1.add(v)
        s2.add(v)
    assert s1.levels == s2.levels        # no randomness anywhere
    s3 = KLL.from_rows(s1.to_rows())
    assert all(s1.quantile(q) == s3.quantile(q) for q in QS)


def test_spark_pipeline_within_bound(spark):
    est = {r["grp"]: (r["q50"], r["q95"]) for r in
           kll_group_quantiles(
               catalog.load(spark, SF_DIR, "lineitem"),
               "l_returnflag", "l_extendedprice").collect()}
    brackets = {r["grp"]: r for r in
                (catalog.load(spark, SF_DIR, "lineitem")
                 .groupBy(F.col("l_returnflag").alias("grp"))
                 .agg(*[F.expr(f"percentile(l_extendedprice, {q})")
                        .alias(n) for q, n in
                        [(0.48, "lo50"), (0.52, "hi50"),
                         (0.93, "lo95"), (0.97, "hi95")]])
                 .collect())}
    assert set(est) == set(brackets) and est
    for g, (q50, q95) in est.items():
        b = brackets[g]
        assert b["lo50"] <= q50 <= b["hi50"], (g, q50)
        assert b["lo95"] <= q95 <= b["hi95"], (g, q95)
