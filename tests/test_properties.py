"""Property-based guarantees (hypothesis) for the pure-Python cores of
distributed operators: the algorithmic invariants the oracle gate can't
express because they must hold for EVERY input, not one fixture.

These run without a SparkSession — they test the per-partition worker
bodies directly, which is exactly the code whose guarantees make the
distributed composition correct.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from new_data_pipeline_spark.operators.similarity import _local_topk_arrow_fn
from new_data_pipeline_spark.operators.text_analysis import _misra_gries_fn

TOKENS = st.lists(
    st.sampled_from([f"t{i}" for i in range(50)]), min_size=0, max_size=2000)


@given(stream=TOKENS, capacity=st.integers(min_value=2, max_value=20))
@settings(max_examples=200, deadline=None)
def test_misra_gries_superset_guarantee(stream, capacity):
    """Every token with true count > n/capacity must survive the
    per-partition summary — the invariant that makes the two-pass
    heavy-hitter plan EXACT (candidates ⊇ heavy hitters; the recount
    then filters precisely)."""
    fn = _misra_gries_fn(capacity)
    # feed the stream in several pandas batches, as mapInPandas would
    batches = [pd.DataFrame({"w": stream[i:i + 97]})
               for i in range(0, max(len(stream), 1), 97)]
    out = pd.concat(list(fn(iter(batches))))
    survivors = set(out["w"])
    counts = Counter(stream)
    n = len(stream)
    for w, c in counts.items():
        if c > n / capacity:
            assert w in survivors, (
                f"{w} has count {c} > {n}/{capacity} but was evicted")
    assert len(survivors) <= capacity


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5),            # query_id
                  st.integers(0, 500),          # candidate_id
                  st.floats(-1, 1, allow_nan=False)),  # cos
        min_size=0, max_size=600),
    top_k=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=100, deadline=None)
def test_local_topk_prefilter_is_lossless(rows, top_k):
    """The Arrow pre-filter keeps every row that could reach the global
    top-k under (cos desc, candidate_id asc) — batch-local top-k is a
    superset of the global top-k restricted to that batch."""
    import pyarrow as pa

    rows = list({(q, c): (q, c, s) for q, c, s in rows}.values())  # unique keys
    fn = _local_topk_arrow_fn(top_k)
    tbl = pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "candidate_id": pa.array([r[1] for r in rows], pa.int64()),
        "label": pa.array([0] * len(rows), pa.int32()),
        "cos": pa.array([r[2] for r in rows], pa.float64()),
    })
    # split into two arbitrary batches
    mid = len(rows) // 2
    batches = [b for b in (tbl.slice(0, mid).to_batches()
                           + tbl.slice(mid).to_batches()) if b.num_rows]
    kept = set()
    for out in fn(iter(batches)):
        pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
        for q, c in zip(pdf["query_id"], pdf["candidate_id"]):
            kept.add((int(q), int(c)))

    def global_topk(rs):
        by_q: dict[int, list] = {}
        for q, c, s in rs:
            by_q.setdefault(q, []).append((c, s))
        out = set()
        for q, cands in by_q.items():
            cands.sort(key=lambda x: (-x[1], x[0]))
            out |= {(q, c) for c, _ in cands[:top_k]}
        return out

    # every global top-k row survives the filter (losslessness)
    assert global_topk(rows) <= kept


@given(data=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                               allow_nan=False), min_size=1, max_size=3000),
       n_parts=st.integers(min_value=1, max_value=8))
@settings(max_examples=100, deadline=None)
def test_kll_weight_exact_and_rank_bounded(data, n_parts):
    """For EVERY input and partitioning: merged-sketch total weight
    equals the input count (compaction loses no weight), and the median
    estimate's normalized rank error stays within the gate bound."""
    import bisect

    from new_data_pipeline_spark.functions.kll import KLL

    merged = KLL()
    for i in range(n_parts):
        s = KLL()
        for v in data[i::n_parts]:
            s.add(v)
        merged.merge(s)
    total_w = sum((1 << lv) * len(items)
                  for lv, items in enumerate(merged.levels))
    assert total_w == len(data)
    est = merged.quantile(0.5)
    srt = sorted(data)
    lo = bisect.bisect_left(srt, est) / len(srt)
    hi = bisect.bisect_right(srt, est) / len(srt)
    # the estimate's rank interval must overlap [0.5-eps, 0.5+eps]
    assert lo <= 0.5 + 0.02 and hi >= 0.5 - 0.02, (lo, hi, len(data))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzzy_blocking_lossless_on_random_corpora(seed, spark):
    """Losslessness on randomized corpora, not just the fixture: a tiny
    'ab ' alphabet at lengths ≤ 8 maximizes repeated grams and
    below-bound short strings — exactly the corners where a naive
    distinct-gram or bound-only blocking silently drops pairs.
    (Seeded corpora, one Spark run each — a hypothesis-per-example
    Spark job would take minutes per case.)"""
    import random

    from pyspark.sql import functions as F

    from new_data_pipeline_spark.operators import fuzzy_join

    rng = random.Random(seed)
    names = list({"".join(rng.choice("ab ") for _ in range(rng.randint(1, 8)))
                  for _ in range(25)})
    df = spark.createDataFrame([(n,) for n in names], "name string")
    blocked = {(r["name_a"], r["name_b"]) for r in
               fuzzy_join.fuzzy_pairs(df, "name").collect()}
    a = df.select(F.col("name").alias("name_a"))
    b = df.select(F.col("name").alias("name_b"))
    brute = {(r["name_a"], r["name_b"]) for r in
             (a.crossJoin(b)
              .filter(F.col("name_a") < F.col("name_b"))
              .filter(F.levenshtein("name_a", "name_b")
                      <= fuzzy_join.FUZZY_D).collect())}
    assert blocked == brute, (
        f"missed: {brute - blocked}, extra: {blocked - brute}")
