"""Golden tests for the round-10 second-wave operators: each pins the
SEMANTICS against an independent reference (numpy / pure-Python /
pandas recomputation) — the oracle-parity suite already proves
Spark == DuckDB; these prove both equal the intended algorithm."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

import new_data_pipeline_spark as engine
from new_data_pipeline_spark.operators.graph import lpa_labels
from new_data_pipeline_spark.operators.privacy import DP_SCALE, K_ANON
from tests.conftest import SMOKE_DIR

engine.load_all()


def test_ols_matches_numpy_lstsq(spark):
    got = engine.QUERIES["ml_ols_regression"].fn(spark, SMOKE_DIR).collect()
    li = (spark.read.parquet(f"{SMOKE_DIR}/lineitem.parquet")
          .select("l_returnflag", "l_quantity", "l_discount",
                  "l_extendedprice").toPandas())
    assert got, "no groups"
    for r in got:
        g = li[li.l_returnflag == r["l_returnflag"]]
        X = np.column_stack([np.ones(len(g)), g.l_quantity, g.l_discount])
        beta, *_ = np.linalg.lstsq(X, g.l_extendedprice.to_numpy(),
                                   rcond=None)
        assert math.isclose(r["intercept"], beta[0], rel_tol=1e-6, abs_tol=1e-4)
        assert math.isclose(r["beta_qty"], beta[1], rel_tol=1e-6, abs_tol=1e-4)
        assert math.isclose(r["beta_disc"], beta[2], rel_tol=1e-6, abs_tol=1e-4)
        assert -1e-9 <= r["r2"] <= 1.0
        assert r["n_rows"] == len(g)


def test_market_basket_matches_pandas(spark):
    got = (engine.QUERIES["ml_market_basket_lift"]
           .fn(spark, SMOKE_DIR).toPandas())
    assert len(got) > 0, "fixture must yield at least one rule"
    li = (spark.read.parquet(f"{SMOKE_DIR}/lineitem.parquet")
          .select("l_orderkey", "l_partkey").toPandas()
          .drop_duplicates())
    n_baskets = li.l_orderkey.nunique()
    item_n = li.groupby("l_partkey").size()
    merged = li.merge(li, on="l_orderkey")
    merged = merged[merged.l_partkey_x < merged.l_partkey_y]
    pair_n = merged.groupby(["l_partkey_x", "l_partkey_y"]).size()
    for r in got.itertuples():
        pn = pair_n[(r.part_a, r.part_b)]
        assert r.n_joint == pn
        assert math.isclose(r.support, round(pn / n_baskets, 6))
        assert math.isclose(r.conf_a_b, round(pn / item_n[r.part_a], 6))
        assert math.isclose(r.conf_b_a, round(pn / item_n[r.part_b], 6))
        assert math.isclose(
            r.lift,
            round(pn * n_baskets / (item_n[r.part_a] * item_n[r.part_b]), 6))
    # the cut is the global top by lift: no unreported pair may beat
    # the worst reported lift (recheck on the full pandas rule set)
    full = pair_n[pair_n >= 2].reset_index(name="pn")
    full["lift"] = (full.pn * n_baskets
                    / (full.l_partkey_x.map(item_n)
                       * full.l_partkey_y.map(item_n))).round(6)
    assert got.lift.min() >= full.lift.max() - 1e-9 or len(got) == 50


def test_lpa_two_cliques_stay_separate(spark):
    # two 4-cliques joined by nothing: labels converge to each
    # clique's smallest node id
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges += [(a + 10, b + 10) for a, b in edges]
    ev = spark.createDataFrame(
        [(s, d) for s, d in edges] + [(d, s) for s, d in edges],
        "src long, dst long")
    labels = {r["node"]: r["label"] for r in lpa_labels(ev, 3).collect()}
    assert {labels[n] for n in range(4)} == {0}
    assert {labels[n + 10] for n in range(4)} == {10}


def test_lpa_star_absorbs_leaves(spark):
    # star 0-(1..5): leaves see only the hub; hub sees leaf labels.
    # After round 1 every leaf holds 0; the hub holds min leaf = 1.
    ev = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)],
        "src long, dst long")
    labels = {r["node"]: r["label"] for r in lpa_labels(ev, 1).collect()}
    assert all(labels[i] == 0 for i in range(1, 6))
    assert labels[0] == 1


def test_interpolation_recomputed_in_pandas(spark):
    got = (engine.QUERIES["timeseries_interpolate_linear"]
           .fn(spark, SMOKE_DIR).toPandas())
    gaps = got[~got.observed]
    assert len(gaps) > 0, "fixture must have gap hours"
    ev = (spark.read.parquet(f"{SMOKE_DIR}/events.parquet").toPandas())
    ev["h"] = ev.ts.dt.floor("h")
    hourly = (ev.groupby(["event_type", "h"]).value
              .agg(lambda s: float(s.round(2).sum())))
    for et, sub in got.groupby("event_type"):
        sub = sub.sort_values("hour").reset_index(drop=True)
        ts = pd.to_datetime(sub.hour)
        known = hourly[et]
        series = pd.Series(
            [known.get(t, np.nan) for t in ts], index=ts.to_numpy())
        ref = series.interpolate(method="index",
                                 limit_direction="both").round(6)
        assert np.allclose(sub.interp_value.to_numpy(), ref.to_numpy(),
                           atol=1e-6), et


def test_dp_noise_is_the_documented_inverse_cdf(spark):
    got = engine.QUERIES["agg_dp_noisy_counts"].fn(spark, SMOKE_DIR).collect()
    ev = spark.read.parquet(f"{SMOKE_DIR}/events.parquet")
    true_n = {r["event_type"]: r["cnt"] for r in
              ev.groupBy("event_type").count()
              .withColumnRenamed("count", "cnt").collect()}
    assert got
    for r in got:
        u = int(hashlib.md5(r["event_type"].encode()).hexdigest()[:6], 16) \
            / 16777216.0
        t = u - 0.5
        noise = -DP_SCALE * math.copysign(1.0, t) \
            * round(math.log(1.0 - 2.0 * abs(t)), 6)
        assert math.isclose(r["noisy_n"],
                            round(true_n[r["event_type"]] + noise, 6),
                            abs_tol=1e-6)
        assert abs(r["noisy_n"] - true_n[r["event_type"]]) > 1e-9, \
            "noise must actually perturb the count"
        assert r["epsilon"] == round(1.0 / DP_SCALE, 6)


def test_k_anonymity_recomputed_in_pandas(spark):
    row = (engine.QUERIES["profile_k_anonymity"]
           .fn(spark, SMOKE_DIR).collect()[0])
    cust = (spark.read.parquet(f"{SMOKE_DIR}/customer.parquet")
            .select("c_nationkey", "c_mktsegment").toPandas())
    sizes = cust.groupby(["c_nationkey", "c_mktsegment"]).size()
    below = sizes[sizes < K_ANON]
    assert row["n_groups"] == len(sizes)
    assert row["k_anonymity"] == sizes.min()
    assert row["groups_below_k"] == len(below)
    assert row["rows_at_risk"] == int(below.sum())
    assert math.isclose(row["at_risk_fraction"],
                        round(below.sum() / sizes.sum(), 6), abs_tol=1e-6)


def test_group_aware_split_is_leakage_free(spark):
    docs = (spark.read.parquet(f"{SMOKE_DIR}/documents.parquet")
            .select("source", "doc_id").toPandas())
    got = (engine.QUERIES["split_group_aware"]
           .fn(spark, SMOKE_DIR).toPandas())
    # every source lands in exactly one split (the group-hash property)
    def split_of(src: str) -> str:
        h = hashlib.md5(src.encode()).hexdigest()[:2]
        return "train" if h < "cc" else ("valid" if h < "e6" else "test")
    per = docs.assign(split=docs.source.map(split_of))
    sizes = per.groupby("split").agg(n_sources=("source", "nunique"),
                                     n_docs=("doc_id", "size"))
    for r in got.itertuples():
        assert sizes.loc[r.split, "n_sources"] == r.n_sources
        assert sizes.loc[r.split, "n_docs"] == r.n_docs
    assert got.n_docs.sum() == len(docs)


def test_cusum_equals_clamped_recurrence(spark):
    got = (engine.QUERIES["timeseries_cusum_changepoint"]
           .fn(spark, SMOKE_DIR).toPandas().set_index("event_type"))
    ev = spark.read.parquet(f"{SMOKE_DIR}/events.parquet").toPandas()
    ev["h"] = ev.ts.dt.floor("h")
    for et, sub in ev.groupby("event_type"):
        hours = pd.date_range(sub.h.min(), sub.h.max(), freq="h")
        x = sub.groupby("h").size().reindex(hours, fill_value=0)
        n, total = len(x), int(x.sum())
        c = best = 0
        best_h = hours[0]
        for h, xi in x.items():
            c = max(0, c + (n * int(xi) - total))
            if c > best:  # strict: first peak wins (h ASC tie-break)
                best, best_h = c, h
        assert got.loc[et, "n_hours"] == n
        assert math.isclose(got.loc[et, "cusum_peak"],
                            round(best / n, 6), abs_tol=1e-6)
        assert got.loc[et, "change_hour"] == best_h.strftime(
            "%Y-%m-%d %H:%M:%S")


def test_markov_rows_normalize_to_one(spark):
    got = (engine.QUERIES["events_markov_transitions"]
           .fn(spark, SMOKE_DIR).toPandas())
    assert len(got) > 0
    sums = got.groupby("prev_type").prob.sum()
    assert np.allclose(sums.to_numpy(), 1.0, atol=1e-4), sums
    # exact transition counts recomputed in pandas
    ev = (spark.read.parquet(f"{SMOKE_DIR}/events.parquet")
          .toPandas().sort_values(["user_id", "ts", "event_id"]))
    nxt = ev.groupby("user_id").event_type.shift(-1)
    ref = (pd.DataFrame({"prev_type": ev.event_type, "next_type": nxt})
           .dropna().groupby(["prev_type", "next_type"]).size())
    for r in got.itertuples():
        assert ref[(r.prev_type, r.next_type)] == r.n_transitions


def test_shannon_diversity_bounds(spark):
    got = (engine.QUERIES["profile_shannon_diversity"]
           .fn(spark, SMOKE_DIR).toPandas())
    assert len(got) > 0
    # 0 <= H <= ln(n_langs); single-lang sources have H == 0
    assert (got.entropy >= -1e-9).all()
    assert (got.entropy <= np.log(got.n_langs) + 1e-6).all()
    single = got[got.n_langs == 1]
    if len(single):
        assert (single.entropy.abs() < 1e-9).all()


def test_random_projection_matches_numpy(spark):
    """The Spark-side JL projection must equal the numpy projection of
    the same constant sign matrix (mechanism equality), and the
    reported exact cosine must equal the raw-space cosine for each
    reported pair. Top-k recall at RP_DIM=16 over 64-d near-uniform
    vectors is LOW by JL math (~0.1 at this fixture; ε ≈ √(ln n / d))
    — which is exactly why the operator reports both cosines: the
    degradation is observable in the result, not hidden behind it."""
    from new_data_pipeline_spark.operators.random_projection import (
        RP_QUERIES, SIGNS)

    got = (engine.QUERIES["sim_random_projection_topk"]
           .fn(spark, SMOKE_DIR).toPandas())
    assert set(got.query_id) == set(range(RP_QUERIES))
    emb = (spark.read.parquet(f"{SMOKE_DIR}/embeddings.parquet")
           .toPandas())
    V = {r.vec_id: np.array(r.embedding, float) for r in emb.itertuples()}
    S = np.array(SIGNS, float)
    for r in got.itertuples():
        qp, cp = S @ V[r.query_id], S @ V[r.candidate_id]
        pref = float(qp @ cp / (np.linalg.norm(qp) * np.linalg.norm(cp)))
        assert math.isclose(r.proj_cosine, round(pref, 4), abs_tol=2e-4)
        qv, cv = V[r.query_id], V[r.candidate_id]
        xref = float(qv @ cv / (np.linalg.norm(qv) * np.linalg.norm(cv)))
        assert math.isclose(r.exact_cosine, round(xref, 4), abs_tol=2e-4)


def test_streak_islands_recomputed_in_pandas(spark):
    got = (engine.QUERIES["events_streak_islands"]
           .fn(spark, SMOKE_DIR).toPandas())
    assert len(got) > 0
    ev = (spark.read.parquet(f"{SMOKE_DIR}/events.parquet").toPandas()
          .sort_values(["user_id", "ts", "event_id"]))
    change = ((ev.event_type != ev.groupby("user_id").event_type.shift())
              | (ev.user_id != ev.user_id.shift()))
    ev["island"] = change.cumsum()
    ref = (ev.groupby("island")
           .agg(user_id=("user_id", "first"),
                event_type=("event_type", "first"),
                streak_len=("event_id", "size"),
                streak_start=("ts", "min")))
    ref_sorted = ref.sort_values(
        ["streak_len", "user_id", "streak_start", "event_type"],
        ascending=[False, True, True, True]).head(len(got))
    for r, (_, e) in zip(got.itertuples(), ref_sorted.iterrows()):
        assert (r.user_id, r.event_type, r.streak_len) == (
            e.user_id, e.event_type, e.streak_len)
        assert r.streak_start == e.streak_start.strftime(
            "%Y-%m-%d %H:%M:%S")


def test_lpa_frontier_equals_full_sweep(spark):
    """VERDICT r10 #4: the changed-frontier variant must be
    BIT-identical to the every-node recount at every round budget —
    including budgets past the fixed point, where the frontier path
    early-exits."""
    import random

    rng = random.Random(7)
    # random graph with enough structure for multi-round label churn
    edges = {(rng.randrange(60), rng.randrange(60)) for _ in range(150)}
    edges = [(a, b) for a, b in edges if a != b]
    ev = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "src long, dst long")
    for rounds in (1, 2, 3, 6):
        full = {(r["node"], r["label"])
                for r in lpa_labels(ev, rounds, frontier=False).collect()}
        fast = {(r["node"], r["label"])
                for r in lpa_labels(ev, rounds, frontier=True).collect()}
        assert fast == full, f"frontier diverged at rounds={rounds}"
    spark.catalog.clearCache()

def test_rp_ivf_composition_mechanism(spark):
    """VERDICT r10 #6: the composed JL→IVF gate must (a) restrict each
    query's candidates to members of its probed IVF cells in the
    PROJECTED space (replayed in numpy from the same sign matrix and
    centroid rule), and (b) report projected and exact cosines that
    match numpy for every reported pair — proving the index was built
    on projected vectors and the 64-d originals survive for the
    exact-cosine report."""
    from new_data_pipeline_spark.operators.random_projection import (
        RP_QUERIES, RP_TOP_K, SIGNS)
    from new_data_pipeline_spark.operators.similarity import (
        IVF_CENT_RESIDUE, IVF_NPROBE, ivf_mod)

    got = (engine.QUERIES["sim_rp_ivf_topk"]
           .fn(spark, SMOKE_DIR).toPandas())
    assert set(got.query_id) <= set(range(RP_QUERIES))
    assert got.groupby("query_id").rn.max().max() <= RP_TOP_K
    emb = (spark.read.parquet(f"{SMOKE_DIR}/embeddings.parquet")
           .toPandas())
    V = {r.vec_id: np.array(r.embedding, float) for r in emb.itertuples()}
    S = np.array(SIGNS, float)
    P = {k: S @ v for k, v in V.items()}
    mod = ivf_mod(len(emb))
    res = IVF_CENT_RESIDUE % mod
    cents = {k: P[k] for k in V if k % mod == res}

    def cell_ranking(pv):
        # (ccos DESC, cent_id ASC) over all centroids
        return sorted(
            ((float(pv @ c / (np.linalg.norm(pv) * np.linalg.norm(c))),
              -cid) for cid, c in cents.items()),
            reverse=True)

    assign = {k: -cell_ranking(P[k])[0][1] for k in V}
    for r in got.itertuples():
        probed = {-t[1] for t in cell_ranking(P[r.query_id])[:IVF_NPROBE]}
        assert assign[r.candidate_id] in probed, \
            "candidate outside the query's probed cells"
        qp, cp = P[r.query_id], P[r.candidate_id]
        pref = float(qp @ cp / (np.linalg.norm(qp) * np.linalg.norm(cp)))
        assert math.isclose(r.proj_cosine, round(pref, 4), abs_tol=2e-4)
        qv, cv = V[r.query_id], V[r.candidate_id]
        xref = float(qv @ cv / (np.linalg.norm(qv) * np.linalg.norm(cv)))
        assert math.isclose(r.exact_cosine, round(xref, 4), abs_tol=2e-4)
