"""Golden tests for the round-11 operators: each pins the SEMANTICS
against an independent reference (numpy / pandas recomputation) — the
oracle-parity suite already proves Spark == DuckDB; these prove both
equal the intended algorithm."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

import new_data_pipeline_spark as engine
from tests.conftest import SF_DIR, SMOKE_DIR

engine.load_all()


def test_split_stratified_hits_exact_quotas_and_membership(spark):
    """Every stratum's split sizes must equal the floor quotas
    EXACTLY, and the membership must equal the within-stratum md5-rank
    replay (sum_doc_ids pins which docs landed where, not just how
    many)."""
    from new_data_pipeline_spark.operators.sampling import (
        STRAT_TRAIN_PCT, STRAT_VALID_PCT)

    got = (engine.QUERIES["split_stratified"].fn(spark, SMOKE_DIR)
           .toPandas().set_index(["lang", "split"]))
    docs = (spark.read.parquet(f"{SMOKE_DIR}/documents.parquet")
            .select("doc_id", "lang", "n_chars").toPandas())
    for lang, g in docs.groupby("lang"):
        n = len(g)
        order = sorted(
            g.doc_id, key=lambda d: (hashlib.md5(str(d).encode())
                                     .hexdigest(), d))
        n_train = n * STRAT_TRAIN_PCT // 100
        n_valid = n * STRAT_VALID_PCT // 100 - n_train
        want = {"train": order[:n_train],
                "valid": order[n_train:n_train + n_valid],
                "test": order[n_train + n_valid:]}
        for split, members in want.items():
            if not members:
                assert (lang, split) not in got.index
                continue
            row = got.loc[(lang, split)]
            assert row.n_docs == len(members)
            assert row.sum_doc_ids == sum(members)
            chars = g.set_index("doc_id").n_chars
            assert math.isclose(
                row.avg_chars,
                round(sum(chars[m] for m in members) / len(members), 6),
                abs_tol=1e-9)


def test_join_key_skew_matches_pandas(spark):
    from new_data_pipeline_spark.operators.profiling import SKEW_TOP_KEYS

    got = (engine.QUERIES["profile_join_key_skew"].fn(spark, SMOKE_DIR)
           .collect()[0])
    li = (spark.read.parquet(f"{SMOKE_DIR}/lineitem.parquet")
          .select("l_partkey").toPandas())
    freq = li.l_partkey.value_counts()
    assert got["n_keys"] == len(freq)
    assert got["n_rows"] == len(li)
    assert got["max_freq"] == freq.max()
    assert math.isclose(got["avg_freq"],
                        round(len(li) / len(freq), 6), abs_tol=1e-9)
    assert math.isclose(got["skew_ratio"],
                        round(freq.max() * len(freq) / len(li), 6),
                        abs_tol=1e-9)
    # deterministic top-K cut: cnt DESC, key ASC
    top = (freq.rename_axis("key").reset_index(name="cnt")
           .sort_values(["cnt", "key"], ascending=[False, True])
           .head(SKEW_TOP_KEYS))
    assert math.isclose(got[f"top{SKEW_TOP_KEYS}_share"],
                        round(top.cnt.sum() / len(li), 6), abs_tol=1e-9)


def test_tfidf_retrieval_matches_pandas_inverted_index(spark):
    """Replay the whole sparse pipeline in pandas — trigram shingles,
    df cap, rounded-decimal weights, pruned-space norms, cosine, and
    the (cos DESC, candidate) top-k — and require identical rows."""
    from new_data_pipeline_spark.operators.sparse_retrieval import (
        DF_CAP, RETR_QUERIES, RETR_TOP_K, SHINGLE_W)

    got = (engine.QUERIES["text_tfidf_retrieval"].fn(spark, SMOKE_DIR)
           .toPandas())
    docs = (spark.read.parquet(f"{SMOKE_DIR}/documents.parquet")
            .select("doc_id", "text").toPandas())
    n_docs = len(docs)
    postings: dict[int, dict[str, int]] = {}
    for r in docs.itertuples():
        wsx = r.text.split(" ")
        if len(wsx) < SHINGLE_W:
            continue
        d = postings.setdefault(r.doc_id, {})
        for i in range(len(wsx) - SHINGLE_W + 1):
            t = " ".join(wsx[i:i + SHINGLE_W])
            d[t] = d.get(t, 0) + 1
    df_cnt: dict[str, int] = {}
    for d in postings.values():
        for t in d:
            df_cnt[t] = df_cnt.get(t, 0) + 1
    weights = {
        doc: {t: round(tf * math.log((n_docs + 1) / (df_cnt[t] + 1)), 6)
              for t, tf in d.items() if df_cnt[t] <= DF_CAP}
        for doc, d in postings.items()}
    norms = {doc: math.sqrt(sum(w * w for w in d.values()))
             for doc, d in weights.items() if d}
    rows = []
    for q in range(RETR_QUERIES):
        qw = weights.get(q, {})
        scored = []
        for c, cw in weights.items():
            if c == q:
                continue
            shared = set(qw) & set(cw)
            if not shared:
                continue
            dot = sum(qw[t] * cw[t] for t in shared)
            scored.append((q, c, len(shared),
                           dot / (norms[q] * norms[c])))
        scored.sort(key=lambda x: (-x[3], x[1]))
        for rn, (qq, c, ns, cos) in enumerate(scored[:RETR_TOP_K], 1):
            rows.append((qq, c, ns, round(cos, 4), rn))
    want = pd.DataFrame(rows, columns=[
        "query_id", "candidate_id", "n_shared_terms", "cosine", "rn"])
    got = got.sort_values(["query_id", "rn"]).reset_index(drop=True)
    want = want.sort_values(["query_id", "rn"]).reset_index(drop=True)
    assert len(got) == len(want)
    for g, w in zip(got.itertuples(), want.itertuples()):
        assert (g.query_id, g.candidate_id, g.n_shared_terms, g.rn) == \
            (w.query_id, w.candidate_id, w.n_shared_terms, w.rn)
        assert math.isclose(g.cosine, w.cosine, abs_tol=2e-4)


def test_tfidf_retrieval_df_cap_drops_boilerplate(spark):
    """The df cap must actually prune: with the cap forced to 0 every
    posting dies and the retrieval returns no rows (the mechanism the
    fixture's low-df trigrams never exercise)."""
    import new_data_pipeline_spark.operators.sparse_retrieval as sr

    orig = sr.DF_CAP
    sr.DF_CAP = 0
    try:
        assert sr.text_tfidf_retrieval(spark, SMOKE_DIR).count() == 0
    finally:
        sr.DF_CAP = orig


def test_seasonal_decompose_matches_pandas(spark):
    """Replay the centered-MA detrend + hour-of-day means in pandas.
    Runs at SF_DIR (the gate scale): the sf0.001 smoke series is so
    gappy that no 25-hour frame is ever complete and the result is
    legitimately empty there."""
    from new_data_pipeline_spark.operators.reshaping import (
        SEAS_HALF, SEAS_W)

    got = (engine.QUERIES["timeseries_seasonal_decompose"]
           .fn(spark, SF_DIR).toPandas())
    assert len(got) > 0
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").toPandas()
    ev["h"] = ev.ts.dt.floor("h")
    ev["v"] = ev.value.round(2)
    hourly = ev.groupby(["event_type", "h"]).v.sum().reset_index()
    hourly["hidx"] = (hourly.h.astype("int64") // 10**9 // 3600)
    rows = {}
    for et, g in hourly.groupby("event_type"):
        g = g.sort_values("hidx").reset_index(drop=True)
        idx = dict(zip(g.hidx, g.v))
        for _, r in g.iterrows():
            frame = [idx[i] for i in range(r.hidx - SEAS_HALF,
                                           r.hidx + SEAS_HALF + 1)
                     if i in idx]
            if len(frame) != SEAS_W:
                continue
            d = SEAS_W * r.v - sum(frame)
            key = (et, r.h.hour)
            rows.setdefault(key, []).append(d)
    for r in got.itertuples():
        ds = rows[(r.event_type, r.hour_of_day)]
        assert r.n_hours == len(ds)
        assert math.isclose(r.seasonal,
                            round(sum(ds) / (SEAS_W * len(ds)), 6),
                            abs_tol=1e-6)
    assert len(got) == len(rows)


def test_attribution_matches_pandas(spark):
    """Replay the 24h-lookback touch join and all three credit models
    in pandas; scaled-integer linear credits must match exactly."""
    from new_data_pipeline_spark.operators.attribution import (
        CONV_TYPE, LINEAR_SCALE, LOOKBACK_HOURS)

    got = (engine.QUERIES["events_attribution"].fn(spark, SMOKE_DIR)
           .toPandas().set_index("channel"))
    ev = spark.read.parquet(f"{SMOKE_DIR}/events.parquet").toPandas()
    conv = ev[ev.event_type == CONV_TYPE]
    touch = ev[ev.event_type != CONV_TYPE]
    first = {}
    last = {}
    micro = {}
    lb = pd.Timedelta(hours=LOOKBACK_HOURS)
    for c in conv.itertuples():
        t = touch[(touch.user_id == c.user_id) & (touch.ts < c.ts)
                  & (touch.ts >= c.ts - lb)]
        if not len(t):
            continue
        t = t.sort_values(["ts", "event_id"])
        first[t.iloc[0].event_type] = first.get(t.iloc[0].event_type, 0) + 1
        last[t.iloc[-1].event_type] = last.get(t.iloc[-1].event_type, 0) + 1
        per = LINEAR_SCALE // len(t)
        for ch, cnt in t.event_type.value_counts().items():
            micro[ch] = micro.get(ch, 0) + cnt * per
    assert set(got.index) == set(micro)
    for ch in micro:
        r = got.loc[ch]
        assert r.first_touch == first.get(ch, 0)
        assert r.last_touch == last.get(ch, 0)
        assert r.linear_micro == micro[ch]
        assert math.isclose(r.linear_credit,
                            round(micro[ch] / LINEAR_SCALE, 6),
                            abs_tol=1e-9)


def test_lsh_recall_eval_matches_brute_force(spark):
    """Replay ground truth AND the banded candidate generator in pure
    Python over the sample; the confusion counts must match, and the
    metrics must be consistent with them."""
    from new_data_pipeline_spark.operators.dedup import (
        EVAL_SAMPLE_MAX, JACCARD_THRESHOLD, MINHASH_A, MINHASH_B,
        MINHASH_BANDS, MINHASH_K, MINHASH_P, MINHASH_R, SHINGLE_W)

    got = (engine.QUERIES["dedup_lsh_recall_eval"].fn(spark, SMOKE_DIR)
           .collect()[0])
    docs = (spark.read.parquet(f"{SMOKE_DIR}/documents.parquet")
            .filter(f"doc_id < {EVAL_SAMPLE_MAX}")
            .select("doc_id", "text").toPandas())
    hs = {}
    for r in docs.itertuples():
        toks = r.text.split(" ")
        if len(toks) < SHINGLE_W:
            continue
        sh = {" ".join(toks[i:i + SHINGLE_W])
              for i in range(len(toks) - SHINGLE_W + 1)}
        hs[r.doc_id] = {int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                        for s in sh}
    ids = sorted(hs)
    truth = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
             if len(hs[a] & hs[b]) / len(hs[a] | hs[b])
             >= JACCARD_THRESHOLD}
    buckets = {}
    for d in ids:
        sig = [min((MINHASH_A[k] * (h % MINHASH_P) + MINHASH_B[k])
                   % MINHASH_P for h in hs[d]) for k in range(MINHASH_K)]
        for b in range(MINHASH_BANDS):
            key = (b, ",".join(str(sig[MINHASH_R * b + j])
                               for j in range(MINHASH_R)))
            buckets.setdefault(key, []).append(d)
    cand = {(a, b) for mem in buckets.values()
            for i, a in enumerate(mem) for b in mem[i + 1:] if a < b}
    cand |= {(b, a) for mem in buckets.values()
             for i, a in enumerate(mem) for b in mem[i + 1:] if a > b}
    tp = len(truth & cand)
    assert got["n_docs"] == len(ids)
    assert got["n_true_pairs"] == len(truth)
    assert got["n_candidates"] == len(cand)
    assert got["tp"] == tp
    assert got["fp"] == len(cand) - tp
    assert got["fn"] == len(truth) - tp
    if cand:
        assert math.isclose(got["cand_precision"],
                            round(tp / len(cand), 6), abs_tol=1e-9)
    if truth:
        assert math.isclose(got["pair_recall"],
                            round(tp / len(truth), 6), abs_tol=1e-9)


def test_bm25_retrieval_matches_pandas(spark):
    """Replay the BM25 pipeline in pure Python (ln-first 6-dp rounding,
    length normalization, decimal-exact score sums) and require
    identical rankings and scores."""
    from decimal import Decimal

    from new_data_pipeline_spark.operators.sparse_retrieval import (
        BM25_B, BM25_K1, DF_CAP, RETR_QUERIES, RETR_TOP_K, SHINGLE_W)

    got = (engine.QUERIES["text_bm25_retrieval"].fn(spark, SMOKE_DIR)
           .toPandas())
    docs = (spark.read.parquet(f"{SMOKE_DIR}/documents.parquet")
            .select("doc_id", "text").toPandas())
    tf: dict[int, dict[str, int]] = {}
    for r in docs.itertuples():
        wsx = r.text.split(" ")
        if len(wsx) < SHINGLE_W:
            continue
        d = tf.setdefault(r.doc_id, {})
        for i in range(len(wsx) - SHINGLE_W + 1):
            t = " ".join(wsx[i:i + SHINGLE_W])
            d[t] = d.get(t, 0) + 1
    dl = {doc: sum(d.values()) for doc, d in tf.items()}
    n = len(dl)
    avgdl = sum(dl.values()) / n
    df_cnt: dict[str, int] = {}
    for d in tf.values():
        for t in d:
            df_cnt[t] = df_cnt.get(t, 0) + 1
    weights = {}
    for doc, d in tf.items():
        weights[doc] = {}
        for t, f in d.items():
            if df_cnt[t] > DF_CAP:
                continue
            idf = round(math.log(1.0 + (n - df_cnt[t] + 0.5)
                                 / (df_cnt[t] + 0.5)), 6)
            w = round(idf * (f * (BM25_K1 + 1.0))
                      / (f + BM25_K1 * (1.0 - BM25_B
                                        + BM25_B * dl[doc] / avgdl)), 6)
            weights[doc][t] = Decimal(f"{w:.6f}")
    rows = []
    for q in range(RETR_QUERIES):
        qterms = set(tf.get(q, {}))
        scored = []
        for c, cw in weights.items():
            if c == q:
                continue
            shared = qterms & set(cw)
            if not shared:
                continue
            score = float(sum(cw[t] for t in shared))
            scored.append((c, len(shared), score))
        scored.sort(key=lambda x: (-x[2], x[0]))
        for rn, (c, ns, s) in enumerate(scored[:RETR_TOP_K], 1):
            rows.append((q, c, ns, s, rn))
    want = {(r[0], r[1]): r for r in rows}
    assert len(got) == len(want)
    for g in got.itertuples():
        w = want[(g.query_id, g.candidate_id)]
        assert (g.n_shared_terms, g.rn) == (w[2], w[4])
        assert math.isclose(g.bm25, w[3], abs_tol=1e-9)


def test_kmeans_lloyd_matches_numpy_two_rounds(spark):
    """Replay both Lloyd rounds in numpy — seeded assignment,
    6-dp-quantized decimal mean update, re-assignment — and require the
    identical trace; the objective must not decrease (Lloyd's
    guarantee under the spherical objective)."""
    from decimal import Decimal

    from new_data_pipeline_spark.operators.clustering import (
        K_RESIDUE, cells_mod)

    got = (engine.QUERIES["cluster_kmeans_lloyd"].fn(spark, SMOKE_DIR)
           .toPandas().set_index("round"))
    emb = (spark.read.parquet(f"{SMOKE_DIR}/embeddings.parquet")
           .toPandas())
    V = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
         for r in emb.itertuples()}
    mod = cells_mod(len(V))
    res = K_RESIDUE % mod
    cents = {k: V[k] for k in V if k % mod == res}

    def assign(cts):
        out = {}
        for vid, v in V.items():
            nv = math.sqrt(float((v * v).sum()))
            best = None
            for cid in sorted(cts):
                c = cts[cid]
                cos = float(v @ c) / (nv * math.sqrt(float((c * c).sum())))
                if best is None or cos > best[0] or (
                        cos == best[0] and cid < best[1]):
                    best = (cos, cid)
            out[vid] = best
        return out

    a1 = assign(cents)
    # decimal-exact quantized mean update
    members = {}
    for vid, (_, cid) in a1.items():
        members.setdefault(cid, []).append(vid)
    cents2 = {}
    for cid, vids in members.items():
        comp = []
        for d in range(len(next(iter(V.values())))):
            s = sum(Decimal(f"{round(float(V[m][d]), 6):.6f}")
                    for m in vids)
            comp.append(float(s) / len(vids))
        cents2[cid] = np.asarray(comp)
    a2 = assign(cents2)

    def mean_cos(a):
        s = sum(Decimal(f"{round(c, 6):.6f}") for c, _ in a.values())
        return round(float(s) / len(a), 6)

    assert got.loc[1].n_cells == len({c for _, c in a1.values()})
    assert got.loc[2].n_cells == len({c for _, c in a2.values()})
    assert got.loc[2].n_moved == sum(
        1 for vid in a1 if a1[vid][1] != a2[vid][1])
    assert math.isclose(got.loc[1].mean_cos, mean_cos(a1), abs_tol=2e-6)
    assert math.isclose(got.loc[2].mean_cos, mean_cos(a2), abs_tol=2e-6)
    assert got.loc[2].mean_cos >= got.loc[1].mean_cos - 1e-9
