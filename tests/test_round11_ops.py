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
from tests.conftest import SMOKE_DIR

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
