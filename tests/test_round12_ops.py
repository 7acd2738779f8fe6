"""Golden tests for the round-12 operators — semantics pinned against
independent recomputation (the oracle-parity suite already proves
Spark == DuckDB; these prove both equal the intended algorithm)."""

from __future__ import annotations

import hashlib
import math

import new_data_pipeline_spark as engine
from tests.conftest import SMOKE_DIR

engine.load_all()


def test_temperature_mixture_matches_pure_python_replay(spark):
    """Quota arithmetic and the coin-selected document sets must equal
    a pure-Python replay of the spec (sqrt -> 6dp micro-units ->
    integer quota -> md5 coin at quota/n)."""
    from new_data_pipeline_spark.operators.sampling import (
        _COIN_BITS, _COIN_MOD, MIX_BUDGET_DOCS)

    got = {r["source"]: r for r in
           engine.QUERIES["sample_temperature_mixture"]
           .fn(spark, SMOKE_DIR).collect()}
    docs = (spark.read.parquet(f"{SMOKE_DIR}/documents.parquet")
            .select("doc_id", "source").collect())
    by_src: dict[str, list[int]] = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    w_u = {s: round(round(math.sqrt(len(ids)), 6) * 1_000_000)
           for s, ids in by_src.items()}
    tot_u = sum(w_u.values())
    assert set(got) == set(by_src)
    budget_used = 0
    for s, ids in by_src.items():
        n = len(ids)
        quota = (MIX_BUDGET_DOCS * w_u[s]) // tot_u
        coin = lambda d: int(hashlib.md5(str(d).encode())
                             .hexdigest()[:_COIN_BITS // 4], 16)
        n_sampled = sum(1 for d in ids if coin(d) * n < quota * _COIN_MOD)
        row = got[s]
        assert row["n_docs"] == n, s
        assert row["w_u"] == w_u[s], s
        assert row["mix_bp"] == (10000 * w_u[s]) // tot_u, s
        assert row["quota"] == quota, s
        assert row["n_sampled"] == n_sampled, s
        budget_used += quota
    # floor quotas never overshoot the budget
    assert budget_used <= MIX_BUDGET_DOCS


def test_ann_recall_eval_counts_match_direct_set_intersection(spark):
    """Each family's (n_retrieved, tp, fn, recall_bp) must equal the
    set arithmetic over the family's own retrieved pairs and the
    brute-force truth restricted to the family's query ids."""
    from new_data_pipeline_spark.operators.ann_eval import _FAMILIES
    from new_data_pipeline_spark.operators.similarity import (
        sim_bruteforce_topk)

    got = {r["family"]: r for r in
           engine.QUERIES["sim_ann_recall_eval"].fn(spark, SMOKE_DIR)
           .collect()}
    assert set(got) == set(_FAMILIES)

    truth = {(r["query_id"], r["candidate_id"])
             for r in sim_bruteforce_topk(spark, SMOKE_DIR)
             .select("query_id", "candidate_id").collect()}
    for fam, fn in _FAMILIES.items():
        pairs = [(r["query_id"], r["candidate_id"])
                 for r in fn(spark, SMOKE_DIR)
                 .select("query_id", "candidate_id").collect()]
        qids = {q for q, _ in pairs}
        fam_truth = {t for t in truth if t[0] in qids}
        # ADVICE r12: recall_bp divides by n_truth — a family with an
        # empty truth set would be an asymmetric failure (DuckDB's //
        # errors, Spark's DIV NULLs). The query itself drops such a
        # family symmetrically (COUNT GROUP BY emits no row, the inner
        # join removes it on both engines), but the eval is only
        # meaningful when every family HAS truth — pin that here.
        assert fam_truth, f"family {fam} has an empty truth set"
        tp = len(set(pairs) & fam_truth)
        row = got[fam]
        assert row["n_retrieved"] == len(pairs), fam
        assert row["tp"] == tp, fam
        assert row["fn"] == len(fam_truth) - tp, fam
        assert row["recall_bp"] == (10000 * tp) // len(fam_truth), fam
        assert 0 <= row["recall_bp"] <= 10000, fam
    spark.catalog.clearCache()


def test_hierarchy_doubling_matches_recursive_python_walk(spark):
    """Pointer doubling must resolve the same (root, depth) per node as
    a plain recursive walk, and the rollups must equal the per-root
    recomputation — including the decimal-exact retail sums."""
    from decimal import Decimal

    from new_data_pipeline_spark.operators.hierarchy import HIER_FANOUT

    got = {r["root"]: r for r in
           engine.QUERIES["hierarchy_rollup_doubling"]
           .fn(spark, SMOKE_DIR).collect()}
    parts = (spark.read.parquet(f"{SMOKE_DIR}/part.parquet")
             .select("p_partkey", "p_retailprice").collect())
    want: dict[int, dict] = {}
    for r in parts:
        k, price = r["p_partkey"], r["p_retailprice"]
        depth, node = 0, k
        while node >= HIER_FANOUT:
            node //= HIER_FANOUT
            depth += 1
        agg = want.setdefault(node, {"n": 0, "d": 0, "s": Decimal(0)})
        agg["n"] += 1
        agg["d"] = max(agg["d"], depth)
        agg["s"] += Decimal(str(price)).quantize(Decimal("0.01"))
    assert set(got) == set(want)
    for root, w in want.items():
        g = got[root]
        assert g["n_nodes"] == w["n"], root
        assert g["max_depth"] == w["d"], root
        assert g["subtree_retail"] == float(w["s"]), root
    spark.catalog.clearCache()


def test_mutual_information_matches_pure_python(spark):
    """MI and chi-square must equal a contingency-table recomputation
    following the exact term spec (ln 6dp -> term 9dp -> decimal
    sum)."""
    from decimal import Decimal

    got = (engine.QUERIES["profile_mutual_information"]
           .fn(spark, SMOKE_DIR).collect())
    assert len(got) == 1
    row = got[0]
    docs = (spark.read.parquet(f"{SMOKE_DIR}/documents.parquet")
            .select("lang", "source").collect())
    from collections import Counter
    cxy = Counter((r["lang"], r["source"]) for r in docs)
    nx = Counter(r["lang"] for r in docs)
    ny = Counter(r["source"] for r in docs)
    n = len(docs)
    mi = Decimal(0)
    chi = Decimal(0)
    for (x, y), c in cxy.items():
        ratio = (float(n) * c) / (float(nx[x]) * ny[y])
        mi += Decimal(str(round((c / float(n))
                                * round(math.log(ratio), 6), 9)))
        e = (float(nx[x]) * ny[y]) / n
        chi += Decimal(str(round((c - e) * (c - e) / e, 9)))
    assert row["n_docs"] == n
    assert row["n_langs"] == len(nx)
    assert row["n_sources"] == len(ny)
    assert row["n_cells"] == len(cxy)
    assert row["mi_nats"] == float(mi)
    assert row["chi2"] == float(chi)
    assert row["mi_nats"] >= -1e-9   # MI is non-negative up to rounding
    spark.catalog.clearCache()
