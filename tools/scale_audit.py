"""Scale-evidence audit (VERDICT r4 next-round #1): run the heavy
query family at 1x (sf0.1) and Nx (tools/make_scale_data.py output),
record wall-clock medians and the implied scaling exponent
alpha = log(t_Nx / t_1x) / log(N)  (alpha <= 1 = linear or better).

Usage:
    python tools/make_scale_data.py 10          # once
    python tools/scale_audit.py [reps]          # default 3

Prints one JSON line per query plus a BASELINE.md-ready markdown table.
"""
from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

BASE = os.environ.get("SCALE_BASE", "/root/testdata/sf0.1")
BIG = os.environ.get("SCALE_OUT", "/tmp/ndp_scale10")
FACTOR = int(os.environ.get("SCALE_FACTOR", "10"))

HEAVY = [
    "dedup_minhash_lsh",
    "dedup_simhash64_hamming",
    "dedup_cluster_components",
    "dedup_semdedup_cells",
    "join_set_similarity",
    "join_set_similarity_prefix",
    "graph_pagerank",
    "sim_pq_topk",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "sim_ivfpq_topk",
    "text_bpe_token_counts",
    "dedup_exact_substrings",
    # round 7: the CEP family (per-row Python DFA — linear by
    # construction, proven by measurement), the heavy text-curation
    # pipelines, and the multimodal codec chain
    "cep_stream_funnel",
    "events_pattern_skip_match",
    "text_contamination_ngrams",
    "corpus_e2e_curation",
    "dedup_ngram_jaccard",
    "multimodal_e2e_curation",
    # round 8: the new CEP pattern, both incremental-LSH variants
    # (whose first audits caught the cold-cache race), the oriented
    # triangle census, and the prefix-sum sharder
    "cep_branching_funnel",
    "dedup_incremental_lsh",
    "dedup_lsh_bucketed_probe",
    "graph_triangle_stats",
    "corpus_token_shards",
    # round 9: the DOULION sampled census (the 100 TB triangle path),
    # the re-ranged weighted median (VERDICT r8 #1), and the persisted
    # bucketed ANN probes (VERDICT r8 #5)
    "graph_triangle_doulion",
    "agg_weighted_median",
    "sim_ivf_bucketed_probe",
    "sim_ivfpq_bucketed_probe",
    "stream_neardup_filter",
    "text_nb_source_classifier",
    # round 10: the persisted PQ-only probe (VERDICT r9 #4), the
    # census→DOULION dispatcher (r9 #3 — the audit row should show it
    # picking DOULION at 10×), bounded-round k-core peeling, the
    # containment join, and the Gini rank device
    "sim_pq_bucketed_probe",
    "graph_triangle_census_auto",
    "graph_kcore_peeling",
    "join_set_containment",
    "profile_gini_concentration",
    "graph_link_prediction",
    # round 10 second wave: OLS/market-basket/LPA are the compute-
    # bearing additions (the interpolation/privacy ops are spine- or
    # |groups|-sized — audited once to confirm flat, not tracked)
    "ml_ols_regression",
    "ml_market_basket_lift",
    "graph_community_lpa",
    # round 11: the kcore dispatcher (the audit row should show it
    # peeling the p=1/4 sample at 10×, retiring r10's one weak alpha)
    # and the JL-projection→IVF composition
    "graph_kcore_auto",
    "sim_rp_ivf_topk",
]


def main(reps: int = 3, only: list[str] | None = None) -> None:
    from new_data_pipeline_spark.bench_lock import acquire
    _lock = acquire("scale_audit")  # noqa: F841 — held until exit
    from new_data_pipeline_spark import registry  # noqa: F401
    import __spark_entry__ as entry

    # r14: audit under the ENGINE's session factory, not a hand-rolled
    # builder — the old builder lacked the tuned configs the product
    # actually runs (AQE minPartitionSize floor, SHJ rewrite, broadcast
    # threshold), and at 30x that measured a 100.7 s dedup_minhash_lsh
    # (alpha 1.16) where the engine session runs the same query in
    # 6.4 s (alpha ~0.5): small-byte CPU-dense shuffles coalesced onto
    # 1-2 tasks under the default 1m floor, serializing the verify
    # stage. Driver memory stays overridable for huge factors.
    from new_data_pipeline_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "96g")
    spark = get_spark(app_name="ndp-scale-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()

    rows = []
    for name in (only or HEAVY):
        fn = queries[name]
        rec = {"query": name}
        for tag, sf_dir in (("t1", BASE), (f"t{FACTOR}", BIG)):
            # discarded warmup per (query, dataset): JIT + codegen + FS
            # cache — without the BIG-side warmup, reps=1-2 inflates the
            # ratio with the 10x dataset's cold file-cache cost (ADVICE r5)
            fn(spark, sf_dir).count()
            spark.catalog.clearCache()
            times = []
            for _ in range(reps):
                t0 = time.monotonic()
                n = fn(spark, sf_dir).count()
                times.append(time.monotonic() - t0)
                spark.catalog.clearCache()
            rec[tag] = round(statistics.median(times), 2)
            rec[f"{tag}_rows"] = n
        ratio = rec[f"t{FACTOR}"] / max(rec["t1"], 1e-9)
        rec["ratio"] = round(ratio, 2)
        rec["alpha"] = round(math.log(max(ratio, 1e-9)) / math.log(FACTOR), 2)
        rows.append(rec)
        print(json.dumps(rec), flush=True)
        # clearCache() drops DataFrame persists but NOT localCheckpoint
        # RDD blocks, whose py4j references linger until Python GC runs
        # — a 30-query sweep accumulated enough to poison later rows
        # (dedup_incremental_lsh 5.1 s isolated vs 158.9 s late in a
        # sweep). Collect per query so ContextCleaner can release them.
        import gc

        gc.collect()

    print("\n| query | t(1x) s | t(%dx) s | ratio | alpha |" % FACTOR)
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['query']} | {r['t1']} | {r[f't{FACTOR}']} "
              f"| {r['ratio']} | {r['alpha']} |")
    spark.stop()


if __name__ == "__main__":
    # argv: [reps] [query ...] — a non-integer first arg is a query name
    _argv = sys.argv[1:]
    _reps = 3
    if _argv and _argv[0].isdigit():
        _reps = int(_argv[0])
        _argv = _argv[1:]
    main(_reps, _argv or None)
