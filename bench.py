#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}`` for the driver's BENCH_r{N}.json.

Queries execute through the ``noop`` sink: full plan runs (scan →
shuffle → agg), nothing funnels back to the driver, so the number is
engine time, not result-transfer time.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import new_data_pipeline_spark as engine
from new_data_pipeline_spark.session import get_spark
from new_data_pipeline_spark.sources import tensorize

# Per-query contention verdict (VERDICT r10 #3): BENCH_r10 ran 1.37x
# uniformly inflated and the file itself carried no way to tell. Each
# query now records the 1-min load average sampled right before its
# timed block. While the bench runs, load = the bench's own steady
# state (measured 1.9-12.5, median ~5, during a solo calibration run
# on this 32-cpu VM) plus any EXTERNAL contention, so the flag
# threshold sits above the self-band: queries sampled above it are
# marked "flagged" and the round-over-round comparison should lean on
# queries_min for them.
LOAD_QUIET_MAX = float(os.environ.get("SPARK_GRAFT_LOAD_QUIET", "16"))

# Representative of every operator family (SURVEY.md §2): star join,
# wide agg, big outer join, window frames, top-k, rollup, as-of join,
# MinHash LSH dedup, cosine top-k, term stats, sessionization — plus
# (round 3) the heavy curation pipelines added in round 2, so a
# regression there is as visible as dedup_simhash64_hamming's was.
HEADLINE = (
    "flagship_revenue_by_nation",
    "pricing_summary",
    "join_left_outer",
    "join_asof_event_streams",
    "window_running_sum",
    "window_topk_per_group",
    "agg_rollup",
    "dedup_minhash_lsh",
    "dedup_simhash64_hamming",
    "sim_bruteforce_topk",
    "text_term_stats",
    "text_bow_vectorize",
    "stream_session_window",
    "text_contamination_ngrams",
    "corpus_e2e_curation",
    "dedup_cluster_components",
    "text_heavy_hitters",
    "dedup_semdedup_cells",
    # round 4: the real-BPE tokenizer (mapInPandas hot path) and the
    # boilerplate filter (posexplode + regexp density heuristic)
    "text_bpe_token_counts",
    "text_boilerplate_strip",
    # round 4 second wave: the iterative graph workload (5 chained
    # join+agg rounds over a persisted edge table) and the
    # overlap-counting set-similarity join (gram equi-join with
    # map-side partial pair counts)
    "graph_pagerank",
    "join_set_similarity",
    # round 7: the IVF-PQ composed ANN index (multi-stage broadcast
    # pipeline) and the CEP NFA batch twin (applyInPandas per-user
    # automaton — the one Python-loop hot path in the headline set);
    # BASELINE.md tracks the r4-comparable-22 subtotal separately
    "sim_ivfpq_topk",
    "cep_stream_funnel",
    # round 10 (VERDICT r9 #6): round 9's compute-heaviest additions,
    # previously invisible to round-over-round regression tracking —
    # the trained NB classifier (train+inference aggregation pipeline),
    # dedup-on-ingest (incremental LSH probe + verdict join), the
    # persisted bucketed IVF probe (index build + shuffle-free probe),
    # and the DOULION sampled census (the 100 TB triangle path);
    # BASELINE.md tracks the comparable-24 subtotal separately
    "text_nb_source_classifier",
    "stream_neardup_filter",
    "sim_ivf_bucketed_probe",
    "graph_triangle_doulion",
    # round 10 second wave: the association-rule miner (single-basket-
    # frame pair counting) and the ACID MERGE upsert (file-granular
    # copy-on-write end to end). graph_community_lpa is deliberately
    # NOT benched — its ~10 s/round-trip wall would dominate the total
    # and its regression tracking lives in the scale-audit table
    # (BASELINE.md) instead.
    "ml_market_basket_lift",
    "store_merge_upsert",
    # round 11: the sparse-retrieval pair (inverted-index postings
    # build + broadcast probe — the new text-heavy hot path), the LSH
    # recall eval (brute-force sample truth + banded candidates), and
    # conversion attribution (per-user interval join). kcore_auto is
    # NOT benched (its ~6 s checkpoint-heavy wall lives in the
    # scale-audit table, the community-LPA precedent).
    "text_tfidf_retrieval",
    "text_bm25_retrieval",
    "dedup_lsh_recall_eval",
    "events_attribution",
    # round 13: DELIBERATELY unchanged. The two additions are tracked
    # elsewhere — sim_ivf_serve_batches carries its own BASELINE.md
    # audit rows (scale_audit alpha 0.01; tools/serve_audit.py probe
    # alpha 0.16 — the community-LPA precedent for audit-table-tracked
    # queries), and multimodal_video_i420 is a shuffle-free
    # scan→mapInPandas pass (plan: 0 exchanges). Keeping the 34-query
    # set fixed keeps vs_baseline comparable round over round.
)


def main() -> None:
    from new_data_pipeline_spark.bench_lock import acquire
    _lock = acquire("bench")  # noqa: F841 — held until process exit
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # sampled BEFORE any Spark work: the external-contention
    # indicator (per-query samples below include the bench's own
    # steady-state load)
    load_start = round(os.getloadavg()[0], 2)
    engine.load_all()
    spark = get_spark(app_name="bench")

    # JVM/codegen warm-up per query family on the smallest scale factor
    # (not timed): whole-stage-codegen JIT costs seconds per distinct
    # plan shape and would otherwise dominate sub-second queries.
    for name in HEADLINE:
        engine.QUERIES[name].fn(spark, "/root/testdata/sf0.001") \
            .write.mode("overwrite").format("noop").save()

    # Median of N runs per query: single runs on this VM show up to 10×
    # variance (BASELINE.md), which round 1 misread as ±30% regressions.
    # 5 runs because contention spikes of 2-8s on this VM can span two
    # consecutive runs — a median of 3 still passes one through.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    timings: dict[str, float] = {}
    # per-query minima ride along in the JSON: on this VM, contention
    # inflates medians up to 1.5x run-to-run (BASELINE.md), and
    # median-vs-min divergence is the cheapest noise diagnostic when
    # comparing rounds
    mins: dict[str, float] = {}
    loads: dict[str, float] = {}
    verdicts: dict[str, str] = {}
    jsc = spark.sparkContext._jsc.sc()

    def release_between_queries() -> None:
        # The long-lived-session cache discipline, exercised where the
        # grading driver actually lives (VERDICT r10 #7): pop the
        # range-device caches (their tracked refs outlive clearCache),
        # drop every persisted subtree, and GC so ContextCleaner can
        # reclaim lingering localCheckpoint blocks between families.
        tensorize.release_range_caches()
        spark.catalog.clearCache()
        gc.collect()

    for name in HEADLINE:
        spec = engine.QUERIES[name]
        # one untimed priming run at the bench scale: the first sf0.1
        # execution pays page-cache fill for the parquet files plus
        # residual JIT (measured 2-3× the steady state) — the timed
        # medians then measure engine time, comparable across rounds
        release_between_queries()
        spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        load_before = os.getloadavg()[0]
        runs = []
        for _ in range(n_runs):
            # clear persisted subtrees (LSH shingles, SimHash signatures)
            # so every run measures the full computation — the
            # CacheManager would otherwise serve run 2+ from run 1's
            # cache and the median would report warm-cache time
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 3)
        mins[name] = round(runs[0], 3)
        # sample load BOTH before and after the timed block (ADVICE r11:
        # a contention burst that starts mid-block was invisible to the
        # single before-sample) and flag on the max of the two
        load_after = os.getloadavg()[0]
        loads[name] = round(max(load_before, load_after), 2)
        verdicts[name] = ("quiet" if loads[name] <= LOAD_QUIET_MAX
                          else "flagged")

    # Persisted-block flatness check: after the final release the JVM
    # must hold no persisted RDDs (ContextCleaner drains async, so
    # poll briefly). A nonzero residue is REPORTED in the JSON rather
    # than crashing the driver's bench — visibility is the gate.
    release_between_queries()
    persisted_final = jsc.getPersistentRDDs().size()
    deadline = time.monotonic() + 10
    while persisted_final > 0 and time.monotonic() < deadline:
        time.sleep(0.5)
        gc.collect()
        persisted_final = jsc.getPersistentRDDs().size()

    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # TWO stdout lines (VERDICT r11 #1: the driver captures only the
    # LAST ~2000 bytes of stdout and parses the final line; r11's
    # single fat line lost its head to the tail capture and the round
    # had no driver-visible bench number). Line 1: diagnostics —
    # per-query minima, load telemetry, cache-flatness. Line 2 (LAST):
    # the compact headline the driver parses, kept under the capture
    # window by construction (tests/test_bench_output.py asserts it).
    print(json.dumps({
        "diag": "bench_telemetry",
        "queries_min": mins,
        "load_start": load_start,
        "load_1m": loads,
        "load_verdict": verdicts,
        "load_quiet_max": LOAD_QUIET_MAX,
        "persisted_blocks_final": persisted_final,
        # per-query regression self-report (VERDICT r12 #2): ratios vs
        # the best-demonstrated driver median, fired above 1.5x
        "flagged": regression_flags(timings),
        "flag_ratio": QUERY_FLAG_RATIO,
    }))
    print(headline_line(timings, sf))
    spark.stop()


# The declared baseline: BASELINE.md quiet-draw 34-query medians total
# (VERDICT r11 "Performance" — 62.12 s). vs_baseline rides in the
# headline line so a >2x draw is self-flagging in BENCH_r{N}.json even
# if BASELINE.md drifts (VERDICT r11 #5).
BASELINE_TOTAL_SEC = 62.12

# Per-query regression flags (VERDICT r12 #2): BENCH_r12's
# graph_triangle_doulion drew 12.51 s against a ~4.9-5.4 s quiet record
# — a 2.4x single-query outlier — and nothing in the artifact flagged
# it, because the only gated number was the TOTAL ratio. Each query's
# median-of-5 now compares against its per-query QUIET-DRAW median;
# ratios above QUERY_FLAG_RATIO ride in the diagnostics line as
# {"flagged": {name: ratio}}. Queries without a recorded baseline
# (newly added to HEADLINE) are skipped until a quiet record exists.
#
# Anchor provenance: the round-14 end-of-round quiet draw (see
# BASELINE.md round 14) — one
# SELF-CONSISTENT draw, not a min over rounds: the first live run of
# these flags used per-query minima over the r9/r10/r12 driver records
# and fired 8 false positives on sub-second queries whose r9-era lows
# no longer reflect the harness (BASELINE.md round 13). The heavy
# queries in that same draw sat at or below their r12 records
# (triangle 5.004 vs 5.385), so a >1.5x ratio against THESE medians is
# a real single-query signal, exactly the r12 triangle case (12.51 /
# 5.004 = 2.5 would flag). NOTE: BASELINE_TOTAL_SEC stays the declared
# r11-era 62.12 so the vs_baseline series remains comparable across
# rounds; the per-query table re-anchors on quiet draws because its
# job is outlier detection, not cross-round bookkeeping.
QUERY_FLAG_RATIO = 1.5
BASELINE_QUERY_SEC: dict[str, float] = {
    "agg_rollup": 0.626,
    "cep_stream_funnel": 0.533,
    "corpus_e2e_curation": 0.706,
    "dedup_cluster_components": 1.949,
    "dedup_lsh_recall_eval": 1.283,
    "dedup_minhash_lsh": 1.313,
    "dedup_semdedup_cells": 1.056,
    "dedup_simhash64_hamming": 3.018,
    "events_attribution": 0.841,
    "flagship_revenue_by_nation": 1.547,
    "graph_pagerank": 1.293,
    "graph_triangle_doulion": 2.732,
    "join_asof_event_streams": 0.343,
    "join_left_outer": 0.561,
    "join_set_similarity": 0.934,
    "ml_market_basket_lift": 1.532,
    "pricing_summary": 0.871,
    "sim_bruteforce_topk": 0.474,
    "sim_ivf_bucketed_probe": 1.16,
    "sim_ivfpq_topk": 1.86,
    "store_merge_upsert": 1.674,
    "stream_neardup_filter": 1.514,
    "stream_session_window": 0.428,
    "text_bm25_retrieval": 1.789,
    "text_boilerplate_strip": 0.519,
    "text_bow_vectorize": 0.84,
    "text_bpe_token_counts": 0.425,
    "text_contamination_ngrams": 0.928,
    "text_heavy_hitters": 0.524,
    "text_nb_source_classifier": 2.497,
    "text_term_stats": 0.456,
    "text_tfidf_retrieval": 1.969,
    "window_running_sum": 0.333,
    "window_topk_per_group": 0.446,
}


def regression_flags(timings: dict[str, float],
                     ratio: float = QUERY_FLAG_RATIO) -> dict[str, float]:
    """{name: measured/baseline} for every query whose median exceeds
    ``ratio`` x its per-query baseline; queries without a baseline
    entry are skipped (no KeyError when HEADLINE grows)."""
    return {n: round(t / BASELINE_QUERY_SEC[n], 2)
            for n, t in timings.items()
            if n in BASELINE_QUERY_SEC
            and t > ratio * BASELINE_QUERY_SEC[n]}


def headline_line(timings: dict[str, float], sf: float | None) -> str:
    """The single compact JSON line the driver parses (must stay LAST
    on stdout and comfortably under the driver's 2,000-byte tail
    capture; tests/test_bench_output.py gates the length)."""
    total = round(sum(timings.values()), 3)
    return json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "vs_baseline": round(total / BASELINE_TOTAL_SEC, 3),
    })


if __name__ == "__main__":
    main()
