"""The committed GATE_PRIORITY window must equal the mechanized
proposal (tools/window_plan.py) — the driver grades queries()[:50], so
a mis-counted hand edit silently starves the oldest-exposure queries.
Update R14_HEAD when re-aiming the window for a new round: the test
then verifies the new window is exactly head + oldest-first."""

from __future__ import annotations

import __spark_entry__ as entry
from tools.window_plan import WINDOW, plan

# The current round's head block: every changed-or-new registered
# query (the every-changed-query rule). PART OF THE RE-AIM CHECKLIST —
# update together with registry.GATE_PRIORITY each round.
# r14: the 44 optimization-changed queries (see registry comment)
R14_HEAD = [
    "pricing_summary",
    "store_merge_upsert",
    "stream_merge_apply",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_incremental_lsh",
    "dedup_lsh_bucketed_probe",
    "stream_neardup_filter",
    "dedup_cluster_components",
    "dedup_simhash",
    "dedup_simhash64_hamming",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_apply_minhash",
    "dedup_lsh_recall_eval",
    "sim_bruteforce_topk",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "sim_ivf_bucketed_probe",
    "sim_pq_topk",
    "sim_ivfpq_topk",
    "sim_ivfpq_bucketed_probe",
    "sim_pq_bucketed_probe",
    "sim_random_projection_topk",
    "sim_rp_ivf_topk",
    "sim_ann_recall_eval",
    "sim_ivf_serve_batches",
    "cluster_kmeans_assign",
    "cluster_kmeans_lloyd",
    "dedup_semdedup_cells",
    "text_tfidf_retrieval",
    "text_bm25_retrieval",
    "events_attribution",
    "text_nb_source_classifier",
    "graph_pagerank",
    "graph_triangle_stats",
    "graph_triangle_doulion",
    "graph_triangle_census_auto",
    "join_set_similarity",
    "join_set_similarity_prefix",
    "join_set_containment",
    "ml_market_basket_lift",
    "text_contamination_ngrams",
    "join_bucketed_colocated",
]


def test_committed_window_matches_mechanized_plan():
    # max_round pins the exposure snapshot to what the r14 aim was
    # computed FROM (rounds <= 13), so the pin survives the driver
    # recording CORRECTNESS_r14 at the end of this round
    proposed, _deferred = plan(R14_HEAD, max_round=13)
    committed = list(entry.queries())[:WINDOW]
    assert proposed == committed, (
        "committed GATE_PRIORITY window diverges from the oldest-first "
        "proposal; first difference: "
        + str(next((a, b) for a, b in zip(proposed, committed)
                   if a != b)))


def test_head_block_is_registered_and_leading():
    committed = list(entry.queries())[:WINDOW]
    assert committed[:len(R14_HEAD)] == R14_HEAD
