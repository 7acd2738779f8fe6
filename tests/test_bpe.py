"""BPE gates: the merge loop's iterative min-rank semantics on
hand-checked goldens (multi-level ladders, repeated pairs, unranked
residue), the sequential-replace equivalence the oracle relies on, and
the Spark stage end-to-end."""

from __future__ import annotations

from new_data_pipeline_spark.operators.bpe import (
    MERGES, bpe_encode, bpe_token_stats)

RANKS = {(x, y): r for r, (x, y, _) in enumerate(MERGES)}
OUTPUTS = {(x, y): z for x, y, z in MERGES}


def enc(word: str) -> list[str]:
    return bpe_encode(word, RANKS, OUTPUTS)


def test_multi_level_ladder():
    # t+h=0, 0+e=A: "the" collapses through two levels
    assert enc("the") == ["A"]
    # s+c=F after a+n=2: "scan" -> F,2 -> G
    assert enc("scan") == ["G"]
    # d + (at+a=H) = I
    assert enc("data") == ["I"]


def test_min_rank_wins_over_position():
    # "nat": pairs (n,a) unranked, (a,t) rank 6 -> n,6
    assert enc("nat") == ["n", "6"]
    # "ther": (t,h)=0 first -> 0,e,r; then (e,r)=3 BEATS (0,e)=10,
    # so the result is 0,3 — NOT the "the"+r segmentation A,r
    assert enc("ther") == ["0", "3"]


def test_all_occurrences_merge_leftmost():
    assert enc("ththt") == ["0", "0", "t"]
    # "inin" -> 1,1 (both occurrences in one pass)
    assert enc("inin") == ["1", "1"]


def test_unranked_words_stay_chars():
    assert enc("xyz") == ["x", "y", "z"]
    assert enc("q") == ["q"]
    assert enc("") == []


def test_sequential_replace_equals_merge_loop():
    """The oracle's whole premise: applying the ladder as sequential
    string replaces (rank order, leftmost) must equal the iterative
    min-rank loop for every word in a stress corpus."""
    words = ["the", "then", "there", "scan", "scanner", "data",
             "database", "inin", "ththt", "inging", "and", "sand",
             "standard", "atlantic", "restore", "value", "lumen",
             "xyzzy", "a", "", "thethethe", "antant", "orenst"]
    for w in words:
        s = w
        for x, y, z in MERGES:
            s = s.replace(x + y, z)
        assert list(s) == enc(w), w


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="theinangorsdvalu", max_size=24))
def test_property_sequential_replace_equals_merge_loop(word):
    """Hypothesis-strength version of the oracle's core premise, over
    random words drawn from the merge table's own alphabet (the
    worst case for interacting merges)."""
    s = word
    for x, y, z in MERGES:
        s = s.replace(x + y, z)
    assert list(s) == enc(word), word


def _reference_train(word_freqs: dict[str, int], n: int):
    """Independent local BPE trainer (plain Python) for goldens."""
    words = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for i in range(n):
        counts: dict = {}
        for syms, f in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        if counts[best] < 2:
            break
        x, y = best
        z = chr(0xE000 + i)
        merges.append((x, y, z))
        new_words = {}
        for syms, f in words.items():
            out = []
            for s in syms:
                if out and out[-1] == x and s == y:
                    out[-1] = z
                else:
                    out.append(s)
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + f
        words = new_words
    return merges, words


def test_train_merges_matches_reference(spark):
    """Distributed training must learn the same merge table (same
    pairs, same order) as the independent local reference trainer."""
    from new_data_pipeline_spark.operators.bpe import train_merges

    texts = ["the cat sat on the mat", "the hat of the cat",
             "that thin thing", "on and on and on"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string")
    freqs: dict = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    want, _ = _reference_train(freqs, 8)
    got = train_merges(docs, 8)
    assert got == want and len(got) >= 4


def test_train_then_encode_consistency(spark):
    """The learned table must be directly consumable by the inference
    loop: encoding every training word with the learned ranks yields
    the same symbol state training itself ended in (the train/encode
    consistency property of well-formed merge tables)."""
    from new_data_pipeline_spark.operators.bpe import train_merges

    texts = ["banana bandana", "ban ban banana", "a banana bandana"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string")
    merges = train_merges(docs, 6)
    assert merges
    ranks = {(x, y): r for r, (x, y, _) in enumerate(merges)}
    outs = {(x, y): z for x, y, z in merges}

    freqs: dict = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    _, final_words = _reference_train(freqs, 6)
    encoded = {tuple(bpe_encode(w, ranks, outs)) for w in freqs}
    assert encoded == set(final_words)


def test_train_stops_when_no_pair_repeats(spark):
    from new_data_pipeline_spark.operators.bpe import train_merges

    docs = spark.createDataFrame([(1, "ab cd ef")],
                                 "doc_id bigint, text string")
    merges = train_merges(docs, 10)
    assert merges == []  # every pair occurs once: below the bar


def test_spark_stage_counts(spark):
    df = spark.createDataFrame(
        [(1, "the scan of data"), (2, "Xyz!  42"), (3, "")],
        "doc_id bigint, text string")
    got = {r.doc_id: r for r in bpe_token_stats(df).collect()}
    # "the"->1 tok, "scan"->1, "of"->2, "data"->1 : 5 tokens, 13 chars
    assert (got[1].n_base_chars, got[1].n_tokens) == (13, 5)
    # normalization: "Xyz!  42" -> "xyz" -> 3 chars, 3 tokens
    assert (got[2].n_base_chars, got[2].n_tokens) == (3, 3)
    assert (got[3].n_base_chars, got[3].n_tokens) == (0, 0)
