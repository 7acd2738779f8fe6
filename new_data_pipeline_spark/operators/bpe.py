"""Byte-pair-encoding tokenization: a REAL BPE merge loop (GPT-2-style
iterative min-rank pair merging) over a broadcast merge table,
Arrow-batched, with an exactly-SQL-replayable gate.

Real LLM pipelines count tokens under a trained BPE tokenizer, not
whitespace (text_token_counts' ceil(len/4) column is the rule-of-thumb
estimate; this module is the real algorithm). The Spark side runs the
classic algorithm: split text into words, then per word repeatedly find
the LOWEST-RANK adjacent symbol pair present and merge all its
occurrences left-to-right, until no ranked pair remains — the exact
inference loop of the GPT-2 tokenizer family (reference analog: the
CountVectorizer vocabulary fit, serialize.py:220-235, is the
reference's only tokenization surface; it has no subword notion).

Oracle device (SQL-replayable merge ladder): every symbol — base chars
and merge outputs alike — is a single character, so a merge (x, y)→z
is literally ``replace(s, 'xy', 'z')``. For a WELL-FORMED merge table
(each rule's operands exist before the rule — true of any table
produced by BPE training), applying rules sequentially in rank order
equals the iterative min-rank loop: merging rule j can only create new
pairs involving rule j's output symbol, which no earlier rule mentions.
Both engines' ``replace`` scans left-to-right non-overlapping, matching
the merge loop's leftmost scan. Spaces separate words and no rule
touches a space, so whole-string replace respects word boundaries. The
oracle therefore replays the ENTIRE tokenizer as a nested replace
ladder and counts symbols — bit-exact, not approximate.

Scale: the merge table is O(vocab) and broadcast once; tokenization
streams through mapInPandas with a per-batch word cache (Zipf makes
the distinct-word set tiny relative to the token count). No shuffle at
all — the stage is map-only.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

# (left, right, output) in rank order. Multi-level on purpose: later
# rules consume earlier outputs ('0'='th', 'A'='the'; 'F'='sc',
# 'G'='scan'), so the gate exercises the ladder, not just first-level
# pair counting. Output symbols stay outside [a-z ] so they can never
# collide with base characters.
MERGES: tuple[tuple[str, str, str], ...] = (
    ("t", "h", "0"),
    ("i", "n", "1"),
    ("a", "n", "2"),
    ("e", "r", "3"),
    ("o", "n", "4"),
    ("r", "e", "5"),
    ("a", "t", "6"),
    ("e", "n", "7"),
    ("o", "r", "8"),
    ("s", "t", "9"),
    ("0", "e", "A"),   # t h e   -> the
    ("1", "g", "B"),   # in g   -> ing
    ("2", "d", "C"),   # an d   -> and
    ("s", "c", "F"),
    ("F", "2", "G"),   # sc an  -> scan
    ("6", "a", "H"),   # at a   -> ata
    ("d", "H", "I"),   # d ata  -> data
    ("v", "a", "J"),
    ("l", "u", "K"),
)


def bpe_encode(word: str,
               ranks: dict[tuple[str, str], int],
               outputs: dict[tuple[str, str], str]) -> list[str]:
    """Classic BPE inference: iteratively merge the lowest-rank adjacent
    pair (all occurrences, leftmost scan) until none remains."""
    parts = list(word)
    while len(parts) > 1:
        pairs = {(parts[i], parts[i + 1]) for i in range(len(parts) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, (x, y) = min(ranked)
        out = outputs[(x, y)]
        merged: list[str] = []
        i = 0
        while i < len(parts):
            if (i < len(parts) - 1
                    and parts[i] == x and parts[i + 1] == y):
                merged.append(out)
                i += 2
            else:
                merged.append(parts[i])
                i += 1
        parts = merged
    return parts


def bpe_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document BPE stats via the real merge loop: normalized text
    (lowercase, [a-z ] only, single-spaced) → per-word tokenization →
    (n_base_chars, n_tokens, n_merges). Map-only; distinct words are
    tokenized once per Arrow batch."""
    normalized = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", ""),
        " +", " "))
    src = docs.select("doc_id", normalized.alias("norm"))

    ranks = {(x, y): r for r, (x, y, _) in enumerate(MERGES)}
    outputs = {(x, y): z for x, y, z in MERGES}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}

        def tokens_in(word: str) -> int:
            n = cache.get(word)
            if n is None:
                n = len(bpe_encode(word, ranks, outputs))
                cache[word] = n
            return n

        for pdf in it:
            n_chars, n_tokens = [], []
            for norm in pdf["norm"]:
                words = norm.split(" ") if norm else []
                chars = sum(len(w) for w in words)
                toks = sum(tokens_in(w) for w in words)
                n_chars.append(chars)
                n_tokens.append(toks)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_base_chars": n_chars,
                "n_tokens": n_tokens,
            })

    return src.mapInPandas(
        batches, schema="doc_id bigint, n_base_chars bigint, "
                        "n_tokens bigint")


def _oracle_replace_ladder(expr: str) -> str:
    """The full tokenizer as nested SQL: normalization, then the merge
    ladder in rank order."""
    s = (f"trim(regexp_replace(regexp_replace(lower({expr}), "
         f"'[^a-z ]', '', 'g'), ' +', ' ', 'g'))")
    for x, y, z in MERGES:
        s = f"replace({s}, '{x}{y}', '{z}')"
    return s


_ENC = _oracle_replace_ladder("text")
_NORM = ("trim(regexp_replace(regexp_replace(lower(text), "
         "'[^a-z ]', '', 'g'), ' +', ' ', 'g'))")


@register(
    "text_bpe_token_counts",
    oracle=f"""
    WITH enc AS (
      -- every symbol is ONE character, so counting tokens is counting
      -- non-space characters of the replace-ladder output
      SELECT doc_id,
             length(replace({_NORM}, ' ', '')) AS n_base_chars,
             length(replace({_ENC}, ' ', '')) AS n_tokens
      FROM documents
    )
    SELECT doc_id,
           CAST(n_base_chars AS BIGINT) AS n_base_chars,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_base_chars - n_tokens AS BIGINT) AS n_merges,
           CASE WHEN n_base_chars = 0 THEN 0.0
                ELSE ROUND(CAST(n_tokens AS DOUBLE) / n_base_chars, 6)
           END AS tokens_per_char
    FROM enc
    """,
    tags=("text", "bpe", "tokenizer"),
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the real BPE merge loop, gated
    bit-exactly by the SQL replace-ladder replay of the same merge
    table (see module docstring for why the two are equivalent)."""
    docs = catalog.load(spark, sf_dir, "documents")
    stats = bpe_token_stats(docs)
    return stats.select(
        "doc_id", "n_base_chars", "n_tokens",
        (F.col("n_base_chars") - F.col("n_tokens")).alias("n_merges"),
        F.when(F.col("n_base_chars") == 0, F.lit(0.0))
         .otherwise(F.round(F.col("n_tokens").cast("double")
                            / F.col("n_base_chars"), 6))
         .alias("tokens_per_char"))


# ---------------------------------------------------------------------
# BPE TRAINING — the merge-LEARNING half (text_bpe_token_counts above
# is inference over a fixed table; this learns the table from a corpus,
# the reference's vocabulary-fit analog, serialize.py:220-235).

def _word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): the training working set. Zipf keeps the DISTINCT
    vocabulary tiny relative to the corpus, so every later training
    pass runs over vocabulary-sized data, never corpus-sized — the
    standard trick that makes BPE training tractable at 100 TB (one
    corpus-sized shuffle here, then O(n_merges) vocabulary-sized
    jobs)."""
    normalized = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", ""),
        " +", " "))
    return (docs.select(F.explode(F.split(normalized, " ")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _merge_pair_expr(x: str, y: str, z: str) -> str:
    """Catalyst fold that merges every leftmost-nonoverlapping (x, y)
    into z inside a symbol array — the pair-merge step as a pure
    built-in expression (no UDF in the per-round hot path)."""
    return f"""
    aggregate(syms, CAST(array() AS ARRAY<STRING>),
      (acc, s) -> CASE WHEN size(acc) > 0
                        AND element_at(acc, -1) = '{x}' AND s = '{y}'
                   THEN concat(slice(acc, 1, size(acc) - 1),
                               array('{z}'))
                   ELSE concat(acc, array(s)) END)
    """


def train_merges(docs: DataFrame, n_merges: int,
                 text_col: str = "text") -> list[tuple[str, str, str]]:
    """Learn a BPE merge table from the corpus: repeatedly count
    adjacent symbol pairs (frequency-weighted, distributed), merge the
    most frequent pair everywhere, assign it a fresh single-char
    symbol. Ties break lexicographically so training is deterministic.

    Each round is two vocabulary-sized jobs: an explode+groupBy pair
    count whose ARGMAX (one row) is the only thing collected, and a
    map-only fold applying the merge. Output symbols come from a
    private-use codepoint range so they can never collide with base
    characters — and the returned table is directly consumable by
    bpe_encode (train→encode consistency is gated in tests).
    """
    words = (_word_freqs(docs, text_col)
             .withColumn("syms", F.expr("split(word, '')"))
             .select("syms", "freq").localCheckpoint())
    merges: list[tuple[str, str, str]] = []
    for i in range(n_merges):
        pairs = (words
                 .select(F.expr("""
                     transform(slice(syms, 1, size(syms) - 1),
                               (s, j) -> struct(s AS x,
                                        element_at(syms, j + 2) AS y))
                     """).alias("ps"), "freq")
                 .select(F.explode("ps").alias("p"), "freq")
                 .groupBy("p.x", "p.y")
                 .agg(F.sum("freq").alias("n")))
        top = (pairs.orderBy(F.col("n").desc(), F.col("x"), F.col("y"))
               .limit(1).collect())
        if not top or top[0]["n"] < 2:
            break   # nothing left worth merging
        x, y = top[0]["x"], top[0]["y"]
        z = chr(0xE000 + i)      # private-use area: collision-free
        merges.append((x, y, z))
        words = (words.select(
            F.expr(_merge_pair_expr(x, y, z)).alias("syms"), "freq")
            .localCheckpoint())
    return merges
