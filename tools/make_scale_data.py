"""Synthesize a ~10x blowup of /root/testdata/sf0.1 for the scale-
evidence audit (VERDICT r4 next-round #1).

Design: ten FK-consistent copies of every fact table, each copy's
bigint keys offset by i * 10^12, so the result is ten disjoint
subgraphs — the "ten independent crawls" model of corpus growth.
Per-copy perturbations keep WITHIN-copy structure identical while
making ACROSS-copy content (shingles, signatures) disjoint:

- documents: per-copy letter `translate` (vowels rotated by i%5,
  'bcdfg' rotated by (2i)%5) — length-preserving, word-boundary-
  preserving, so within-copy dup structure and n_chars are exactly
  preserved while cross-copy shingle sets are disjoint. Candidate-pair
  counts therefore scale ~linearly (10x), the realistic web-corpus
  regime, not the 100x worst case verbatim replication would inject.
- embeddings: deterministic small perturbation per (copy, dim):
  emb[j] + 0.003 * ((7i + j) % 11 - 5). Keeps cluster geometry
  near-identical per copy; vec_id offsets keep id-derived seeds valid.
- events: disjoint user populations per copy (user_id offset) — group
  counts scale 10x, per-group sizes stay constant.
- dims nation/region stay verbatim (fixed-cardinality dimensions).
- part keys (p_partkey + lineitem.l_partkey): a FOREST-PRESERVING
  digit-prefix graft instead of the additive offset (VERDICT r12 #4 —
  the i*10^12 offset orphaned every copy-i>=1 node out of the
  hierarchy family's DIV-10 forest after round 1, so the 10x audit
  measured a 1x surviving forest). Copy i maps k -> S_i*10^ndigits(k)+k
  where S_i is an EXISTING copy-0 key (the i-th largest, all the same
  digit length): DIV 10 strips k's digits one at a time exactly as in
  the base forest, the copy's local roots (k in 1..9) resolve to
  parent S_i, and S_i's own chain descends through copy-0 to a real
  root — ten-times the nodes, full depth, one valid forest. Equi-join
  structure is untouched (the map is injective and applied to both
  FK sides); images carry more digits than any copy-0 key, so key
  spaces stay disjoint.

Output: /tmp/ndp_scale10/<table>.parquet (overwritten). Run:
    python tools/make_scale_data.py [factor]
"""
from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SRC = os.environ.get("SCALE_SRC", "/root/testdata/sf0.1")
OUT = os.environ.get("SCALE_OUT", "/tmp/ndp_scale10")
OFF = 10**12

VOWELS = "aeiou"
CONS = "bcdfg"
CONS2 = "hjklm"  # third rotation class: keeps the triple injective
#                  through factor 125 (r14: the 30x audit needs > 25)


def _rot(s: str, k: int) -> str:
    k %= len(s)
    return s[k:] + s[:k]


def _rotations(i: int) -> tuple[int, int, int]:
    """Distinct (vowel, consonant, consonant2) rotation triple per
    copy. The naive (i%5, 2i%5) repeats with period 5 (copy i+5 ==
    copy i — ADVICE r5: verbatim cross-copy duplicates); folding i//5
    into the second class extends injectivity to [0, 25), and the
    third class (i//25) to [0, 125) — the r14 30x audit needs > 25."""
    return i % 5, (2 * i + i // 5) % 5, (i // 25) % 5


def _perturb_text(col, i: int):
    if i == 0:
        return col
    rv, rc, rc2 = _rotations(i)
    src = (VOWELS + CONS + CONS2
           + VOWELS.upper() + CONS.upper() + CONS2.upper())
    dst = (_rot(VOWELS, rv) + _rot(CONS, rc) + _rot(CONS2, rc2)
           + _rot(VOWELS.upper(), rv) + _rot(CONS.upper(), rc)
           + _rot(CONS2.upper(), rc2))
    return F.translate(col, src, dst)


def graft_expr(col: str, anchor: int) -> str:
    """Forest-preserving copy image of part key ``col``:
    anchor * 10^ndigits(k) + k — appends k's digits after the anchor's,
    so DIV 10 strips them one at a time exactly as in the base forest
    and the copy's local roots resolve to parent ``anchor`` (an
    existing copy-0 key). SQL, so the same string documents the
    transform for both engines; tests/test_scale_fixture.py pins the
    no-orphan property."""
    return (f"CAST({anchor} AS BIGINT) * CAST(power(10, "
            f"length(CAST({col} AS STRING))) AS BIGINT) + {col}")


def _copies(df: DataFrame, factor: int, build) -> DataFrame:
    out = None
    for i in range(factor):
        c = build(df, i)
        out = c if out is None else out.unionByName(c)
    return out


def main(factor: int = 10) -> None:
    spark = (SparkSession.builder.master("local[16]")
             .appName("ndp-scale-data")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
             .config("spark.driver.memory", "48g")
             .getOrCreate())
    pairs = [_rotations(i) for i in range(factor)]
    # raise, not assert (ADVICE r14): python -O strips asserts, and a
    # silently non-injective factor would regenerate duplicate-text
    # fixtures — same pattern as the graft-anchor checks below
    if len(set(pairs)) != factor:
        raise RuntimeError(
            f"text perturbation not injective for factor={factor}: {pairs}")
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)

    def load(name):
        return spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))

    def save(df, name, parts=16):
        df.repartition(parts).write.mode("overwrite").parquet(
            os.path.join(OUT, f"{name}.parquet"))
        print(f"{name}: {df.count()} rows", flush=True)

    # fixed dims: verbatim single copy
    for name in ("nation", "region"):
        save(load(name), name, parts=1)

    # Forest-preserving graft anchors for the part-key family (see
    # module docstring): the factor-1 largest copy-0 part keys. They
    # must all exist and share a digit length for the digit-prefix map
    # to stay injective and forest-preserving.
    part0 = load("part")
    max_pk = part0.agg(F.max("p_partkey")).first()[0]
    graft = {i: max_pk - (factor - 1) + i for i in range(1, factor)}
    # RuntimeError, not assert (ADVICE r13): assert is stripped under
    # python -O, and a silent pass here would regenerate the exact
    # orphaned-forest fixture these checks exist to prevent.
    if len({len(str(s)) for s in graft.values()}) != 1:
        raise RuntimeError(f"graft anchors span digit lengths: {graft}")
    n_anchor = part0.filter(
        F.col("p_partkey").isin(list(graft.values()))).count()
    if n_anchor != factor - 1:
        raise RuntimeError(
            f"graft anchors missing: {n_anchor}/{factor - 1} of "
            f"{sorted(graft.values())} exist — part keys not contiguous?")

    def _graft_part_key(name: str, i: int):
        if i == 0:
            return F.col(name)
        return F.expr(graft_expr(name, graft[i]))

    key_offsets = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
    }
    PART_KEYS = {"p_partkey", "l_partkey"}
    for name, keys in key_offsets.items():
        df = load(name)

        def build(d, i, keys=keys):
            for k in keys:
                if k in PART_KEYS:
                    d = d.withColumn(k, _graft_part_key(k, i))
                else:
                    d = d.withColumn(k, F.col(k) + F.lit(i * OFF))
            return d

        save(_copies(df, factor, build), name)

    docs = load("documents")

    def build_docs(d, i):
        return (d.withColumn("doc_id", F.col("doc_id") + F.lit(i * OFF))
                .withColumn("text", _perturb_text(F.col("text"), i)))

    save(_copies(docs, factor, build_docs), "documents")

    emb = load("embeddings")

    def build_emb(d, i):
        if i == 0:
            return d
        return (d.withColumn("vec_id", F.col("vec_id") + F.lit(i * OFF))
                .withColumn(
                    "embedding",
                    F.expr(f"""transform(embedding, (x, j) ->
                        CAST(x + 0.003 * ((7 * {i} + j) % 11 - 5)
                             AS FLOAT))""")))

    save(_copies(emb, factor, build_emb), "embeddings")
    spark.stop()
    print(f"done: {OUT} at {factor}x {SRC}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
