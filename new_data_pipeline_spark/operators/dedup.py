"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

The reference has no dedup (SURVEY.md §2.2) — this is the LLM-pipeline
extension surface. All five are oracle-checked: the hash families are
built from md5 (identical hex in Spark and DuckDB; hex→int via
``conv(…,16,10)`` / ``CAST('0x…' AS BIGINT)``), so even the LSH
pipelines replay exactly in SQL.

Scale design (the whole point of LSH): candidate generation is a
band-bucket equi-join — near-linear shuffle on band keys — never an
all-pairs cross join. Exact Jaccard runs only on candidates. At 100 TB
the band join is the standard web-dedup layout (one shuffle per band
set, salted if a bucket is hot); the brute-force paths below exist only
as verification baselines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

# MinHash parameters: K hashes in B bands of R rows (K = B*R).
MINHASH_K, MINHASH_BANDS, MINHASH_R = 8, 4, 2
JACCARD_THRESHOLD = 0.8

# Hot-bucket cap for candidate-generation joins (the standard web-dedup
# guard): a degenerate band/chunk key — near-empty docs all hashing
# alike, a templated corpus — makes ONE join bucket quadratic
# (cap² candidate pairs in one task). Buckets above the cap are dropped
# before the self-join; pairs sharing ONLY a dropped bucket are lost,
# which is the documented recall trade every production dedup makes.
# 2000 bounds per-bucket work at 4M pairs and sits far above every
# bucket observed in the test corpora (minhash bands: max 3 @sf0.01,
# 12 @sf0.1; simhash 16-bit chunks: max 159 @sf0.01, 1639 @sf0.1), so
# gated output is unchanged at both scales. Tune per corpus at 100 TB.
HOT_BUCKET_CAP = 2000


def cap_hot_buckets(df: DataFrame, key_cols: list[str],
                    cap: int = HOT_BUCKET_CAP) -> DataFrame:
    """Drop all rows of buckets holding more than ``cap`` rows.

    One map-side-combinable count per bucket key, then a broadcast
    anti-join against the (tiny) hot-key list — the candidate join that
    follows never sees a bucket that could go quadratic.
    """
    hot = (df.groupBy(*key_cols)
           .agg(F.count(F.lit(1)).alias("__n"))
           .filter(F.col("__n") > cap)
           .select(*key_cols))
    return df.join(F.broadcast(hot), key_cols, "left_anti")

# word-shingle width for MinHash; char-n-gram width for ngram Jaccard
SHINGLE_W, NGRAM_W = 3, 5


def _spark_shingles(text_col: str = "text"):
    """Distinct word 3-gram shingles (JVM-side higher-order funcs).
    Caller must pre-filter to ≥ SHINGLE_W tokens: Spark's sequence(1, n)
    runs DESCENDING for n < 1, so the guard cannot live inside."""
    return F.expr(f"""
        array_distinct(transform(
          sequence(1, size(split({text_col}, ' ')) - {SHINGLE_W - 1}),
          i -> concat_ws(' ', slice(split({text_col}, ' '), i, {SHINGLE_W}))))""")


_SQL_SHINGLES = (f"list_distinct([array_to_string(toks[i:i+{SHINGLE_W - 1}], ' ')"
                 f" for i in range(1, len(toks) - {SHINGLE_W - 2})])")


# Affine minhash family h_i(s) = (A[i] * base(s) + B[i]) mod P over one
# md5-derived base hash per shingle — k hashes for the price of one md5.
# P and the coefficients fit 64-bit: base < P ≤ 1e9+7, A[i] < P, so
# A[i]*base + B[i] < ~1e18 < 2^63 with no overflow in either engine.
MINHASH_P = 1_000_000_007
MINHASH_A = (472_882_049, 741_103_597, 386_910_137, 104_395_303,
             236_887_691, 984_443_609, 922_717_207, 533_000_401)
MINHASH_B = (268_435_399, 785_685_301, 417_793_621, 675_977_531,
             354_875_821, 86_028_157, 611_953_517, 177_635_683)


def hashed_shingles_expr(text_col: str = "text"):
    """Distinct md5-derived 60-bit hashes of the word-3-gram shingles —
    the setsim_join payload device applied to minhash: the Jaccard
    verify join moves arrays of LONGS (8 B/element), not the shingle
    strings themselves (~20-30 B + offsets). A 60-bit collision merges
    elements IDENTICALLY in Spark and DuckDB (same md5-prefix
    expression both sides), so the gate stays exact by construction.
    Caller must pre-filter to ≥ SHINGLE_W tokens (sequence() descends
    for n < 1, as in _spark_shingles)."""
    return F.expr(f"""
        array_distinct(transform(
          transform(
            sequence(1, size(split({text_col}, ' ')) - {SHINGLE_W - 1}),
            i -> concat_ws(' ', slice(split({text_col}, ' '), i, {SHINGLE_W}))),
          s -> CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)))""")


def minhash_signature_expr(shingle_col: str, k: int = MINHASH_K,
                           hashed: bool = False):
    """k minhash values via the affine family over one base hash:
    base = int64(md5(s)[:15]) mod P; h_i = (A_i*base + B_i) mod P.

    Single-pass: ONE aggregate over the base hashes carrying all k
    running minima (zip_with + least). Catalyst does not CSE across k
    separate array_min expressions, so the naive form md5s every
    shingle k times — the aggregate evaluates the md5 transform once.

    With ``hashed=True`` the column already holds the 60-bit md5-derived
    longs (hashed_shingles_expr) and base = h mod P — bit-identical
    signatures to the string path, zero additional md5 passes."""
    a_arr = "array(" + ", ".join(f"{a}L" for a in MINHASH_A[:k]) + ")"
    b_arr = "array(" + ", ".join(f"{b}L" for b in MINHASH_B[:k]) + ")"
    if hashed:
        bases = f"transform({shingle_col}, h -> h % {MINHASH_P})"
    else:
        bases = (f"transform({shingle_col}, "
                 f"s -> CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)"
                 f" % {MINHASH_P})")
    return F.expr(f"""
        aggregate(
          {bases},
          transform(sequence(1, {k}), i -> {MINHASH_P}L),
          (acc, b) -> zip_with(acc, sequence(0, {k - 1}),
            (m, i) -> least(m, (element_at({a_arr}, i + 1) * b
                                + element_at({b_arr}, i + 1))
                               % {MINHASH_P})))""")


@register(
    "dedup_exact",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    ), keeper AS (
      SELECT fingerprint, MIN(doc_id) AS keeper_id, COUNT(*) AS cluster_size
      FROM fp GROUP BY fingerprint
    )
    SELECT fp.doc_id, fp.fingerprint, k.keeper_id,
           k.cluster_size, (fp.doc_id = k.keeper_id) AS is_keeper
    FROM fp JOIN keeper k USING (fingerprint)
    """,
    tags=("dedup", "exact"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text fingerprint: hash-groupBy picks
    the min-doc_id keeper per cluster — deterministic, unlike
    dropDuplicates' arbitrary row retention.

    Scale: one shuffle on the fingerprint; at 100 TB group on the md5
    (16 bytes) rather than the text itself.
    """
    docs = catalog.spread(catalog.load(spark, sf_dir, "documents"))  # r14: guide §2.5
    fp = docs.select(
        "doc_id", "source",
        F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
         .alias("fingerprint"))
    keeper = (fp.groupBy("fingerprint")
              .agg(F.min("doc_id").alias("keeper_id"),
                   F.count(F.lit(1)).alias("cluster_size")))
    return (fp.join(keeper, "fingerprint")
            .select("doc_id", "fingerprint", "keeper_id", "cluster_size",
                    (F.col("doc_id") == F.col("keeper_id")).alias("is_keeper")))


# The LSH pair pipeline as composable CTEs ending in ``pairs`` —
# dedup_minhash_lsh projects it directly; dedup_cluster_components feeds
# it into a recursive-CTE connected-components pass.
_SQL_MINHASH_PAIR_CTES = f"""
    t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), s AS (
      SELECT doc_id,
             list_distinct([CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
                            for x in {_SQL_SHINGLES}]) AS hs
      FROM t
      WHERE len(toks) >= {SHINGLE_W}
    ), m AS (
      SELECT doc_id,
             [list_min([([{','.join(str(a) for a in MINHASH_A)}][k + 1]
                          * (h % {MINHASH_P})
                         + [{','.join(str(b) for b in MINHASH_B)}][k + 1])
                        % {MINHASH_P} for h in hs])
              for k in range(0, {MINHASH_K})] AS sig
      FROM s
    ), bands AS (
      SELECT doc_id, b AS band_id,
             CAST(sig[{MINHASH_R} * b + 1] AS VARCHAR) || ',' ||
             CAST(sig[{MINHASH_R} * b + 2] AS VARCHAR) AS band_key
      FROM m, range(0, {MINHASH_BANDS}) AS r(b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ), pairs AS (
      SELECT c.doc_a, c.doc_b,
             round(CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                   / len(list_distinct(sa.hs || sb.hs)), 6) AS jaccard
      FROM cand c
      JOIN s sa ON sa.doc_id = c.doc_a
      JOIN s sb ON sb.doc_id = c.doc_b
      WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
            / len(list_distinct(sa.hs || sb.hs)) >= {JACCARD_THRESHOLD}
    )"""


def _shingle_bands(spark: SparkSession,
                   sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(hashed shingle sets, capped band-bucket table) — the shared
    front of every MinHash pipeline, over the full documents table.

    Persist the HASHED shingle sets (60-bit longs, not strings — see
    hashed_shingles_expr): the plan consumes them four times (band
    build ×2 via the self-join, Jaccard verify ×2) and recomputing the
    shingle+minhash subtree dominated the un-persisted runtime ~5×.
    The band table persists BEFORE the cap: the bucket-count aggregate,
    the anti-join and both sides of the candidate join all reuse the
    cache instead of recomputing the subtree per consumer."""
    s, bands, _ = _shingle_bands_from(
        catalog.spread(catalog.load(spark, sf_dir, "documents")))
    # r14: spread parallelizes the 1-file scan's shingle+minhash map
    # work (guide §2.5); applied at the batch entry only — streaming
    # microbatches arrive pre-partitioned by the source
    return s, bands


def _shingle_bands_from(docs: DataFrame) -> tuple[
        DataFrame, DataFrame, list[DataFrame]]:
    """_shingle_bands over an arbitrary (doc_id, text, …) frame — the
    per-microbatch entry point for the streaming near-dup filter, which
    must band each arriving slice with bit-identical hashing to the
    persisted index it probes. Returns (shingles, capped_bands, caches)
    — ``caches`` are the two frames actually persisted (the capped band
    frame is DERIVED from the cached one, so unpersisting the return
    values alone would release nothing); streaming callers unpersist
    them per microbatch (ADVICE r9), batch queries leave them to the
    session's cache-clearing discipline."""
    s = (docs.filter(F.size(F.split("text", " ")) >= SHINGLE_W)
         .select("doc_id", hashed_shingles_expr().alias("hs"))
         .persist())
    m = s.withColumn("sig", minhash_signature_expr("hs", hashed=True))
    bands_raw = m.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"),
                     F.concat_ws(",", *[
                         F.element_at("sig", MINHASH_R * b + r + 1).cast("string")
                         for r in range(MINHASH_R)]).alias("band_key"))
            for b in range(MINHASH_BANDS)])).alias("band")
    ).select("doc_id", "band.band_id", "band.band_key").persist()
    # r14: persist the CAPPED band table too — every probe/self-join
    # consumer used to re-run the cap's count-shuffle + anti-join from
    # the bands_raw cache (profiled at 5 near-identical stages in
    # stream_neardup_filter alone); bands_raw stays persisted for the
    # cap's own two internal consumers (bucket counts, anti-join left)
    bands = cap_hot_buckets(bands_raw, ["band_id", "band_key"]).persist()
    return s, bands, [s, bands_raw, bands]


def _incremental_candidates(base_bands: DataFrame,
                            delta_bands: DataFrame) -> DataFrame:
    """Candidate pairs INVOLVING a delta doc: delta probing the base
    band index (old-new; id order is automatic when every base id is
    below every delta id) UNION the delta self-join (new-new) — never
    base×base, which is exactly the work an incremental run skips.
    Shared by the in-memory and bucketed incremental gates and the
    streaming near-dup filter's per-microbatch probe."""
    d, bb = delta_bands.alias("d"), base_bands.alias("bb")
    old_new = (d.join(bb, (F.col("d.band_id") == F.col("bb.band_id"))
                      & (F.col("d.band_key") == F.col("bb.band_key")))
               .select(F.col("bb.doc_id").alias("doc_a"),
                       F.col("d.doc_id").alias("doc_b")))
    x, y = delta_bands.alias("x"), delta_bands.alias("y")
    new_new = (x.join(y, (F.col("x.band_id") == F.col("y.band_id"))
                      & (F.col("x.band_key") == F.col("y.band_key"))
                      & (F.col("x.doc_id") < F.col("y.doc_id")))
               .select(F.col("x.doc_id").alias("doc_a"),
                       F.col("y.doc_id").alias("doc_b")))
    return old_new.unionAll(new_new).distinct()


def _verify_pairs(cand: DataFrame, s: DataFrame) -> DataFrame:
    """Exact-Jaccard verification of (doc_a, doc_b) candidates against
    the hashed shingle sets."""
    sa = s.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
    sb = s.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
    jac = (F.size(F.array_intersect("hs_a", "hs_b")).cast("double")
           / F.size(F.array_union("hs_a", "hs_b")))
    return (cand.join(sa, "doc_a").join(sb, "doc_b")
            .filter(jac >= JACCARD_THRESHOLD)
            .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard")))


def minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH near-dup pair pipeline (doc_a, doc_b, jaccard) — shared
    by ``dedup_minhash_lsh`` and the cluster-components pass."""
    s, bands = _shingle_bands(spark, sf_dir)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    return _verify_pairs(cand, s)


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SQL_MINHASH_PAIR_CTES}
    SELECT doc_a, doc_b, jaccard FROM pairs
    """,
    tags=("dedup", "minhash", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via MinHash + LSH banding, verified by exact
    shingle Jaccard ≥ 0.8.

    Pipeline: word-3-gram shingles → 8 minhashes → 4 bands × 2 rows →
    band-bucket self-join for candidates → exact Jaccard on candidates
    only. The md5-derived hash family replays identically in the DuckDB
    oracle, so the *whole LSH pipeline* is hash-gated, not just its
    output shape.
    """
    return minhash_pairs(spark, sf_dir)


# "delta" = the newest tenth of the id space (count-free, exact-integer
# rule both engines replay: tsplit = max_id - max_id // 10)
INCR_DELTA_DIVISOR = 10


@register(
    "dedup_incremental_lsh",
    oracle=f"""
    WITH {_SQL_MINHASH_PAIR_CTES}
    SELECT doc_a, doc_b, jaccard FROM pairs
    WHERE doc_b >= (SELECT MAX(doc_id) - MAX(doc_id) // {INCR_DELTA_DIVISOR}
                    FROM documents)
    """,
    tags=("dedup", "minhash", "lsh", "incremental"),
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH maintenance: the corpus grew by a snapshot (the
    newest tenth of the id space stands in for the new crawl), and only
    the near-dup pairs INVOLVING a new document must be found — the
    index-maintenance pattern that makes LSH dedup affordable on a
    growing 100 TB corpus, where re-running the full-corpus pair join
    per snapshot would pay O(corpus) for an O(delta)-sized answer.

    Construction: one band table (built fresh here so the gate is
    self-contained; in production the base slice IS the persisted
    index, e.g. the ndpdatum/parquet band table of the last run), split
    at the count-free id threshold. Candidates = delta probing the base
    buckets (old-new pairs; id order is automatic, old < tsplit ≤ new)
    UNION the delta self-join (new-new pairs) — never base×base, which
    is exactly the work skipped. Exact-Jaccard verification unchanged.

    The oracle replays the FULL pair pipeline and filters to
    doc_b ≥ tsplit (doc_a < doc_b, so doc_b is the pair max): proof
    that incremental probing finds precisely the full recompute's
    new-doc pairs, missing none and inventing none.

    Scale: delta bands shuffle-join against the bucket-keyed index
    (at 100 TB: bucket-partitioned parquet, so the probe co-locates);
    the delta self-join is |delta|-sized. Work is O(|delta| + matches),
    independent of corpus size — the audit's alpha reflects the band
    build here, not the probe, because the gate rebuilds the index.
    """
    s, bands = _shingle_bands(spark, sf_dir)
    # Eagerly fill the shared band cache BEFORE the plan fans out:
    # base and delta are DIFFERENT filters of the cached subtree, so —
    # unlike the full pipeline's self-join, where ReuseExchange forces
    # one computation — the union's two independent join stages race a
    # cold cache and EACH pay the full shingle+minhash build (measured
    # 59 s vs 6 s at 10x). One count() makes every consumer a cache
    # read. (The bucketed-probe variant gets this for free: its
    # saveAsTable action materializes the cache first.)
    bands.count()
    max_id = catalog.load(spark, sf_dir, "documents").agg(
        F.max("doc_id")).first()[0]
    # empty corpus: MAX is NULL; any threshold yields the empty answer
    tsplit = 0 if max_id is None else max_id - max_id // INCR_DELTA_DIVISOR
    base = bands.filter(F.col("doc_id") < tsplit)
    delta = bands.filter(F.col("doc_id") >= tsplit)
    return _verify_pairs(_incremental_candidates(base, delta), s)


@register(
    "dedup_lsh_bucketed_probe",
    # identical answer contract to dedup_incremental_lsh: persisting
    # the index bucketed must not change WHICH pairs the delta finds
    oracle=f"""
    WITH {_SQL_MINHASH_PAIR_CTES}
    SELECT doc_a, doc_b, jaccard FROM pairs
    WHERE doc_b >= (SELECT MAX(doc_id) - MAX(doc_id) // {INCR_DELTA_DIVISOR}
                    FROM documents)
    """,
    tags=("dedup", "minhash", "lsh", "incremental", "layout", "bucketing"),
)
def dedup_lsh_bucketed_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-LSH story with the index actually PERSISTED: the
    base band table is written to the catalog bucketed by band_key
    (plans/physical.write_bucketed — the same pay-the-shuffle-once
    device as join_bucketed_colocated), and the delta probes the
    CATALOG table. HashPartitioning(band_key) satisfies the probe
    join's clustered distribution (bucket columns ⊆ join keys), so the
    index side scans shuffle-free — only the O(delta) probe side
    exchanges, which is the entire point of keeping an index at 100 TB
    (asserted on the plan in tests/test_physical.py). The gate proves
    layout neutrality: the bucketed probe answers exactly what
    ``dedup_incremental_lsh``'s in-memory split answers, which the
    oracle replays as the full recompute filtered to new-doc pairs.
    """
    import hashlib

    from new_data_pipeline_spark.plans import physical
    from new_data_pipeline_spark.plans.layout_queries import (
        _sweep_stale_bucketed)

    s, bands = _shingle_bands(spark, sf_dir)
    max_id = catalog.load(spark, sf_dir, "documents").agg(
        F.max("doc_id")).first()[0]
    tsplit = 0 if max_id is None else max_id - max_id // INCR_DELTA_DIVISOR
    tbl = f"ndp_b_lshidx_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    _sweep_stale_bucketed(spark, keep={tbl}, prefixes=("ndp_b_lshidx_",))
    physical.write_bucketed(bands.filter(F.col("doc_id") < tsplit),
                            tbl, "band_id", "band_key")
    idx = spark.table(tbl)
    delta = bands.filter(F.col("doc_id") >= tsplit)
    return _verify_pairs(_incremental_candidates(idx, delta), s)


def neardup_probe_batch(batch_docs: DataFrame, index_bands: DataFrame,
                        index_shingles: DataFrame) -> tuple[
                            DataFrame, DataFrame, DataFrame,
                            "Callable[[], None]"]:
    """One microbatch of the streaming near-dup filter: band the
    arriving docs, probe the accumulated index (all earlier-arrived
    docs), and verdict each arrival.

    Returns (verdicts, batch_bands, batch_shingles, release) — the
    caller (a
    foreachBatch sink, tests/test_streaming.py) appends the latter two
    to the index so the NEXT batch probes everything seen so far; this
    function never rebuilds the index, which is the point of the
    incremental shape. Verdicts: (doc_id, dup_of, is_dup) — dup_of =
    smallest earlier near-dup (index doc or an earlier id in the same
    batch), NULL when the arrival is novel.

    Cache contract (ADVICE r9): the banding subtree is PERSISTED (the
    verdict job and the two index appends are three consumers); the
    sink MUST call the returned ``release`` after its final write or a
    long-running stream accumulates storage blocks per microbatch —
    use ``neardup_probe_and_append``, which owns the whole
    write-then-release sequence.

    Cap-semantics divergence (ADVICE r9, documented by design):
    ``cap_hot_buckets`` here caps band buckets PER MICROBATCH, while
    ``stream_neardup_filter`` and its oracle cap over the full corpus.
    A bucket that is hot globally but under the cap within every batch
    yields extra candidates in the incremental run — harmless for
    correctness (candidates are Jaccard-verified, so verdicts agree;
    the pinned equality in tests/test_streaming.py holds because no
    test bucket approaches the cap) but at 100 TB the incremental path
    does strictly MORE candidate work on such buckets, not less. A
    shared-cap variant would check accumulated index+batch counts per
    bucket before probing.
    """
    s_b, bands_b, caches = _shingle_bands_from(batch_docs)
    cand = _incremental_candidates(index_bands, bands_b)
    verified = _verify_pairs(cand, index_shingles.unionByName(s_b))
    matches = verified.groupBy("doc_b").agg(F.min("doc_a").alias("dup_of"))
    verdicts = (batch_docs.select("doc_id")
                .join(matches, F.col("doc_id") == F.col("doc_b"), "left")
                .select("doc_id", "dup_of",
                        F.col("dup_of").isNotNull().alias("is_dup")))

    def release() -> None:
        for c in caches:
            c.unpersist()

    return verdicts, bands_b, s_b, release


def neardup_probe_and_append(batch_docs: DataFrame, idx_bands_dir: str,
                             idx_shingles_dir: str,
                             verdict_dir: str) -> None:
    """The complete foreachBatch body for dedup-on-ingest: probe the
    parquet-backed band index with ``neardup_probe_batch``, append the
    verdicts and the batch's bands/shingles, then RELEASE the per-batch
    persisted frames — the deterministic unpersist a long-running
    stream needs (ADVICE r9: without it every microbatch leaks two
    storage-block sets for the lifetime of the query)."""
    sess = batch_docs.sparkSession
    verdicts, bands_b, s_b, release = neardup_probe_batch(
        batch_docs, sess.read.parquet(idx_bands_dir),
        sess.read.parquet(idx_shingles_dir))
    try:
        verdicts.write.mode("append").parquet(verdict_dir)
        bands_b.write.mode("append").parquet(idx_bands_dir)
        s_b.write.mode("append").parquet(idx_shingles_dir)
    finally:
        release()


@register(
    "stream_neardup_filter",
    oracle=f"""
    WITH {_SQL_MINHASH_PAIR_CTES}
    SELECT d.doc_id,
           MIN(p.doc_a) AS dup_of,
           (MIN(p.doc_a) IS NOT NULL) AS is_dup
    FROM documents d
    LEFT JOIN pairs p ON p.doc_b = d.doc_id
    WHERE d.doc_id >= (SELECT MAX(doc_id) - MAX(doc_id)
                              // {INCR_DELTA_DIVISOR}
                       FROM documents)
    GROUP BY d.doc_id
    """,
    tags=("streaming", "dedup", "minhash", "lsh", "incremental"),
)
def stream_neardup_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup filtering ON INGEST — the dedup-on-arrival shape a
    100 TB pipeline actually runs: every arriving document is verdicted
    against everything that arrived before it (the persisted band
    index plus earlier arrivals), emitting (doc_id, dup_of, is_dup)
    so the downstream writer can drop or keep immediately rather than
    re-running corpus-wide dedup per crawl.

    This is the batch projection (the newest tenth of the id space is
    "the stream", arrivals ordered by doc_id); the TRUE incremental run
    — microbatches through ``neardup_probe_batch`` with the index
    accumulated across batches via foreachBatch — is pinned against
    this exact output in tests/test_streaming.py. The oracle replays
    the full pair pipeline and verdicts each new doc by its smallest
    earlier partner: proof the incremental probe's verdicts equal the
    full recompute's, batch boundaries notwithstanding.

    Scale: per batch the probe is O(|batch| bands) against a
    bucket-partitioned index (the dedup_lsh_bucketed_probe layout) and
    the verdict join is |batch|-sized; the index grows by appending the
    batch's bands — no base×base work ever runs.
    """
    s, bands = _shingle_bands(spark, sf_dir)
    bands.count()  # eager fill: base/delta are non-identical consumers
    max_id = catalog.load(spark, sf_dir, "documents").agg(
        F.max("doc_id")).first()[0]
    tsplit = 0 if max_id is None else max_id - max_id // INCR_DELTA_DIVISOR
    base = bands.filter(F.col("doc_id") < tsplit)
    delta = bands.filter(F.col("doc_id") >= tsplit)
    matches = (_verify_pairs(_incremental_candidates(base, delta), s)
               .groupBy("doc_b").agg(F.min("doc_a").alias("dup_of")))
    arrivals = (catalog.load(spark, sf_dir, "documents")
                .select("doc_id").filter(F.col("doc_id") >= tsplit))
    return (arrivals.join(matches, F.col("doc_id") == F.col("doc_b"), "left")
            .select("doc_id", "dup_of",
                    F.col("dup_of").isNotNull().alias("is_dup")))


MAX_CC_ITERS = 25  # label propagation rounds; converges in O(diameter)
# Below this many symmetrized edge rows the component pass runs as a
# driver union-find on the collected edge list instead of the iterative
# DataFrame loop — the same adaptive move AQE makes when a join side
# turns out tiny: a 2-round propagation costs ~5 scheduled jobs
# (join + agg + checkpoint + probe per round) of pure fixed overhead
# that dwarfs the actual work on a small graph (measured at sf0.1:
# 2.25 s for 512 edge rows → ~0.1 s collected). 1M rows ≈ 16 MB of
# longs — trivial driver memory; a 100 TB near-dup pair graph blows
# past the gate and takes the distributed loop it actually needs.
DRIVER_CC_MAX_EDGES = 1_000_000


def _driver_union_find(sym_rows: list, stats: dict | None) -> list[tuple]:
    """Min-label union-find over collected (u, v) rows; returns
    (id, label) tuples with label = component minimum — bit-identical
    to the fixpoint of the distributed propagation (cross-checked in
    tests/test_llm_ops.py)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in sym_rows:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by MIN so every root is its component's minimum
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    if stats is not None:
        stats["rounds"] = 0
        stats["path"] = "driver-union-find"
    return [(x, find(x)) for x in parent]


def connected_components(edges: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b",
                         max_iters: int = MAX_CC_ITERS,
                         stats: dict | None = None) -> DataFrame:
    """Connected components by min-label propagation: every node starts
    labeled with its own id; each round takes the min of its own and its
    neighbors' labels; fixpoint = components labeled by their min node.

    The iterative-DataFrame pattern (GraphX Pregel's shape without
    GraphX): per round one equi-join + one map-side-combinable min
    aggregation, an eager localCheckpoint to truncate lineage (an
    unbounded iterative plan otherwise re-executes every prior round),
    and a LIMIT-1 convergence probe (skipped in round 1 — any edge
    guarantees a round-1 label change, so the probe there is a wasted
    job). Rounds needed = graph DIAMETER — the right tool for the
    shallow clusters near-dup graphs produce; for long-chain graphs use
    connected_components_star (O(log n) rounds). ``stats["rounds"]``
    reports the converged round count.

    Size-adaptive: a pair graph under DRIVER_CC_MAX_EDGES symmetrized
    rows is solved by a driver union-find on the collected edge list
    (see the constant's rationale); the distributed loop is the default
    the moment the graph is big enough to deserve it.

    Returns (id, label) for every node that appears in an edge.
    """
    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
           .distinct().localCheckpoint())
    if max_iters <= 0:  # clean no-op: identity labels, rounds=0
        if stats is not None:
            stats["rounds"] = 0
        return (sym.select(F.col("u").alias("id")).distinct()
                .withColumn("label", F.col("id")))
    n_sym = sym.count()  # O(1) on the checkpointed frame
    # the union-find solves to the FIXPOINT, so it may only stand in
    # for the loop when the caller asked for full convergence (the
    # default cap), not a bounded number of rounds
    if n_sym <= DRIVER_CC_MAX_EDGES and max_iters >= MAX_CC_ITERS:
        labeled = _driver_union_find(
            [(r["u"], r["v"]) for r in sym.collect()], stats)
        id_type = sym.schema["u"].dataType.simpleString()
        return sym.sparkSession.createDataFrame(
            labeled, f"id {id_type}, label {id_type}")
    labels = (sym.select(F.col("u").alias("id")).distinct()
              .withColumn("label", F.col("id")))
    rounds = 0
    for rounds in range(1, max_iters + 1):
        nbr = (sym.join(labels, sym["v"] == labels["id"])
               .select(sym["u"].alias("id"), "label"))
        merged = (labels.union(nbr)
                  .groupBy("id").agg(F.min("label").alias("label"))
                  .localCheckpoint())
        if rounds == 1:
            changed = 1  # an edge exists (n_sym > 0): round 1 changes
        else:
            changed = (merged.alias("n")
                       .join(labels.alias("o"), "id")
                       .filter(F.col("n.label") != F.col("o.label"))
                       .limit(1).count())
        labels = merged
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
        stats["path"] = "distributed-propagation"
    return labels


def _large_star(canon: DataFrame) -> DataFrame:
    """Large-star (Kiveris et al., 'Connected Components in MapReduce
    and Beyond'): each node u connects every LARGER neighbor to
    m = min(neighbors ∪ {u}). Input/output: canonical directed edges
    (u, v) with u > v, distinct, no self loops."""
    sym = canon.union(canon.select(F.col("v").alias("u"),
                                   F.col("u").alias("v")))
    mins = (sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("mn"), F.col("u")).alias("m")))
    return (sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct())


def _small_star(canon: DataFrame) -> DataFrame:
    """Small-star: each node u (over its SMALLER neighbors N(u), i.e.
    the canonical out-edges) rewires N(u) ∪ {u} to m = min(N(u)):
    emit (w, m) for w in (N(u) \\ {m}) ∪ {u}."""
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))
    with_min = canon.join(mins, "u")
    rewired = (with_min.filter(F.col("v") != F.col("m"))
               .select(F.col("v").alias("u"), F.col("m").alias("v")))
    self_edges = mins.select("u", F.col("m").alias("v"))
    return rewired.union(self_edges).distinct()


def connected_components_star(edges: DataFrame, src: str = "doc_a",
                              dst: str = "doc_b",
                              max_iters: int = MAX_CC_ITERS,
                              stats: dict | None = None) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction — O(log n) rounds on ANY graph shape, vs the label
    propagation's O(diameter): a million-node chain converges in ~20
    rounds instead of a million. Per round: two groupBy-min passes and
    two equi-joins over the (shrinking) edge list, localCheckpoint
    lineage truncation, and a symmetric-difference convergence probe.
    At the fixpoint the edge list IS the component map: every non-root
    node holds exactly one edge to its component's minimum node.

    Same contract as connected_components: (id, label) for every node
    appearing in an edge; label = component min. The two implementations
    are interchangeable and cross-checked in tests.
    """
    canon = (edges.select(
        F.greatest(F.col(src), F.col(dst)).alias("u"),
        F.least(F.col(src), F.col(dst)).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct().localCheckpoint())
    nodes = (edges.select(F.col(src).alias("id"))
             .union(edges.select(F.col(dst).alias("id")))
             .distinct().localCheckpoint())
    rounds = 0
    if max_iters <= 0:  # clean no-op: identity labels, rounds=0
        if stats is not None:
            stats["rounds"] = 0
        return nodes.withColumn("label", F.col("id"))
    for rounds in range(1, max_iters + 1):
        nxt = _small_star(_large_star(canon)).localCheckpoint()
        changed = (nxt.exceptAll(canon).limit(1).count()
                   or canon.exceptAll(nxt).limit(1).count())
        canon = nxt
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    leaf_labels = canon.groupBy("u").agg(F.min("v").alias("label")) \
        .select(F.col("u").alias("id"), "label")
    return (nodes.join(leaf_labels, "id", "left")
            .select("id", F.coalesce("label", "id").alias("label")))


@register(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE {_SQL_MINHASH_PAIR_CTES},
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ), reach(a, b) AS (
      SELECT u, u FROM edges
      UNION
      SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
    ), labeled AS (
      SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
    )
    SELECT cluster_id, COUNT(*) AS n_members,
           MAX(doc_id) AS max_member
    FROM labeled GROUP BY cluster_id
    """,
    tags=("dedup", "cluster", "graph", "iterative"),
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS from the LSH pair list: connected
    components over the pair graph (pair detection alone under-removes —
    A~B and B~C must collapse to one keeper even when A~C missed the
    Jaccard bar). Cluster id = min doc_id in the component; one summary
    row per cluster.

    The DuckDB oracle replays the component labels with a recursive CTE
    over the SAME pair pipeline, so even the iterative algorithm is
    value-gated, not just row-counted.

    Implementation choice, measured not assumed: the LSH pair graph is
    SHALLOW (2 propagation rounds at sf0.1), where min-label
    propagation beats the large-star/small-star alternation (~2.5 s vs
    ~3.7 s — star pays two joins + two aggregations per round). For
    long-chain graphs the O(log n)-round connected_components_star is
    the right call; the two are interchangeable and cross-checked
    (tests/test_llm_ops.py::test_star_components_*).
    """
    pairs = minhash_pairs(spark, sf_dir)
    labels = connected_components(pairs)
    return (labels.groupBy(F.col("label").alias("cluster_id"))
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.max("id").alias("max_member")))


@register(
    "dedup_simhash",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
      FROM documents
    ), sums AS (
      SELECT doc_id,
             [list_sum([CASE WHEN strpos('89abcdef', md5(w)[p]) > 0
                             THEN 1 ELSE -1 END
                        for w in toks])
              for p in range(1, 17)] AS bit_sums
      FROM t
    )
    SELECT CAST(list_sum([CASE WHEN bit_sums[d] > 0
                               THEN (1::BIGINT << (d - 1)) ELSE 0 END
                          for d in range(1, 17)]) AS BIGINT) AS simhash,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS representative
    FROM sums
    GROUP BY 1
    HAVING COUNT(*) > 1
    """,
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash buckets: 16-bit signature from per-token md5 hex digits
    (digit ≥ 8 votes +1, else −1 per position); docs sharing a signature
    are near-dup candidates.

    Signature built RELATIONALLY (explode distinct tokens → one md5 per
    token → 16 map-combinable CASE sums per doc), the same shape as the
    64-bit variant below: the HOF-aggregate form (aggregate over toks
    per position) hits Catalyst's projection-collapse recompute — each
    of the 16 positions re-evaluated the md5 transform, measured 30 s
    vs 2 s at sf0.1. Clustering is one groupBy on the 16-bit key.
    """
    docs = catalog.spread(catalog.load(spark, sf_dir, "documents"))  # r14: guide §2.5
    toks = (docs
            .select("doc_id",
                    F.explode(F.array_distinct(F.split("text", " ")))
                    .alias("w"))
            .select("doc_id", F.md5("w").alias("hx")))
    votes = [F.sum(
        F.when(F.conv(F.substring("hx", p + 1, 1), 16, 10)
                .cast("int") >= 8, 1).otherwise(-1)).alias(f"s{p}")
        for p in range(16)]
    sums = toks.groupBy("doc_id").agg(*votes)
    simhash = None
    for p in range(16):
        term = (F.when(F.col(f"s{p}") > 0, F.lit(1 << p).cast("bigint"))
                .otherwise(F.lit(0).cast("bigint")))
        simhash = term if simhash is None else simhash + term
    return (sums.select(simhash.alias("simhash"), "doc_id")
            .groupBy("simhash")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("representative"))
            .filter(F.col("n_docs") > 1))


SIMHASH64_CHUNKS = 4  # pigeonhole: hamming ≤ 3 ⇒ ≥1 of 4 16-bit chunks equal
HAMMING_MAX = 3


@register(
    "dedup_simhash64_hamming",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
      FROM documents
    ), hx AS (
      SELECT doc_id, [md5(w) for w in toks] AS hs FROM t
    ), sig AS (
      SELECT doc_id,
             [CAST(list_sum([CASE WHEN
                 (CAST('0x' || h[1 + b // 4] AS INTEGER) >> (b % 4)) % 2 = 1
                 THEN 1 ELSE -1 END for h in hs]) AS BIGINT)
              for b in range(0, 64)] AS bit_sums
      FROM hx
    ), h AS (
      SELECT doc_id,
             [CAST(list_sum([CASE WHEN bit_sums[c * 16 + d + 1] > 0
                                  THEN (1::BIGINT << d) ELSE 0 END
                             for d in range(0, 16)]) AS BIGINT)
              for c in range(0, {SIMHASH64_CHUNKS})] AS chunks
      FROM sig
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.chunks AS ca, b.chunks AS cb
      FROM h a, range(0, {SIMHASH64_CHUNKS}) r(c)
      JOIN h b ON a.chunks[r.c + 1] = b.chunks[r.c + 1]
      WHERE a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(list_sum([bit_count(xor(ca[i], cb[i]))
                          for i in range(1, {SIMHASH64_CHUNKS} + 1)]) AS INTEGER)
             AS hamming
    FROM cand
    WHERE list_sum([bit_count(xor(ca[i], cb[i]))
                    for i in range(1, {SIMHASH64_CHUNKS} + 1)]) <= {HAMMING_MAX}
    """,
    tags=("dedup", "simhash", "hamming"),
)
def dedup_simhash64_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup pairs within Hamming distance ≤ 3, found
    WITHOUT an all-pairs scan: the signature splits into 4 16-bit
    chunks, and any pair within Hamming 3 must share ≥1 exact chunk
    (pigeonhole) — so candidates come from 4 chunk-equality joins.

    Signature: bit b votes +1 when bit (b mod 4) of hex digit (b div 4)
    of md5(token) is set, summed over distinct tokens. This is the
    production-shape SimHash dedup (64-bit + banded Hamming probing);
    the 16-bit ``dedup_simhash`` variant above is its didactic little
    sibling.
    """
    docs = catalog.spread(catalog.load(spark, sf_dir, "documents"))  # r14: guide §2.5
    # Signature fully JVM-side and RELATIONAL: explode distinct tokens
    # to rows, one md5 per token, 64 map-combinable CASE sums per doc.
    # Not a SQL higher-order aggregate — HOF lambdas don't codegen, and
    # projection collapse inlines the 64-element bit_sums array into
    # every element_at (a 64× recompute; measured 226s vs <2s at
    # sf0.01). The row form keeps md5 in ONE projection under the
    # aggregate, which partial-aggregates map-side before any shuffle.
    # md5 is standardized, so the DuckDB oracle replays it bit-for-bit.
    toks = (docs
            .select("doc_id",
                    F.explode(F.array_distinct(F.split("text", " ")))
                    .alias("w"))
            .select("doc_id", F.md5("w").alias("hx")))
    # Parse the 16 hex digits as TWO 32-bit integers (2 conv calls per
    # row instead of 16 single-digit ones — measured ~35% off the
    # signature stage); the bit mapping below reproduces the original
    # per-digit semantics exactly, so the oracle is unchanged: bit b
    # lives at nibble d = b//4, i.e. shifted 4*(7-d) (or 4*(15-d) in
    # the high half) plus the in-nibble offset b%4.
    halves = toks.select(
        "doc_id",
        F.conv(F.substring("hx", 1, 8), 16, 10).cast("bigint").alias("p0"),
        F.conv(F.substring("hx", 9, 8), 16, 10).cast("bigint").alias("p1"))

    def _bit(b: int):
        d, r = b // 4, b % 4
        col, pos = (F.col("p0"), 7 - d) if d < 8 else (F.col("p1"), 15 - d)
        return F.shiftright(col, 4 * pos + r).bitwiseAND(1)

    votes = [F.sum(F.when(_bit(b) == 1, 1).otherwise(-1)).alias(f"s{b}")
             for b in range(64)]
    sums = halves.groupBy("doc_id").agg(*votes)
    chunk_cols = []
    for c in range(SIMHASH64_CHUNKS):
        bits = [F.when(F.col(f"s{c * 16 + d}") > 0,
                       F.lit(1 << d).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
                for d in range(16)]
        acc = bits[0]
        for expr in bits[1:]:
            acc = acc + expr
        chunk_cols.append(acc.alias(f"c{c}"))
    h = sums.select("doc_id", *chunk_cols).persist()
    # 4 scalar chunk columns, not an array: the join rows stay flat, and
    # hamming is 4 codegen'd bit_count(xor) terms instead of a
    # zip_with/aggregate lambda pair per candidate row
    hc = h.select(
        "doc_id", *[f"c{c}" for c in range(SIMHASH64_CHUNKS)],
        F.posexplode(F.array(*[f"c{c}" for c in range(SIMHASH64_CHUNKS)]))
         .alias("chunk_id", "chunk_val"))
    # r14: persist the CAPPED chunk table — both sides of the chunk
    # join otherwise re-run the posexplode + cap count-shuffle +
    # anti-join from the h cache (the band-table lesson; profiled as
    # two near-identical 32-task stages)
    hc = cap_hot_buckets(hc, ["chunk_id", "chunk_val"]).persist()
    a = hc.select(F.col("doc_id").alias("doc_a"),
                  *[F.col(f"c{c}").alias(f"a{c}")
                    for c in range(SIMHASH64_CHUNKS)],
                  "chunk_id", "chunk_val")
    b = hc.select(F.col("doc_id").alias("doc_b"),
                  *[F.col(f"c{c}").alias(f"b{c}")
                    for c in range(SIMHASH64_CHUNKS)],
                  F.col("chunk_id").alias("cid"), F.col("chunk_val").alias("cv"))
    hamming = None
    for c in range(SIMHASH64_CHUNKS):
        term = F.bit_count(F.col(f"a{c}").bitwiseXOR(F.col(f"b{c}")))
        hamming = term if hamming is None else hamming + term
    # filter on hamming BEFORE the pair-dedup shuffle: a pair appears up
    # to 4× (once per shared chunk), but only near-dup pairs — a tiny
    # fraction — reach the distinct
    return (a.join(b, (F.col("chunk_id") == F.col("cid"))
                   & (F.col("chunk_val") == F.col("cv"))
                   & (F.col("doc_a") < F.col("doc_b")))
            .withColumn("hamming", hamming.cast("int"))
            .filter(F.col("hamming") <= HAMMING_MAX)
            .select("doc_a", "doc_b", "hamming")
            .distinct())


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             md5(substr(text, 1, 40)) AS block_key,
             list_distinct([substr(text, i, {NGRAM_W})
                            for i in range(1, length(text) - {NGRAM_W - 2})])
               AS grams
      FROM documents
      WHERE length(text) >= {NGRAM_W}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / len(list_distinct(a.grams || b.grams)), 6) AS jaccard
    FROM g a JOIN g b
      ON a.block_key = b.block_key AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / len(list_distinct(a.grams || b.grams)) >= 0.5
    """,
    tags=("dedup", "ngram"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-5-gram Jaccard on prefix-blocked candidate pairs.

    Blocking key = md5 of the 40-char prefix (cheap, deterministic);
    exact n-gram Jaccard only within blocks. Complements MinHash: char
    n-grams catch word-boundary edits word-shingles miss. A templated
    corpus (shared prefixes) makes one block quadratic — same hot-bucket
    cap as the LSH joins.
    """
    docs = catalog.spread(catalog.load(spark, sf_dir, "documents"))  # r14: guide §2.5
    # repartition BEFORE the gram build: a single-file documents table
    # scans as ONE partition, and the per-row gram expression (~len·W
    # bytes of substrings per doc) is the dominant CPU — left on the
    # scan partitioning it runs on one of 32 cores (measured 18.6 s at
    # sf0.1 vs 3.0 s at 10x, whose multi-file layout parallelized;
    # same trap as the thumbnail codec, BASELINE.md round 4)
    par = docs.sparkSession.sparkContext.defaultParallelism
    g = (docs.filter(F.length("text") >= NGRAM_W)
         .repartition(par)
         .select("doc_id",
                 F.md5(F.substring("text", 1, 40)).alias("block_key"),
                 F.expr(f"""array_distinct(transform(
                     sequence(1, length(text) - {NGRAM_W - 1}),
                     i -> substring(text, i, {NGRAM_W})))""").alias("grams")))
    # persist BEFORE the cap: the bucket-count aggregate and both join
    # sides otherwise rebuild the ~(len·W)-byte gram arrays from the
    # scan (measured 4.6 s → 3.0 s at sf0.1); same rationale as the
    # minhash shingle persist above
    g = cap_hot_buckets(g.persist(), ["block_key"])
    a = g.select(F.col("doc_id").alias("doc_a"), "block_key",
                 F.col("grams").alias("grams_a"))
    b = g.select(F.col("doc_id").alias("doc_b"),
                 F.col("block_key").alias("bk"),
                 F.col("grams").alias("grams_b"))
    jac = (F.size(F.array_intersect("grams_a", "grams_b")).cast("double")
           / F.size(F.array_union("grams_a", "grams_b")))
    return (a.join(b, (F.col("block_key") == F.col("bk"))
                   & (F.col("doc_a") < F.col("doc_b")))
            .filter(jac >= 0.5)
            .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard")))


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, label, v,
             sqrt(list_sum([x * x for x in v])) AS nrm
      FROM e
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)])
                 / (a.nrm * b.nrm), 4) AS cosine
    FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)])
          / (a.nrm * b.nrm) >= 0.4
    """,
    tags=("dedup", "embedding"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ 0.4 within label blocks
    (semantic blocking — the brute-force fallback; the ANN path lives in
    operators/similarity.py).

    All math in float64 (both engines upcast the float32 column first);
    cosine rounded to 4 dp for cross-engine summation-order safety.
    """
    emb = catalog.spread(  # r14: parallelize the 1-file scan (guide §2.5)
        catalog.load(spark, sf_dir, "embeddings"))
    e = emb.select("vec_id", "label",
                   F.col("embedding").cast("array<double>").alias("v"))
    n = e.withColumn(
        "nrm", F.sqrt(F.expr("aggregate(v, 0D, (acc, x) -> acc + x * x)")))
    a = n.select(F.col("vec_id").alias("vec_a"), F.col("label").alias("la"),
                 F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = n.select(F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"),
                 F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    dot = F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    cos = dot / (F.col("na") * F.col("nb"))
    return (a.join(b, (F.col("la") == F.col("lb"))
                   & (F.col("vec_a") < F.col("vec_b")))
            .filter(cos >= 0.4)
            .select("vec_a", "vec_b", F.round(cos, 4).alias("cosine")))


@register(
    "dedup_apply_minhash",
    oracle=f"""
    WITH RECURSIVE {_SQL_MINHASH_PAIR_CTES},
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ), reach(a, b) AS (
      SELECT u, u FROM edges
      UNION
      SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
    ), labeled AS (
      SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
    ), removed AS (
      SELECT doc_id FROM labeled WHERE doc_id <> cluster_id
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           COUNT(r.doc_id) AS n_removed,
           COUNT(*) - COUNT(r.doc_id) AS n_kept
    FROM documents d LEFT JOIN removed r USING (doc_id)
    GROUP BY d.source
    """,
    tags=("dedup", "minhash", "pipeline", "apply"),
)
def dedup_apply_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the near-dup verdicts: connected components over the LSH
    pair graph pick one keeper (min doc_id) per cluster; every other
    member is removed and the surviving corpus is reported per source.
    Detection alone (dedup_minhash_lsh) is half the pipeline — this is
    the half that changes the training set.

    Scale: pairs + iterative components as in dedup_cluster_components;
    the removal set (non-keepers) is a broadcastable fraction of the
    corpus joined back as a left-anti filter — the corpus itself never
    shuffles for the removal.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    labels = connected_components(minhash_pairs(spark, sf_dir))
    removed = (labels.filter(F.col("id") != F.col("label"))
               .select(F.col("id").alias("doc_id")))
    return (docs.join(F.broadcast(removed).withColumn("__rm", F.lit(1)),
                      "doc_id", "left")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.count("__rm").alias("n_removed"),
                 (F.count(F.lit(1)) - F.count("__rm")).alias("n_kept")))


@register(
    "dedup_priority_keeper",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source, md5(substr(text, 1, 40)) AS h,
             TRY_CAST(substr(source, 4) AS INTEGER) % 3 AS priority
      FROM documents
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY h
                                ORDER BY priority, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY h) AS n_members
      FROM fp
    )
    SELECT h AS cluster, doc_id AS keeper_doc, source AS keeper_source,
           CAST(n_members AS BIGINT) AS n_members
    FROM ranked WHERE rk = 1 AND n_members > 1
    """,
    tags=("dedup", "keeper", "priority"),
)
def dedup_priority_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-priority keeper selection: when near-duplicates span
    sources, keep the copy from the most-trusted tier (the wiki-beats-
    CommonCrawl rule every real mixture dedup applies), tie-broken by
    doc_id. Clusters come from the 40-char-prefix content fingerprint;
    the keeper is a map-side-combinable min(struct(priority, doc_id))
    — no window over the corpus — with one narrow self-join to recover
    the keeper's source.

    Reference analog: none — complements dedup_apply_minhash's
    min-doc_id keeper with the policy-ordered variant.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", "source",
        F.md5(F.substring("text", 1, 40)).alias("h"),
        F.expr("TRY_CAST(substring(source, 4) AS INT) % 3")
        .alias("priority"))
    agg = (fp.groupBy("h")
           .agg(F.min(F.struct("priority", "doc_id")).alias("m"),
                F.count(F.lit(1)).alias("n_members"))
           .filter(F.col("n_members") > 1))
    keeper = fp.select(F.col("doc_id").alias("kd"),
                       F.col("source").alias("keeper_source"))
    return (agg.join(keeper, agg["m"]["doc_id"] == F.col("kd"))
            .select(F.col("h").alias("cluster"),
                    F.col("kd").alias("keeper_doc"),
                    "keeper_source",
                    F.col("n_members").cast("bigint").alias("n_members")))


# Recall-eval sample bound: the eval runs brute-force exact Jaccard on
# a FIXED id-prefix sample (all-pairs on <=200 docs = <=19,900 array
# intersections), so its cost is constant at ANY corpus size — the
# production observability pattern: estimate banding recall on a
# sample, never on the corpus.
EVAL_SAMPLE_MAX = 200

# Parity pin (ADVICE r11): the Spark side's candidates come from
# cap_hot_buckets-capped bands while the oracle builds uncapped bands —
# equivalent ONLY while a band bucket cannot overflow the cap within
# the sample (a bucket holds at most one row per doc, so bucket size
# <= EVAL_SAMPLE_MAX). Raising the sample past the cap would silently
# diverge the two engines.
if EVAL_SAMPLE_MAX > HOT_BUCKET_CAP:  # not assert: survives python -O
    raise RuntimeError(
        "dedup_lsh_recall_eval parity requires EVAL_SAMPLE_MAX <= "
        "HOT_BUCKET_CAP (capped Spark bands vs uncapped oracle bands)")


@register(
    "dedup_lsh_recall_eval",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE doc_id < {EVAL_SAMPLE_MAX}
    ), s AS (
      SELECT doc_id,
             list_distinct([CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
                            for x in {_SQL_SHINGLES}]) AS hs
      FROM t
      WHERE len(toks) >= {SHINGLE_W}
    ), m AS (
      SELECT doc_id,
             [list_min([([{','.join(str(a) for a in MINHASH_A)}][k + 1]
                          * (h % {MINHASH_P})
                         + [{','.join(str(b) for b in MINHASH_B)}][k + 1])
                        % {MINHASH_P} for h in hs])
              for k in range(0, {MINHASH_K})] AS sig
      FROM s
    ), bands AS (
      SELECT doc_id, b AS band_id,
             CAST(sig[{MINHASH_R} * b + 1] AS VARCHAR) || ',' ||
             CAST(sig[{MINHASH_R} * b + 2] AS VARCHAR) AS band_key
      FROM m, range(0, {MINHASH_BANDS}) AS r(b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ), truth AS (
      SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b
      FROM s sa JOIN s sb ON sa.doc_id < sb.doc_id
      WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
            / len(list_distinct(sa.hs || sb.hs)) >= {JACCARD_THRESHOLD}
    ), counts AS (
      SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_docs,
             CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true_pairs,
             CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
             CAST((SELECT COUNT(*) FROM truth tt JOIN cand cc
                   ON tt.doc_a = cc.doc_a AND tt.doc_b = cc.doc_b)
                  AS BIGINT) AS tp
    )
    SELECT n_docs, n_true_pairs, n_candidates, tp,
           n_candidates - tp AS fp,
           n_true_pairs - tp AS fn,
           COALESCE(ROUND(CAST(tp AS DOUBLE) / NULLIF(n_candidates, 0), 6),
                    1.0) AS cand_precision,
           COALESCE(ROUND(CAST(tp AS DOUBLE) / NULLIF(n_true_pairs, 0), 6),
                    1.0) AS pair_recall
    FROM counts
    """,
    tags=("dedup", "minhash", "lsh", "evaluation"),
)
def dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding quality EVAL — the observability gate every
    production dedup runs beside the pipeline itself: on the fixed
    EVAL_SAMPLE_MAX-doc sample, brute-force exact-Jaccard ground truth
    (every pair, no index) vs the banded candidate generator (the SAME
    capped band build the real pipeline uses), reported as
    tp/fp/fn + candidate precision (how much verification work the
    bands waste) + pair recall (how many true near-dups banding loses
    — the number the b/r band-curve tuning actually targets). The
    convention for an empty denominator is 1.0 (no candidates wasted /
    no pairs to lose).

    Scale: the sample is an id-prefix pushed into the scan, so truth
    is <=C(200,2) pairs via a broadcast nested-loop — constant work at
    any corpus size; the band side is the standard capped band
    self-join on the same 200 docs."""
    docs = (catalog.load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < EVAL_SAMPLE_MAX))
    s, bands, _ = _shingle_bands_from(docs)
    # two INDEPENDENT consumers of each cache (truth all-pairs + the
    # candidate self-join + tp join) — eager fill before the fan-out
    s.count()
    bands.count()
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    sa = s.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
    sb = s.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
    jac = (F.size(F.array_intersect("hs_a", "hs_b")).cast("double")
           / F.size(F.array_union("hs_a", "hs_b")))
    truth = (sa.join(sb, F.col("doc_a") < F.col("doc_b"))
             .filter(jac >= JACCARD_THRESHOLD)
             .select("doc_a", "doc_b"))
    n_docs = s.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    n_true = truth.agg(F.count(F.lit(1)).cast("bigint")
                       .alias("n_true_pairs"))
    n_cand = cand.agg(F.count(F.lit(1)).cast("bigint")
                      .alias("n_candidates"))
    tp = (truth.join(cand, ["doc_a", "doc_b"])
          .agg(F.count(F.lit(1)).cast("bigint").alias("tp")))
    out = n_docs.crossJoin(n_true).crossJoin(n_cand).crossJoin(tp)
    return out.select(
        "n_docs", "n_true_pairs", "n_candidates", "tp",
        (F.col("n_candidates") - F.col("tp")).alias("fp"),
        (F.col("n_true_pairs") - F.col("tp")).alias("fn"),
        F.coalesce(F.round(F.col("tp").cast("double")
                           / F.nullif(F.col("n_candidates"), F.lit(0)), 6),
                   F.lit(1.0)).alias("cand_precision"),
        F.coalesce(F.round(F.col("tp").cast("double")
                           / F.nullif(F.col("n_true_pairs"), F.lit(0)), 6),
                   F.lit(1.0)).alias("pair_recall"))
