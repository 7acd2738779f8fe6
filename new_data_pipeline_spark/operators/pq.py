"""Product quantization (Jégou et al., "Product Quantization for
Nearest Neighbor Search"): the third ANN regime beside LSH buckets and
IVF cells — compress each vector into M sub-space code ids, answer
queries by asymmetric distance computation (ADC: sum of per-subspace
query-to-codeword distance-table lookups), never touching the original
vectors at query time.

Why it matters at 100 TB: IVF prunes WHICH vectors a query scores; PQ
shrinks WHAT a scored vector costs — a 64-dim float vector (256 B)
becomes M=4 one-byte codes, so the candidate scan is memory-bound on
codes, not vectors, and the distance tables (M×K doubles per query)
broadcast for free. Production systems compose both (IVF-PQ); here PQ
is gated standalone so its arithmetic is independently verified.

Reference analog: none — the reference stores flattened float32
vectors as protobuf Datum payloads (serialize.py:280,304 float32
coercion; reconstruction serialize.py:697-723) but has no similarity
surface over them; this is the SURVEY.md §2.2
similarity-search extension's third regime beside LSH and IVF
(operators/similarity.py).

Determinism devices (same family as the IVF oracle):
- codebooks are a deterministic id-sample of the corpus's own
  subvectors (vec_id % m == r with m = ceil(N / PQ_K_TARGET), so the
  codebook size is ~constant in N) — no trained randomness,
  SQL-replayable via a COUNT(*) scalar subquery;
- the cross-subspace ADC sum is materialized as M per-subspace columns
  (each an exact single-element aggregate) added in fixed left-to-right
  order — NEVER a float SUM over rows, whose reduction order neither
  engine guarantees;
- ties rank by candidate id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

PQ_M = 16          # sub-spaces (4 dims each over the 64-dim embeddings:
                   # finer quantization recovers the recall that coarse
                   # 16-dim subvectors measurably lose)
PQ_SD = 4          # dims per sub-space
# FIXED codebook size (real PQ trains K=256 codewords per sub-space so
# codes fit one byte). The sampling modulus is DERIVED from the corpus
# count — m = ceil(N / K) — so K stays ~constant as N grows. The r6
# scale audit measured the old fixed-modulus policy (K ∝ N/7) at
# alpha=1.46 (10x data -> 28.6x wall): encode cost is N·M·K, so K must
# not scale with N. ceil-division in exact integer arithmetic replays
# identically in the oracle's scalar subquery.
PQ_K_TARGET = 256
PQ_CENT_RESIDUE = 3  # base residue, taken mod the derived modulus
N_QUERIES = 10
TOP_K = 5


def codebook_mod(n_rows: int) -> int:
    """Sampling modulus for a ~PQ_K_TARGET-word codebook: the id-sample
    vec_id % m == r keeps ~N/m vectors, so m = ceil(N/K) pins the
    codebook size regardless of corpus scale. Mirrors the oracle's
    ``GREATEST(1, (COUNT(*) + K - 1) // K)`` exactly (positive integer
    arithmetic only — no float rounding to disagree on)."""
    return max(1, (n_rows + PQ_K_TARGET - 1) // PQ_K_TARGET)

# flat scalar chain, NOT a higher-order aggregate/zip_with fold: at
# THIS dimensionality (4) the HOF route's per-lambda overhead measured
# ~2.5x slower end-to-end on the N*M*K scoring join (9.2 -> 3.7 s at
# sf0.1). The trade inverts at larger dims — an A/B on the 64-dim
# clustering dots showed the chain 1.5x SLOWER there (64 indexed
# element_at calls cost more than one fold pass), so clustering.py
# keeps its folds. Left-to-right ascending addition matches the
# oracle's list_sum fold order exactly either way.
_D2 = " + ".join(
    f"(sub[{i}] - cent_sub[{i}]) * (sub[{i}] - cent_sub[{i}])"
    for i in range(PQ_SD))


def _subspaces(df: DataFrame, id_col: str) -> DataFrame:
    """(id, label?, s, sub): each vector L2-NORMALIZED then exploded
    into its M double subvectors — one narrow pass, no shuffle.

    Normalization first makes PQ's L2 arithmetic rank-equivalent to
    the cosine the rest of the similarity family uses (||a-b||² =
    2 - 2·cos for unit vectors), so the recall gate compares like with
    like and quantization is the only loss."""
    raw = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    nrm = F.expr("sqrt(aggregate(transform(embedding, "
                 "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
                 "0D, (acc, x) -> acc + x))")
    # r14: spread the single-file scan before the explode — the
    # N·M·K scoring join's map side (the d2 compute over every
    # (subspace, codeword) pair) otherwise serializes on ONE core
    # (guide §2.5; catalog.spread docstring)
    base = catalog.spread(df).select(F.col("vec_id").alias(id_col), "label",
                                     raw.alias("v0"), nrm.alias("n0"))
    pieces = F.array(*[
        F.struct(F.lit(s).alias("s"),
                 F.slice(F.expr("transform(v0, x -> x / n0)"),
                         s * PQ_SD + 1, PQ_SD).alias("sub"))
        for s in range(PQ_M)])
    return (base.select(id_col, "label", F.explode(pieces).alias("p"))
            .select(id_col, "label", "p.s", "p.sub"))


# per-subspace partial columns: each an exact single-element aggregate;
# the ADC total is their FIXED-ORDER left-to-right sum (see docstring)
_SQL_PART_COLS = ",\n             ".join(
    f"SUM(CASE WHEN c.s = {s} THEN q.d2 END) AS t{s}"
    for s in range(PQ_M))
_SQL_ADC = " + ".join(f"t{s}" for s in range(PQ_M))


# Shared by sim_pq_topk and sim_pq_bucketed_probe: persisting the code
# table + codebook must not change WHAT any query retrieves, so both
# gates carry the identical answer contract.
_PQ_ORACLE = f"""
    WITH km AS (
      SELECT GREATEST(1, (COUNT(*) + {PQ_K_TARGET} - 1) // {PQ_K_TARGET})
               AS md
      FROM embeddings
    ), e0 AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v0
      FROM embeddings
    ), e AS (
      SELECT vec_id, label,
             [x / sqrt(list_sum([y * y for y in v0])) for x in v0] AS v
      FROM e0
    ), subs AS (
      SELECT vec_id, label, CAST(t.range AS INT) AS s,
             list_slice(v, t.range * {PQ_SD} + 1,
                        t.range * {PQ_SD} + {PQ_SD}) AS sub
      FROM e CROSS JOIN range(0, {PQ_M}) t
    ), cents AS (
      SELECT vec_id AS cent_id, s, sub AS cent_sub
      FROM subs WHERE vec_id % (SELECT md FROM km)
                     = {PQ_CENT_RESIDUE} % (SELECT md FROM km)
    ), dists AS (
      SELECT subs.vec_id, subs.label, subs.s, cents.cent_id,
             list_sum([(subs.sub[i] - cents.cent_sub[i])
                       * (subs.sub[i] - cents.cent_sub[i])
                       for i in range(1, {PQ_SD} + 1)]) AS d2
      FROM subs JOIN cents USING (s)
    ), codes AS (
      SELECT vec_id, label, s, cent_id AS code FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                     ORDER BY d2, cent_id) AS arn
        FROM dists) WHERE arn = 1
    ), qtab AS (
      SELECT vec_id AS query_id, s, cent_id, d2
      FROM dists WHERE vec_id < {N_QUERIES}
    ), parts AS (
      SELECT q.query_id, c.vec_id AS candidate_id, c.label,
             {_SQL_PART_COLS}
      FROM codes c JOIN qtab q ON q.s = c.s AND q.cent_id = c.code
      WHERE q.query_id <> c.vec_id
      GROUP BY 1, 2, 3
    ), ranked AS (
      SELECT query_id, candidate_id, label,
             {_SQL_ADC} AS adc,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY {_SQL_ADC},
                                         candidate_id) AS rn
      FROM parts
    )
    SELECT query_id, candidate_id, label,
           round(adc, 4) AS adc_dist, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {TOP_K}
    """


@register(
    "sim_pq_topk",
    oracle=_PQ_ORACLE,
    tags=("similarity", "pq", "approx"),
)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC approximate nearest neighbors: encode the corpus into M
    per-subspace code ids against deterministic codebooks, then rank
    candidates for each query by the sum of its precomputed
    query-to-codeword distances. The whole pipeline — slicing,
    codebooks, argmin encoding, table lookups, fixed-order ADC sum —
    replays bit-exactly in the DuckDB oracle.
    """
    emb = catalog.load(spark, sf_dir, "embeddings")
    # count-derived modulus: a parquet-metadata count, and the single
    # device that keeps the codebook size CONSTANT in N (see module
    # docstring — K ∝ N made the index build O(N^2))
    mod = codebook_mod(emb.count())
    res = PQ_CENT_RESIDUE % mod
    subs = _subspaces(emb, "vec_id")
    cents = (subs.filter(F.col("vec_id") % mod == res)
             .select(F.col("vec_id").alias("cent_id"), "s",
                     F.col("sub").alias("cent_sub")))
    dists = (subs.join(F.broadcast(cents), "s")
             .withColumn("d2", F.expr(_D2)))

    # argmin via map-side-combinable min_by over (d2, cent_id) — NOT a
    # row_number window, which would shuffle-and-sort all N*M*K scored
    # rows (measured 4x slower at sf0.1); the struct's second field is
    # the deterministic tie-break the oracle's ORDER BY d2, cent_id
    # replays
    codes = (dists.groupBy("vec_id", "label", "s")
             .agg(F.expr("min_by(cent_id, struct(d2, cent_id))")
                  .alias("code")))
    # qs/qcent aliases, not bare s/cent_id: codes and qtab share the
    # `dists` lineage, so a codes["s"] == qtab["s"] condition initially
    # references the SAME attribute on both sides. Self-join
    # deduplication re-keys it correctly (results were always right),
    # but the analyzer logs the "trivially true equals predicate
    # 's == 's" warning for every execution — and distinct names keep
    # the condition unambiguous if the lineage is ever refactored
    # (VERDICT r9 #7).
    qtab = (dists.filter(F.col("vec_id") < N_QUERIES)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("s").alias("qs"),
                    F.col("cent_id").alias("qcent"),
                    F.col("d2").alias("qd2")))

    parts = (codes.join(qtab, (codes["s"] == F.col("qs"))
                        & (codes["code"] == F.col("qcent")))
             .filter(F.col("query_id") != F.col("vec_id"))
             .groupBy("query_id", F.col("vec_id").alias("candidate_id"),
                      "label")
             .agg(*[F.sum(F.when(codes["s"] == s, F.col("qd2")))
                    .alias(f"t{s}") for s in range(PQ_M)]))
    # fixed-order addition (see module docstring): t0 + t1 + ... left
    # to right, mirroring _SQL_ADC exactly
    adc = F.col("t0")
    for _s in range(1, PQ_M):
        adc = adc + F.col(f"t{_s}")
    w = Window.partitionBy("query_id").orderBy(adc.asc(),
                                               F.col("candidate_id"))
    return (parts
            .withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= TOP_K)
            .select("query_id", "candidate_id", "label",
                    F.round(adc, 4).alias("adc_dist"), "rn"))


# ---------------------------------------------------------------------
# IVF-PQ composition: the production billion-scale ANN layout (FAISS
# IndexIVFPQ; Jégou et al. §V). IVF prunes WHICH vectors a query
# scores (nprobe cells out of C); PQ shrinks WHAT each scored vector
# costs (M one-byte codes + table lookups instead of a 64-dim float
# dot). Candidate work per query drops from N (PQ alone) to
# N·nprobe/C, and each candidate costs M lookups, not d multiplies —
# the two indexes compose multiplicatively, which is why every
# large-scale deployment runs them together.
# ---------------------------------------------------------------------

from new_data_pipeline_spark.operators.similarity import (  # noqa: E402
    IVF_CENT_RESIDUE, IVF_C_TARGET, IVF_NPROBE, ivf_mod, _normalized)

_IVFPQ_SQL_PARTS = ",\n             ".join(
    f"SUM(CASE WHEN c.s = {s} THEN q.d2 END) AS t{s}"
    for s in range(PQ_M))


# Shared by sim_ivfpq_topk and sim_ivfpq_bucketed_probe: persisting the
# index bucketed by cell must not change WHAT any query retrieves, so
# both gates carry the identical answer contract.
_IVFPQ_ORACLE = f"""
    WITH kmq AS (
      SELECT GREATEST(1, (COUNT(*) + {PQ_K_TARGET} - 1) // {PQ_K_TARGET})
               AS md
      FROM embeddings
    ), kmc AS (
      SELECT GREATEST(1, (COUNT(*) + {IVF_C_TARGET} - 1) // {IVF_C_TARGET})
               AS md
      FROM embeddings
    ), e0 AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v0
      FROM embeddings
    ), n AS (
      SELECT vec_id, label, v0 AS v,
             sqrt(list_sum([x * x for x in v0])) AS nrm
      FROM e0
    ), cents AS (
      SELECT vec_id AS cent_id, v AS cent_v, nrm AS cent_n
      FROM n WHERE vec_id % (SELECT md FROM kmc)
                   = {IVF_CENT_RESIDUE} % (SELECT md FROM kmc)
    ), sc AS (
      SELECT n.vec_id, cents.cent_id,
             list_sum([n.v[i] * cents.cent_v[i]
                       for i in range(1, len(n.v) + 1)])
               / (n.nrm * cents.cent_n) AS ccos
      FROM n CROSS JOIN cents
    ), ra AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY ccos DESC, cent_id) AS arn
      FROM sc
    ), cell_of AS (
      SELECT vec_id, cent_id AS cell FROM ra WHERE arn = 1
    ), probes AS (
      SELECT vec_id AS query_id, cent_id AS cell
      FROM ra WHERE vec_id < {N_QUERIES} AND arn <= {IVF_NPROBE}
    ), en AS (
      SELECT vec_id, label, [x / nrm for x in v] AS vn FROM n
    ), subs AS (
      SELECT vec_id, label, CAST(t.range AS INT) AS s,
             list_slice(vn, t.range * {PQ_SD} + 1,
                        t.range * {PQ_SD} + {PQ_SD}) AS sub
      FROM en CROSS JOIN range(0, {PQ_M}) t
    ), pcents AS (
      SELECT vec_id AS cent_id, s, sub AS cent_sub
      FROM subs WHERE vec_id % (SELECT md FROM kmq)
                      = {PQ_CENT_RESIDUE} % (SELECT md FROM kmq)
    ), dists AS (
      SELECT subs.vec_id, subs.label, subs.s, pcents.cent_id,
             list_sum([(subs.sub[i] - pcents.cent_sub[i])
                       * (subs.sub[i] - pcents.cent_sub[i])
                       for i in range(1, {PQ_SD} + 1)]) AS d2
      FROM subs JOIN pcents USING (s)
    ), codes AS (
      SELECT vec_id, label, s, cent_id AS code FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                     ORDER BY d2, cent_id) AS arn
        FROM dists) WHERE arn = 1
    ), qtab AS (
      SELECT vec_id AS query_id, s, cent_id, d2
      FROM dists WHERE vec_id < {N_QUERIES}
    ), cand AS (
      SELECT p.query_id, c.vec_id AS candidate_id
      FROM probes p JOIN cell_of c ON p.cell = c.cell
      WHERE p.query_id <> c.vec_id
    ), parts AS (
      SELECT q.query_id, c.vec_id AS candidate_id, c.label,
             {_IVFPQ_SQL_PARTS}
      FROM codes c
      JOIN cand ON cand.candidate_id = c.vec_id
      JOIN qtab q ON q.query_id = cand.query_id
                 AND q.s = c.s AND q.cent_id = c.code
      GROUP BY 1, 2, 3
    ), ranked AS (
      SELECT query_id, candidate_id, label,
             {_SQL_ADC} AS adc,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY {_SQL_ADC},
                                         candidate_id) AS rn
      FROM parts
    )
    SELECT query_id, candidate_id, label,
           round(adc, 4) AS adc_dist, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {TOP_K}
    """


def _ivfpq_build(spark: SparkSession, sf_dir: str):
    """Shared IVF-PQ index build: (cell_of, probes, codes, qtab).

    ``cell_of`` (vec_id, cell) — coarse-quantizer assignment via the
    map-side max_by argmax; ``probes`` (query_id, cell) — each query's
    IVF_NPROBE nearest cells; ``codes`` (vec_id, label, s, code) — the
    PQ code per sub-space via map-side min_by argmin; ``qtab``
    (query_id, s, cent_id, qd2) — the queries' full ADC distance
    tables (N_QUERIES·M·K rows, broadcast-sized by construction).
    """
    emb = catalog.load(spark, sf_dir, "embeddings")
    n_rows = emb.count()
    pq_mod = codebook_mod(n_rows)
    pq_res = PQ_CENT_RESIDUE % pq_mod
    c_mod = ivf_mod(n_rows)
    c_res = IVF_CENT_RESIDUE % c_mod

    # ---- IVF coarse quantizer: cell per vector + probed cells ----
    n = _normalized(emb)
    cents = (n.filter(F.col("vec_id") % c_mod == c_res)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("v").alias("cent_v"),
                     F.col("nrm").alias("cent_n")))
    ccos = (F.expr("aggregate(zip_with(v, cent_v, (x, y) -> x * y), "
                   "0D, (acc, x) -> acc + x)")
            / (F.col("nrm") * F.col("cent_n")))
    scored_cells = (n.select("vec_id", "v", "nrm")
                    .join(F.broadcast(cents)).withColumn("ccos", ccos))
    cell_of = (scored_cells.groupBy("vec_id")
               .agg(F.expr("max_by(cent_id, struct(ccos, -cent_id))")
                    .alias("cell")))
    w_probe = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cent_id"))
    probes = (scored_cells.filter(F.col("vec_id") < N_QUERIES)
              .withColumn("arn", F.row_number().over(w_probe))
              .filter(F.col("arn") <= IVF_NPROBE)
              .select(F.col("vec_id").alias("query_id"),
                      F.col("cent_id").alias("cell")))

    # ---- PQ fine quantizer: codes + query distance tables ----
    subs = _subspaces(emb, "vec_id")
    pcents = (subs.filter(F.col("vec_id") % pq_mod == pq_res)
              .select(F.col("vec_id").alias("cent_id"), "s",
                      F.col("sub").alias("cent_sub")))
    dists = (subs.join(F.broadcast(pcents), "s")
             .withColumn("d2", F.expr(_D2)))
    codes = (dists.groupBy("vec_id", "label", "s")
             .agg(F.expr("min_by(cent_id, struct(d2, cent_id))")
                  .alias("code")))
    # qs/qcent, not s/cent_id: qtab shares the `dists` lineage with
    # codes, and a same-attribute join condition degenerates to a
    # trivially-true predicate (see sim_pq_topk)
    qtab = (dists.filter(F.col("vec_id") < N_QUERIES)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("s").alias("qs"),
                    F.col("cent_id").alias("qcent"),
                    F.col("d2").alias("qd2")))
    return cell_of, probes, codes, qtab


def _adc_rank(parts: DataFrame) -> DataFrame:
    """Final ADC ranking shared by both IVF-PQ gates: the ADC total is
    the FIXED left-to-right sum of the M partial columns t0..t{M-1}
    (never a float SUM over rows — summation order must replay
    bit-exactly in the oracle's {_SQL_ADC} chain), then top-k per
    query by (adc, candidate_id)."""
    adc = F.col("t0")
    for _s in range(1, PQ_M):
        adc = adc + F.col(f"t{_s}")
    w = Window.partitionBy("query_id").orderBy(adc.asc(),
                                               F.col("candidate_id"))
    return (parts
            .withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= TOP_K)
            .select("query_id", "candidate_id", "label",
                    F.round(adc, 4).alias("adc_dist"), "rn"))


@register(
    "sim_ivfpq_topk",
    oracle=_IVFPQ_ORACLE,
    tags=("similarity", "ivf", "pq", "approx"),
)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-k (VERDICT r6 #8): probe the query's
    IVF_NPROBE nearest coarse cells, then rank ONLY those cells'
    members by PQ asymmetric distance — both index builds use the
    count-derived moduli (K ~ 256 codewords, C ~ 64 cells), so build
    is O(N·(C + M·K)) and query work is N·nprobe/C candidates at M
    table lookups each.

    Plan shape at scale: centroid and codebook tables broadcast (both
    constant-size); cell assignment and code argmin are map-side
    min_by/max_by aggregates (never a row_number shuffle over the
    scored fan-out); the candidate and distance-table joins broadcast
    the query-side (N_QUERIES·nprobe rows and N_QUERIES·M·K entries);
    the ADC sum is M fixed-order partial columns, never a float SUM
    over rows. Every stage replays bit-exactly in the DuckDB oracle.
    """
    cell_of, probes, codes, qtab = _ivfpq_build(spark, sf_dir)
    cand = (F.broadcast(probes).join(cell_of, "cell")
            .filter(F.col("query_id") != F.col("vec_id"))
            .select("query_id", F.col("vec_id").alias("candidate_id")))
    parts = (codes.join(F.broadcast(cand),
                        codes["vec_id"] == cand["candidate_id"])
             .join(F.broadcast(qtab),
                   (qtab["query_id"] == cand["query_id"])
                   & (qtab["qs"] == codes["s"])
                   & (qtab["qcent"] == codes["code"]))
             .groupBy(cand["query_id"], "candidate_id", "label")
             .agg(*[F.sum(F.when(codes["s"] == s, F.col("qd2")))
                    .alias(f"t{s}") for s in range(PQ_M)]))
    return _adc_rank(parts)


@register(
    "sim_ivfpq_bucketed_probe",
    # identical answer contract to sim_ivfpq_topk: persisting the
    # index bucketed by cell must not change WHAT any query retrieves
    oracle=_IVFPQ_ORACLE,
    tags=("similarity", "ivf", "pq", "approx", "layout", "bucketing"),
)
def sim_ivfpq_bucketed_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF-PQ index actually PERSISTED — the second half of VERDICT
    r8 #5 (sim_ivf_bucketed_probe is the flat-vector half): one row per
    corpus vector (candidate_id, label, cell, codes[M]) written once to
    the catalog bucketed by ``cell`` via plans/physical.write_bucketed,
    then probed from the CATALOG table. This is the production
    billion-vector layout — the 16-byte PQ code row is what actually
    sits on disk at 100 TB (the flat vectors are 16× larger), and
    HashPartitioning(cell) lets every query's probe reach its nprobe
    inverted lists shuffle-free (no-Exchange-over-index asserted in
    tests/test_physical.py).

    Probe path: candidates come straight off the bucketed scan; their
    code arrays posexplode into (s, code) pairs — pos IS the sub-space
    index because the build sorts struct(s, code) — which join the
    broadcast ADC table on (query_id, s, code), then the same
    fixed-order partial-sum ranking as the in-memory gate, so the
    result (and the oracle) is bit-identical to sim_ivfpq_topk.
    """
    import hashlib

    from new_data_pipeline_spark.plans import physical
    from new_data_pipeline_spark.plans.layout_queries import (
        _sweep_stale_bucketed)

    cell_of, probes, codes, qtab = _ivfpq_build(spark, sf_dir)
    idx_rows = (codes.groupBy("vec_id", "label")
                .agg(F.array_sort(F.collect_list(F.struct("s", "code")))
                     .alias("sc"))
                .join(cell_of, "vec_id")
                .select(F.col("vec_id").alias("candidate_id"), "label",
                        "cell",
                        F.expr("transform(sc, x -> x.code)").alias("codes")))
    tbl = f"ndp_b_ivfpqidx_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    _sweep_stale_bucketed(spark, keep={tbl}, prefixes=("ndp_b_ivfpqidx_",))
    # persist + eager fill BEFORE the bucketed write: the write plan
    # re-executes the whole N·M·K encode subtree markedly slower than
    # a count + cached write (measured at 10×: 18.5 s uncached write vs
    # 7.2 s fill + 1.4 s write — bucketBy writes don't get the adaptive
    # re-planning the count's job does)
    idx_rows = idx_rows.persist()
    idx_rows.count()
    physical.write_bucketed(idx_rows, tbl, "cell")
    idx = spark.table(tbl)

    cand = (probes.join(idx, on="cell")
            .filter(F.col("query_id") != F.col("candidate_id"))
            .select(F.col("query_id").alias("cqid"), "candidate_id",
                    "label", F.posexplode("codes").alias("cs", "ccode")))
    parts = (cand.join(F.broadcast(qtab),
                       (F.col("query_id") == F.col("cqid"))
                       & (F.col("qs") == F.col("cs"))
                       & (F.col("qcent") == F.col("ccode")))
             .groupBy("cqid", "candidate_id", "label")
             .agg(*[F.sum(F.when(F.col("cs") == s, F.col("qd2")))
                    .alias(f"t{s}") for s in range(PQ_M)])
             .withColumnRenamed("cqid", "query_id"))
    return _adc_rank(parts)


@register(
    "sim_pq_bucketed_probe",
    # identical answer contract to sim_pq_topk: persisting the code
    # table + codebook must not change WHAT any query retrieves
    oracle=_PQ_ORACLE,
    tags=("similarity", "pq", "approx", "layout", "bucketing"),
)
def sim_pq_bucketed_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ-only index actually PERSISTED — VERDICT r9 #4, the last
    ANN family member that was still rebuilding its codebook + codes
    per query. Two catalog tables, written once per corpus version:

    - ``ndp_b_pqcb_*`` — the codebook (M·K subvector centroids, a few
      thousand rows);
    - ``ndp_b_pqidx_*`` — the code table, ONE row per corpus vector
      (candidate_id, label, codes[M]) bucketed by ``candidate_id``.

    Probe path touches NO corpus vectors: the queries' subvectors come
    off a vec_id-pruned embeddings scan, join the broadcast codebook
    into the ADC distance table, and the code table posexplodes into
    (s, code) pairs that join the broadcast table. The per-candidate
    partial-sum aggregation groups by (query_id, candidate_id, label) —
    HashPartitioning(candidate_id) from the bucketed scan satisfies
    that clustered distribution (posexplode and broadcast joins
    preserve it), so the index side aggregates SHUFFLE-FREE; only the
    final top-k window exchanges the tiny ranked candidate set
    (no-Exchange-below-the-aggregate asserted in
    tests/test_physical.py). This is what PQ looks like at 100 TB: the
    16-byte code rows are the on-disk index, the flat vectors are only
    read to answer the queries themselves.

    Same persist-before-bucketed-write lesson as
    ``sim_ivfpq_bucketed_probe``: bucketBy writes re-execute the
    N·M·K encode subtree without adaptive re-planning, so the index
    rows are cached and eagerly filled before ``saveAsTable``.
    """
    import hashlib

    from new_data_pipeline_spark.plans import physical
    from new_data_pipeline_spark.plans.layout_queries import (
        _sweep_stale_bucketed)

    emb = catalog.load(spark, sf_dir, "embeddings")
    mod = codebook_mod(emb.count())
    res = PQ_CENT_RESIDUE % mod
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tbl_cb, tbl_idx = f"ndp_b_pqcb_{h}", f"ndp_b_pqidx_{h}"
    _sweep_stale_bucketed(spark, keep={tbl_cb}, prefixes=("ndp_b_pqcb_",))
    _sweep_stale_bucketed(spark, keep={tbl_idx}, prefixes=("ndp_b_pqidx_",))

    # ---- index build (once per corpus version) ----
    cb_rows = (_subspaces(emb.filter(F.col("vec_id") % mod == res),
                          "cent_id")
               .select("cent_id", "s", F.col("sub").alias("cent_sub")))
    physical.write_bucketed(cb_rows, tbl_cb, "s", n_buckets=4)
    cb = spark.table(tbl_cb)
    dists = (_subspaces(emb, "vec_id").join(F.broadcast(cb), "s")
             .withColumn("d2", F.expr(_D2)))
    codes = (dists.groupBy("vec_id", "label", "s")
             .agg(F.expr("min_by(cent_id, struct(d2, cent_id))")
                  .alias("code")))
    idx_rows = (codes.groupBy("vec_id", "label")
                .agg(F.array_sort(F.collect_list(F.struct("s", "code")))
                     .alias("sc"))
                .select(F.col("vec_id").alias("candidate_id"), "label",
                        F.expr("transform(sc, x -> x.code)").alias("codes")))
    idx_rows = idx_rows.persist()
    idx_rows.count()  # eager fill BEFORE the bucketed write (see above)
    physical.write_bucketed(idx_rows, tbl_idx, "candidate_id")
    idx_rows.unpersist()

    # ---- probe (corpus-scan-free) ----
    qtab = (_subspaces(emb.filter(F.col("vec_id") < N_QUERIES),
                       "query_id")
            .join(F.broadcast(cb), "s")
            .withColumn("d2", F.expr(_D2))
            .select("query_id", F.col("s").alias("qs"),
                    F.col("cent_id").alias("qcent"),
                    F.col("d2").alias("qd2")))
    cand = spark.table(tbl_idx).select(
        "candidate_id", "label", F.posexplode("codes").alias("cs", "ccode"))
    parts = (cand.join(F.broadcast(qtab),
                       (F.col("qs") == F.col("cs"))
                       & (F.col("qcent") == F.col("ccode")))
             .filter(F.col("query_id") != F.col("candidate_id"))
             .groupBy("query_id", "candidate_id", "label")
             .agg(*[F.sum(F.when(F.col("cs") == s, F.col("qd2")))
                    .alias(f"t{s}") for s in range(PQ_M)]))
    return _adc_rank(parts)
