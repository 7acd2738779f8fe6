"""Privacy-preserving release operators: a differentially-private
noisy-count release (the Laplace mechanism) and a k-anonymity risk
profile over quasi-identifiers — the two checks a data pipeline runs
before exporting aggregate statistics or sharing row-level extracts.

Determinism device for the DP release: real DP draws fresh randomness
per release; a *testable, replayable* engine needs the noise to be a
pure function of the data, so the Laplace draw comes from the md5
inverse-CDF device (the sampling.py / dedup.py hash-uniform): u =
(md5(group-key) 24-bit prefix + 0.5) / 2^24 → uniform in (0,1), noise
= −b·sign(u−½)·ln(1−2|u−½|). The half-step offset keeps u strictly
inside the open interval: a key whose md5 prefix is 000000 (u=0)
would otherwise hit ln(0) = −inf and release noisy_n = −Infinity in
both engines (parity holds but the value is garbage — ADVICE r10).
That is the exact Laplace inverse CDF — the *distribution* over groups
is the DP-calibrated one — while both engines replay it bit-for-bit.
The ln() is rounded to 6 dp on both sides (the text_lm_perplexity
device) so libm-vs-java.lang.Math last-ulp drift can't flip the hash.
A production deployment swaps the seed column for a secret nonce; the
mechanism, sensitivity accounting, and plan shape are unchanged.

Scale: both operators are single map-combinable aggregates (one
shuffle each); the DP release adds per-GROUP scalar math (5 groups
here, |groups| generally) and the k-anonymity profile is a two-level
aggregate (QI-group sizes, then a histogram over sizes) — O(|groups|)
state, no row blowup anywhere.

Reference analog: none — SURVEY.md §2.2 extension territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

# Laplace scale b = sensitivity / epsilon. Count queries have
# sensitivity 1 (one user moves one count by one); b = 25 gives
# epsilon = 0.04 per released count — noise visible against the
# fixture's thousands-scale counts, so tests can't pass by accident.
DP_SCALE = 25.0
K_ANON = 5  # the conventional "re-identifiable below k=5" threshold


@register(
    "agg_dp_noisy_counts",
    oracle=f"""
    WITH g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             (CAST('0x' || substr(md5(event_type), 1, 6) AS BIGINT)
               + 0.5) / CAST(16777216 AS DOUBLE) - 0.5 AS t
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           ROUND(CAST(n AS DOUBLE)
                 + (-{DP_SCALE}) * sign(t)
                   * ROUND(ln(1.0 - 2.0 * abs(t)), 6), 6) AS noisy_n,
           CAST({DP_SCALE} AS DOUBLE) AS laplace_scale,
           ROUND(CAST(1.0 AS DOUBLE) / {DP_SCALE}, 6) AS epsilon
    FROM g ORDER BY event_type
    """,
    tags=("aggregate", "privacy", "differential-privacy"),
)
def agg_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private per-type event counts via the Laplace
    mechanism: exact counts plus Laplace(b=DP_SCALE) noise generated
    by inverse-CDF from the md5-uniform of the group key (see module
    docstring for the replayability rationale and the production
    seed-swap). Releases noisy_n with its privacy accounting columns
    (scale, epsilon = sensitivity/b = 1/b for counts)."""
    events = catalog.load(spark, sf_dir, "events")
    g = (events.groupBy("event_type")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    t = ((F.conv(F.substring(F.md5(F.col("event_type").cast("binary")),
                             1, 6), 16, 10).cast("bigint") + F.lit(0.5))
         / 16777216.0 - 0.5)
    g = g.withColumn("t", t)
    noise = ((-DP_SCALE) * F.signum(F.col("t"))
             * F.round(F.log(1.0 - 2.0 * F.abs(F.col("t"))), 6))
    return (g.select(
        "event_type",
        F.round(F.col("n").cast("double") + noise, 6).alias("noisy_n"),
        F.lit(DP_SCALE).alias("laplace_scale"),
        F.round(F.lit(1.0) / DP_SCALE, 6).alias("epsilon"))
        .orderBy("event_type"))


@register(
    "profile_k_anonymity",
    oracle=f"""
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS grp_n
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(grp_n) AS BIGINT) AS k_anonymity,
           CAST(COUNT(*) FILTER (WHERE grp_n < {K_ANON}) AS BIGINT)
             AS groups_below_k,
           CAST(COALESCE(SUM(grp_n) FILTER (WHERE grp_n < {K_ANON}), 0)
                AS BIGINT) AS rows_at_risk,
           ROUND(CAST(COALESCE(SUM(grp_n) FILTER (WHERE grp_n < {K_ANON}),
                               0) AS DOUBLE)
                 / SUM(grp_n), 6) AS at_risk_fraction
    FROM qi
    """,
    tags=("profile", "privacy", "k-anonymity"),
)
def profile_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk profile of the customer table under the
    (nation, market-segment) quasi-identifier pair: the dataset's
    k (smallest QI-group size), how many QI groups fall below the
    k=K_ANON re-identification threshold, and the row fraction at
    risk — the pre-export check that decides whether a column needs
    generalization before sharing. Two-level exact aggregate; all
    integers except the final fraction (one division, rounded)."""
    customer = catalog.load(spark, sf_dir, "customer")
    qi = (customer.groupBy("c_nationkey", "c_mktsegment")
          .agg(F.count(F.lit(1)).cast("bigint").alias("grp_n")))
    below = F.col("grp_n") < K_ANON
    return qi.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("grp_n").cast("bigint").alias("k_anonymity"),
        F.count_if(below).cast("bigint").alias("groups_below_k"),
        F.coalesce(F.sum(F.when(below, F.col("grp_n"))), F.lit(0))
        .cast("bigint").alias("rows_at_risk"),
        F.round(F.coalesce(F.sum(F.when(below, F.col("grp_n"))),
                           F.lit(0)).cast("double")
                / F.sum("grp_n"), 6).alias("at_risk_fraction"))
