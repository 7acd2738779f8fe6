"""Source/domain policy filtering: a priority-ordered rule table
(allow/deny LIKE patterns) resolved most-specific-rule-wins per
document — the URL/domain blocklist stage every crawl-derived corpus
passes through before content-level curation (c4-style badlist
filtering, licensed-domain allowlists).

The testdata has a flat ``source`` column, so (like the multimodal and
boilerplate twins) a deterministic URL is synthesized from
(source, doc_id) by an expression shared with the oracle; the graded
behavior is the POLICY RESOLUTION: every rule the URL matches is a
candidate, and the lowest-priority-number (most specific) match
decides. That is a broadcast non-equi join (LIKE predicates) followed
by a map-side-combinable ``min_by`` — no shuffle of the corpus beyond
the final summary aggregate, and the rule table is O(rules) broadcast
however large the corpus.

Reference analog: none — the reference ingests whatever directory it
is pointed at (serialize.py:44-64 walks the tree unconditionally);
SURVEY.md §2.2 text-analysis/curation extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

# (priority, action, LIKE pattern) — lower priority number wins.
# Exercises: source+TLD override (src7.net denied but src7 otherwise
# rescued), a TLD-wide deny, a fully-denied source, default allow.
RULES: tuple[tuple[int, str, str], ...] = (
    (1, "deny", "%://src7.example.net/%"),
    (2, "allow", "%://src7.%"),
    (3, "deny", "%.example.net/%"),
    (4, "deny", "%://src12.%"),
    (5, "allow", "%"),
)

_URL = ("concat('https://', source, "
        "CASE WHEN doc_id % 3 = 0 THEN '.example.net' "
        "ELSE '.example.com' END, '/doc/', doc_id)")
_URL_SQL = ("'https://' || source || "
            "CASE WHEN doc_id % 3 = 0 THEN '.example.net' "
            "ELSE '.example.com' END || '/doc/' || doc_id")


def apply_source_policy(docs: DataFrame,
                        rules=RULES) -> DataFrame:
    """doc_id, source, url, action: the resolved policy decision per
    document (most specific matching rule wins)."""
    spark = docs.sparkSession
    rules_df = F.broadcast(spark.createDataFrame(
        list(rules), "priority int, action string, pattern string"))
    with_url = docs.withColumn("url", F.expr(_URL))
    matched = with_url.join(rules_df, F.expr("url LIKE pattern"))
    return (matched
            .groupBy("doc_id", "source", "url")
            .agg(F.expr("min_by(action, priority)").alias("action")))


@register(
    "corpus_source_policy",
    oracle=f"""
    WITH rules(priority, action, pattern) AS (
      VALUES {', '.join(f"({p}, '{a}', '{pat}')"
                        for p, a, pat in RULES)}
    ), with_url AS (
      SELECT doc_id, source, {_URL_SQL} AS url FROM documents
    ), resolved AS (
      SELECT doc_id, source,
             arg_min(action, priority) AS action
      FROM with_url JOIN rules ON url LIKE pattern
      GROUP BY doc_id, source
    )
    SELECT source, action,
           COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM resolved
    GROUP BY source, action
    """,
    tags=("curation", "policy", "filtering"),
)
def corpus_source_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, action) summary of the resolved policy — the audit
    report a curation run publishes with its badlist decisions. The
    oracle replays synthesis, LIKE matching, and priority resolution
    verbatim, so specificity ordering is hash-gated (src7 .net docs
    deny while other src7 docs allow; src12 denies wholesale)."""
    docs = catalog.load(spark, sf_dir, "documents")
    return (apply_source_policy(docs)
            .groupBy("source", "action")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").cast("bigint").alias("min_doc"),
                 F.max("doc_id").cast("bigint").alias("max_doc")))
