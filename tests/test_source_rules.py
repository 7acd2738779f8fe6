"""Policy-resolution gates for the source-rules filter: the
most-specific-rule-wins contract on hand-built cases the corpus query
exercises only in aggregate."""

from __future__ import annotations

from new_data_pipeline_spark.operators.source_rules import (
    RULES, apply_source_policy)


def _decide(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id bigint, source string")
    return {r["doc_id"]: r["action"]
            for r in apply_source_policy(docs).collect()}


def test_specific_override_beats_general_rules(spark):
    # doc_id % 3 == 0 -> .example.net URL; else .example.com
    got = _decide(spark, [
        (3, "src7"),    # src7 + .net  -> rule 1 deny (most specific)
        (4, "src7"),    # src7 + .com  -> rule 2 allow (rescued)
        (6, "src5"),    # .net generally -> rule 3 deny
        (7, "src5"),    # plain .com -> default allow
        (8, "src12"),   # denied source, .com -> rule 4 deny
        (9, "src12"),   # denied source, .net -> rule 3 deny (same outcome)
    ])
    assert got == {3: "deny", 4: "allow", 6: "deny",
                   7: "allow", 8: "deny", 9: "deny"}


def test_default_rule_catches_everything(spark):
    got = _decide(spark, [(1, "srcX"), (2, "totally-new-source")])
    assert got == {1: "allow", 2: "allow"}


def test_every_rule_is_reachable(spark):
    """Each priority in RULES decides at least one synthetic doc —
    a dead rule means the fixture no longer exercises the resolution
    order."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"src{s}") for i in range(6) for s in range(20)],
        "doc_id bigint, source string")
    rules_df = spark.createDataFrame(
        list(RULES), "priority int, action string, pattern string")
    with_url = docs.withColumn(
        "url",
        F.expr("concat('https://', source, CASE WHEN doc_id % 3 = 0 "
               "THEN '.example.net' ELSE '.example.com' END, "
               "'/doc/', doc_id)"))
    deciding = (with_url.join(rules_df, F.expr("url LIKE pattern"))
                .groupBy("doc_id", "source")
                .agg(F.expr("min_by(priority, priority)").alias("p")))
    used = {r["p"] for r in deciding.select("p").distinct().collect()}
    assert used == {p for p, _, _ in RULES}
