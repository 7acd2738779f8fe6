"""HTML boilerplate stripping: a trafilatura-style markup/link-density
heuristic over block-segmented pages — the most common real curation
step between raw crawl and the dedup/quality stages.

The testdata documents are plain text, so (like the multimodal family's
synthesized payload columns) a deterministic HTML twin is derived from
each document first: nav, heading, the document text as paragraph
blocks, an ad block, and a footer — the template is defined ONCE here
and rendered identically by the Spark expression and the oracle SQL,
so the gate grades the STRIP heuristic, not the synthesis.

Heuristic (per newline-delimited block, all integer arithmetic so both
engines agree bit-exactly):
- visible      = block with ``<...>`` tags removed
- link_chars   = total visible length inside ``<a ...>...</a>``
- keep a block iff length(visible) >= MIN_CHARS and
  2 * link_chars < length(visible)   (link density < 0.5)
The nav/ad/footer blocks die on link density, the short heading dies
on MIN_CHARS, and the paragraph blocks survive — but the operator
computes that from the markup, it doesn't assume the layout.

Scale: segmentation is posexplode over a generated column; every
density term is a built-in regexp/aggregate expression in whole-stage
codegen; the only shuffle is the final per-document groupBy. No UDFs.

Reference analog: none — the reference ingests pre-cleaned text
directly into its CountVectorizer fit (serialize.py:220-235); this is
the curation stage a crawl-scale corpus needs BEFORE that fit is
meaningful (SURVEY.md §2.2 text-analysis extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

MIN_CHARS = 15

NAV = ('<nav><a href="#">home</a> <a href="#">about</a> '
       '<a href="#">contact</a></nav>')
AD = ('<div class="ad"><a href="#">buy now</a> '
      '<a href="#">subscribe</a> win</div>')
FOOTER = ('<footer><a href="#">terms of use</a> '
          '<a href="#">privacy policy</a> (c) corp</footer>')

_LINK_PAT = '<a [^>]*>([^<]*)</a>'
_TAG_PAT = '<[^>]*>'


def synthesize_html_column(docs: DataFrame) -> DataFrame:
    """Deterministic page twin: text split into two paragraph blocks
    wrapped in boilerplate, newline-delimited."""
    return docs.select(
        "doc_id",
        F.concat(
            F.lit(NAV + "\n<h1>doc "), F.col("doc_id"),
            F.lit("</h1>\n<p>"), F.expr("substring(text, 1, 200)"),
            F.lit("</p>\n<p>"), F.expr("substring(text, 201)"),
            F.lit("</p>\n" + AD + "\n" + FOOTER)).alias("html"))


def _oracle_html() -> str:
    return ("'" + NAV.replace("'", "''") + chr(10) + "<h1>doc ' || doc_id"
            " || '</h1>" + chr(10) + "<p>' || substr(text, 1, 200) ||"
            " '</p>" + chr(10) + "<p>' || substr(text, 201) || '</p>"
            + chr(10) + AD.replace("'", "''") + chr(10)
            + FOOTER.replace("'", "''") + "'")


def strip_boilerplate(pages: DataFrame,
                      min_chars: int = MIN_CHARS) -> DataFrame:
    """Segment → score → filter → reassemble. Emits per-document block
    counts, char tallies, and the surviving content joined in block
    order."""
    blocks = pages.select(
        "doc_id",
        F.posexplode(F.split("html", "\n")).alias("idx", "block"))
    scored = blocks.select(
        "doc_id", "idx",
        F.regexp_replace("block", _TAG_PAT, "").alias("visible"),
        F.expr(f"aggregate(regexp_extract_all(block, '{_LINK_PAT}', 1),"
               f" 0, (a, x) -> a + length(x))").alias("link_chars"))
    scored = scored.withColumn(
        "keep",
        (F.length("visible") >= min_chars)
        & (2 * F.col("link_chars") < F.length("visible")))
    return (scored
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
                 F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
                 F.sum(F.when(F.col("keep"), F.length("visible"))
                       .otherwise(F.lit(0))).cast("bigint")
                 .alias("content_chars"),
                 F.sum(F.when(~F.col("keep"), F.length("visible"))
                       .otherwise(F.lit(0))).cast("bigint")
                 .alias("boilerplate_chars"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("keep"),
                                    F.struct("idx", "visible")))),
                         lambda s: s["visible"]),
                     " ").alias("content")))


@register(
    "text_boilerplate_strip",
    oracle=f"""
    WITH pages AS (
      SELECT doc_id, {_oracle_html()} AS html FROM documents
    ),
    blocks AS (
      SELECT doc_id,
             generate_subscripts(string_split(html, chr(10)), 1) AS idx,
             unnest(string_split(html, chr(10))) AS block
      FROM pages
    ),
    scored AS (
      SELECT doc_id, idx,
             regexp_replace(block, '{_TAG_PAT}', '', 'g') AS visible,
             COALESCE(list_sum(list_transform(
                 regexp_extract_all(block, '{_LINK_PAT}', 1),
                 x -> length(x))), 0) AS link_chars
      FROM blocks
    ),
    flagged AS (
      SELECT *,
             length(visible) >= {MIN_CHARS}
               AND 2 * link_chars < length(visible) AS keep
      FROM scored
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN keep THEN length(visible) ELSE 0 END)
                AS BIGINT) AS content_chars,
           CAST(SUM(CASE WHEN NOT keep THEN length(visible) ELSE 0 END)
                AS BIGINT) AS boilerplate_chars,
           COALESCE(string_agg(visible, ' ' ORDER BY idx)
                    FILTER (WHERE keep), '') AS content
    FROM flagged
    GROUP BY doc_id
    """,
    tags=("text", "boilerplate", "curation"),
)
def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup-aware boilerplate removal over the synthesized page twin
    of every document; the oracle renders the same template and replays
    the same integer density heuristic."""
    docs = catalog.load(spark, sf_dir, "documents")
    return strip_boilerplate(synthesize_html_column(docs))
