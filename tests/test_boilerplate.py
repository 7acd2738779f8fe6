"""Boilerplate-strip gates: the density heuristic on hand-built pages
(link-density boundary, min-length boundary, block ordering), proving
the operator scores markup rather than assuming the synthesis layout."""

from __future__ import annotations

from new_data_pipeline_spark.operators.boilerplate import (
    strip_boilerplate, synthesize_html_column)


def run(spark, html: str):
    df = spark.createDataFrame([(1, html)], "doc_id bigint, html string")
    return strip_boilerplate(df).collect()[0]


def test_link_heavy_blocks_drop(spark):
    html = "\n".join([
        '<nav><a href="#">home sweet home</a> <a href="#">about</a></nav>',
        "<p>this paragraph is long enough to keep around</p>",
        '<footer><a href="#">terms and conditions apply</a> ok</footer>',
    ])
    r = run(spark, html)
    assert (r.n_blocks, r.n_kept) == (3, 1)
    assert r.content == "this paragraph is long enough to keep around"


def test_link_density_boundary(spark):
    # visible 20 chars, link 10 chars: 2*10 == 20 -> NOT strictly less
    # -> dropped; with link 9 chars -> kept
    at_boundary = '<p><a href="#">aaaaaaaaaa</a>bbbbbbbbbb</p>'
    below = '<p><a href="#">aaaaaaaaa</a>bbbbbbbbbbb</p>'
    assert run(spark, at_boundary).n_kept == 0
    assert run(spark, below).n_kept == 1


def test_min_length_boundary(spark):
    assert run(spark, "<p>fourteen chars</p>").n_kept == 0   # 14 < 15
    assert run(spark, "<p>fifteen  chars!</p>").n_kept == 1  # 15


def test_content_preserves_block_order(spark):
    html = "\n".join([
        "<p>zzz first content paragraph</p>",
        '<div><a href="#">pure link link link link</a></div>',
        "<p>aaa second content paragraph</p>",
    ])
    r = run(spark, html)
    assert r.content == ("zzz first content paragraph "
                         "aaa second content paragraph")
    assert r.boilerplate_chars == len("pure link link link link")


def test_synthesized_template_end_to_end(spark):
    docs = spark.createDataFrame(
        [(7, "word " * 50)], "doc_id bigint, text string")
    r = strip_boilerplate(synthesize_html_column(docs)).collect()[0]
    # nav/h1/ad/footer dropped, both paragraph halves kept
    assert (r.n_blocks, r.n_kept) == (6, 2)
    assert r.content.replace(" ", "") == ("word" * 50)
