"""CSS cascade resolver (operators/css_cascade.py): handcrafted pages
with known winners — specificity ordering, source-order tiebreak,
multi-class matching, no-match elements — independent of the query's
generated spec."""

from __future__ import annotations

import pytest

from cies_ocr_java_spark.operators.css_cascade import (
    page_col,
    resolve_cascade,
)


def _resolve(spark, pages: list[str]) -> dict[tuple[int, int], tuple]:
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "doc_id long, page string"
    )
    out = resolve_cascade(df).collect()
    return {
        (r.doc_id, r.elem_idx): (r.tag, r.elem_id, r.color, r.n_matches)
        for r in out
    }


def test_specificity_ordering(spark):
    page = (
        "<style>p{color:v0}\n.alpha{color:v1}\np.alpha{color:v2}\n"
        "#e0{color:v3}</style>"
        '<p id="e0" class="alpha beta">x</p>'
        '<p id="e1" class="alpha gamma">x</p>'
        '<div id="e2" class="beta beta">x</div>'
    )
    got = _resolve(spark, [page])
    # e0 matches all four; #id (100) wins over compound (11)
    assert got[(0, 0)] == ("p", "e0", "v3", 4)
    # e1 matches p, .alpha, p.alpha; compound (11) beats class (10)
    assert got[(0, 1)] == ("p", "e1", "v2", 3)
    # e2 (div.beta) matches nothing
    assert got[(0, 2)] == ("div", "e2", None, 0)


def test_source_order_breaks_ties(spark):
    page = (
        "<style>.alpha{color:v0}\n.beta{color:v1}</style>"
        '<span id="e0" class="alpha beta">x</span>'
    )
    got = _resolve(spark, [page])
    # both class selectors match at specificity 10 -> the LATER wins
    assert got[(0, 0)] == ("span", "e0", "v1", 2)


def test_type_beats_nothing_class_beats_type(spark):
    page = (
        "<style>span{color:v0}\n.gamma{color:v1}</style>"
        '<span id="e0" class="gamma gamma">x</span>'
        '<span id="e1" class="alpha alpha">x</span>'
    )
    got = _resolve(spark, [page])
    assert got[(0, 0)] == ("span", "e0", "v1", 2)  # class 10 > type 1
    assert got[(0, 1)] == ("span", "e1", "v0", 1)


def test_second_class_token_matches(spark):
    page = (
        "<style>.beta{color:v0}</style>"
        '<p id="e0" class="alpha beta">x</p>'
    )
    got = _resolve(spark, [page])
    assert got[(0, 0)] == ("p", "e0", "v0", 1)


def test_docs_are_independent(spark):
    a = "<style>p{color:v0}</style>" + '<p id="e0" class="alpha beta">x</p>'
    b = (
        "<style>div{color:v0}</style>"
        + '<p id="e0" class="alpha beta">x</p>'
    )
    got = _resolve(spark, [a, b])
    assert got[(0, 0)][2] == "v0"
    assert got[(1, 0)][2] is None  # rule for div never leaks across docs


def test_generated_pages_parse_back(spark):
    from pyspark.sql import functions as F

    df = spark.range(0, 40).select(
        F.col("id").alias("doc_id"),
        page_col(F.col("id")).alias("page"),
    )
    rows = resolve_cascade(df).collect()
    by_doc: dict[int, int] = {}
    for r in rows:
        by_doc[r.doc_id] = by_doc.get(r.doc_id, 0) + 1
    # element count equals the spec's n_elems for every doc
    for i in range(40):
        assert by_doc[i] == i % 5 + 1
