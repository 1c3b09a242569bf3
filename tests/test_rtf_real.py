"""RTF extraction (operators/rtf_real.py): destination exclusion via
rank-at-depth on braces, escapes, hostile degradation — all through the
Spark plan (the operator is pure codegen; there is no Python parser to
unit-test separately)."""

import pyspark.sql.functions as F
import pytest

from cies_ocr_java_spark.operators.rtf_real import (
    extract_rtf_paragraphs,
    rtf_tokens,
)


def _run(spark, docs):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, rtf string"
    )
    rows = (
        extract_rtf_paragraphs(df, F.col("rtf"))
        .orderBy("doc_id", "para_idx")
        .collect()
    )
    out = {}
    for r in rows:
        out.setdefault(r.doc_id, []).append(r.text)
    return out


@pytest.fixture(scope="module")
def rtf_out(spark):
    return _run(spark, [
        # 0: destinations + bold group + hex escape + two paragraphs
        r"{\rtf1\ansi{\fonttbl{\f0 Helvetica;}}{\*\generator cies;}"
        r"Hello {\b bold} caf\'e9 world\par Second para\par }",
        # 1: unclosed destination hides everything to EOF
        r"{\rtf1\ansi{\*\generator cies;Hidden text\par }",
        # 2: escaped braces and backslash are literal text
        r"{\rtf1\ansi An \{escaped\} \\ backslash\par }",
        # 3: nested destination inside destination counts once
        r"{\rtf1\ansi{\info{\fonttbl junk}}visible\par }",
        # 4: control words consume their delimiter space
        r"{\rtf1\ansi\b0 tight\b1  loose\par }",
    ])


def test_destination_exclusion_and_escapes(rtf_out):
    assert rtf_out[0] == ["Hello bold café world", "Second para"]


def test_unclosed_destination_hides_to_eof(rtf_out):
    assert 1 not in rtf_out  # zero rows


def test_escaped_braces_literal(rtf_out):
    assert rtf_out[2] == ["An {escaped} \\ backslash"]


def test_nested_destination_counts_once(rtf_out):
    assert rtf_out[3] == ["visible"]


def test_control_word_delimiter_consumed(rtf_out):
    # "\b0 tight" -> control word eats ONE space; "\b1  loose" leaves one
    assert rtf_out[4] == ["tight loose"]


def test_tokenizer_classes(spark):
    df = spark.createDataFrame(
        [(0, r"{\rtf1 a\'e9\{b\par }")], "doc_id long, rtf string"
    )
    toks = [
        r.tok for r in rtf_tokens(df, F.col("rtf")).orderBy("pos").collect()
    ]
    assert toks == [
        "{", "\\rtf1 ", "a", "\\'e9", "\\{", "b", "\\par ", "}",
    ]


def test_plan_is_zero_python(spark):
    df = spark.createDataFrame([(0, "{\\rtf1 x\\par }")],
                               "doc_id long, rtf string")
    plan = (
        extract_rtf_paragraphs(df, F.col("rtf"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
    assert "Exchange SinglePartition" not in plan
