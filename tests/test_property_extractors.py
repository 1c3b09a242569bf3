"""Property-based tests (hypothesis): the Arrow-batch extractors and the
independent oracle must agree on arbitrary inputs drawn from the closed
grammars — far beyond the fixture corpus (escape soup, entity soup, odd
whitespace, empty pages, adversarial block sizes).

These run WITHOUT Spark (the pandas batch functions are the same code the
UDFs execute), so hypothesis can afford hundreds of examples.
"""

import base64

import pandas as pd
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.formats import make_pdf
from cies_ocr_java_spark.operators.html_extract import extract_main_text_batch
from cies_ocr_java_spark.operators.ocr_mock import _decode_ocr_batch
from cies_ocr_java_spark.operators.pdf_extract import _extract_pdf_batch
from tools import oracle

# text with the characters that stress the PDF escaper and normalizer
pdf_text = st.text(
    alphabet=st.sampled_from(list("abcXYZ ()\\\t\n.,!")), max_size=120
)
plain_words = st.text(alphabet=st.sampled_from(list("abcdefg ")), max_size=80)


@settings(max_examples=150, deadline=None)
@given(st.lists(pdf_text, min_size=0, max_size=4), st.lists(plain_words, max_size=3),
       st.booleans(), st.booleans())
def test_pdf_batch_matches_oracle(pages, ocr_pages, truncated, headerless):
    payload = make_pdf(pages, ocr_pages=ocr_pages, truncated=truncated,
                       headerless=headerless)
    got = _extract_pdf_batch(pd.Series([payload])).iloc[0]
    want = oracle.parse_pdf(payload)
    assert got["pdf_text"] == want["text"]
    assert got["page_count"] == want["page_count"]
    assert bool(got["pdf_malformed"]) == want["malformed"]
    if not want["malformed"]:
        assert _decode_ocr_batch(pd.Series([payload])).iloc[0] == want["ocr_text"]


# HTML from the closed grammar: block tags, inline tags, anchors, entities,
# boilerplate containers, comments
_inline = st.sampled_from(["b", "i", "em", "strong", "span"])
_words = st.text(alphabet=st.sampled_from(list("abcdef gh&<>'\"")), max_size=40).map(
    lambda s: s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace('"', "&quot;").replace("'", "&#39;")
)


@st.composite
def html_doc(draw):
    parts = ["<html><head><title>t</title><style>p{}</style></head><body>"]
    if draw(st.booleans()):
        parts.append("<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>")
    for _ in range(draw(st.integers(0, 4))):
        kind = draw(st.integers(0, 3))
        txt = draw(_words)
        if kind == 0:
            parts.append(f"<p>{txt}</p>")
        elif kind == 1:
            tag = draw(_inline)
            parts.append(f"<p>{txt} <{tag}>{draw(_words)}</{tag}> {draw(_words)}</p>")
        elif kind == 2:
            parts.append(f"<p><a href='/x'>{draw(_words)}</a> {txt}</p>")
        else:
            parts.append(f"<!-- {txt} --><h2>{txt}</h2>")
    if draw(st.booleans()):
        parts.append(f"<aside>{draw(_words)}</aside>")
    parts.append("<footer><a href='/f'>f</a></footer></body></html>")
    return "".join(parts)


@settings(max_examples=150, deadline=None)
@given(html_doc())
def test_html_batch_matches_oracle(html):
    got = extract_main_text_batch(pd.Series([html])).iloc[0]
    want = oracle.extract_html(html)
    assert got == want


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet=st.sampled_from(list("xyz w")), min_size=1,
                        max_size=30), min_size=1, max_size=1200))
def test_ocr_block_order_and_filter(blocks):
    lines = ["%PDF-1.4", "%%Page: 1"]
    for b in blocks:
        b64 = base64.b64encode(b.encode()).decode()
        lines.append(f"%%OCRBlock PAGE {b64}")
        lines.append(f"%%OCRBlock LINE {b64}")  # must be filtered out
    lines.append("%%EOF")
    payload = "\n".join(lines) + "\n"
    got = _decode_ocr_batch(pd.Series([payload])).iloc[0]
    want = oracle.parse_pdf(payload)["ocr_text"]
    assert got == want
