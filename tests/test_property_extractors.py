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


# --- adversarial tier: the degradation contract (formats.py) ----------------
# Soup strategies draw from hostile construct atoms — unterminated literals,
# unbalanced parens/BT-ET, bad escapes, invalid base64/UTF-8 OCR blocks,
# unclosed comments/quotes, attribute bombs, bogus markup, undecodable
# entities, non-ASCII whitespace — and assert the Arrow-batch extractors
# equal the char-walk oracle on EVERY composition.

_PDF_HOSTILE = st.sampled_from([
    "%PDF-1.4\n", "%%Page: 1\n", "%%EOF\n", "BT\n", "ET\n", "(", ")", " Tj",
    "\\", "\\(", "\\)", "\\\\", "(text) Tj\n", "(a\\) Tj\n", "((nested) Tj\n",
    "\n", "\r", "\x0b", "\xa0", " ", "word ", "\t",
    "%%OCRBlock PAGE aGVsbG8=\n", "%%OCRBlock PAGE !!bad!!\n",
    "%%OCRBlock PAGE /w==\n", "%%OCRBlock PAGE abc\n",
    "%%OCRBlock PAGE a=b=\n", "%%OCRBlock WORD aGk=\n", "%%OCRBlock PAGE \n",
    "junk (x) Tj more", "(unterminated", "\\(esc) Tj", "(\\z) Tj\n",
    "%%Page:", "x%%EOF", "(a\\\rb) Tj", "(a\\\nb) Tj", "(ok) Tjx",
    "(a\\b) Tj", "(caf\xe9 日本) Tj\n",
    "%%OCRBlock LAYOUT_TITLE aGVsbG8=\n", "%%OCRBlock LAYOUT_BOGUS aGk=\n",
    "%%OCRBlock LAYOUT_TEXT !!bad!!\n", "%%OCRBlock LAYOUT_ x\n",
    "%%OCRBlock LAYOUT_TEXT /w==\n", "%%OCRBlock LAYOUT_PAGE_NUMBER MQ==\n",
    "%%OCRBlock LAYOUT_TEXT abc\n", "%%OCRBlock LAYOUT_SECTION_HEADER IHNwYWNlZCA=\n",
])

_HTML_HOSTILE = st.sampled_from([
    "<p>", "</p>", "<div>", "</div>", "<nav>", "</nav>", "<script>",
    "</script>", "<a href='/x'>", "<a>", "</a>", "plain words here ",
    "<b>", "</b>", "<!-- comment -->", "<!-- unclosed", "-->",
    '<p class="x>y">', "<p a='q>r'>", '<img alt="<p>">', "&amp;", "&lt;",
    "&copy;", "&amp", "&#39;", "&#160;", "< notag", "<1abc>", "</ x>", "<",
    ">", '"', "'", '<p a="unclosed', "\xa0", "\x0b", "\t", "\n",
    "text with enough length to pass the block filter ", "<aside>",
    "</aside>", "<table>", "<td>", "</td>", "</table>", "<li>", "<ul>",
    "</ul>", "<NAV>", "</NAV>", "<navx>", "<pre>", "</pre>", "<prex>",
    "<h1>", "</h1>", "<style>p{}</style>", "<?pi >", "<! decl >",
    "<a href=x>link text</a>", "<footer>", "</footer>", "caf\xe9 日",
    "\u0130stanbul \u0130\u0130", "<NAV>\u0130</NAV>", "stra\u00dfe \u1e9e",
])


@settings(max_examples=250, deadline=None)
@given(st.lists(_PDF_HOSTILE, min_size=1, max_size=25))
def test_pdf_adversarial_matches_oracle(atoms):
    payload = "".join(atoms)
    got = _extract_pdf_batch(pd.Series([payload])).iloc[0]
    want = oracle.parse_pdf(payload)
    assert got["pdf_text"] == want["text"]
    assert got["page_count"] == want["page_count"]
    assert bool(got["pdf_malformed"]) == want["malformed"]
    assert _decode_ocr_batch(pd.Series([payload])).iloc[0] == want["ocr_text"]
    # ANALYSIS mode: layout block stream + content text, same payload
    from cies_ocr_java_spark.operators.ocr_mock import (
        _analysis_ocr_batch,
        _layout_blocks_batch,
    )

    assert _layout_blocks_batch(pd.Series([payload])).iloc[0] == (
        oracle._scan_layout_blocks(payload)
    )
    assert _analysis_ocr_batch(pd.Series([payload])).iloc[0] == (
        oracle.ocr_analysis_text(payload)
    )


@settings(max_examples=250, deadline=None)
@given(st.lists(_HTML_HOSTILE, min_size=1, max_size=30))
def test_html_adversarial_matches_oracle(atoms):
    payload = "".join(atoms)
    got = extract_main_text_batch(pd.Series([payload])).iloc[0]
    assert got == oracle.extract_html(payload)


@settings(max_examples=120, deadline=None)
@given(st.text(max_size=200))
def test_extractors_never_crash_on_arbitrary_text(payload):
    """Totality: ANY string (not just grammar soup) must produce a defined
    result from every extractor — crash-freedom is half the degradation
    contract — and the Arrow batch must agree with the oracle on it."""
    got = _extract_pdf_batch(pd.Series([payload])).iloc[0]
    want = oracle.parse_pdf(payload)
    assert got["pdf_text"] == want["text"]
    assert bool(got["pdf_malformed"]) == want["malformed"]
    assert _decode_ocr_batch(pd.Series([payload])).iloc[0] == want["ocr_text"]
    assert extract_main_text_batch(pd.Series([payload])).iloc[0] == (
        oracle.extract_html(payload)
    )
