r"""Closed synthetic document grammars shared by the fixture generator, the
vectorized extractors, and the pure-Python oracle.

The reference consumes real PDFs via PDFBox (DocumentExtractManager.java:446-449)
and real OCR via Textract (571-599). Neither library/service exists here, and
the north rule asks for from-scratch parsers — so we define a *constrained*
PDF-flavored grammar that our corpus generator emits and our parsers consume.
Fidelity to arbitrary wild PDFs is explicitly out of scope (SURVEY.md §7.0);
fidelity to this grammar is the tested invariant.

Synthetic PDF grammar
---------------------
    %PDF-1.4\n                     header (required; missing -> malformed)
    %%Page: <n>\n                  page delimiter (>=1 per doc)
    BT\n (text) Tj\n ... ET\n      text-layer show-text operators; '(' ')' '\\'
                                   are backslash-escaped inside the literal
    %%OCRBlock <TYPE> <b64>\n      OCR side-channel blocks (TYPE: PAGE|LINE|WORD);
                                   models Textract's block stream — only PAGE
                                   blocks contribute text (BlockType.PAGE filter,
                                   DocumentExtractManager.java:554-556)
    %%EOF\n                        trailer (required; missing -> truncated/malformed)

Text-layer extraction: per page, the unescaped Tj strings joined by ' ';
pages joined by ' '; whitespace-normalized. page_count = number of %%Page
markers (0 pages -> malformed).

Text-sufficiency shortcut (the reference's core heuristic,
DocumentExtractManager.java:410-429): the text layer is sufficient iff
    len(text_layer) > (MIN_TEXT_PCT/100) * page_count * ASSUMED_MAX_CHAR_PER_PAGE
with ASSUMED_MAX_CHAR_PER_PAGE = 528 (DocumentExtractManager.java:36 — note the
constant wins over its own '80x66=5280' comment at line 433) and
MIN_TEXT_PCT = 50 (application.properties:4). Strict '>' per line 417.
If insufficient, the OCR path decodes PAGE blocks in order (batched <=1000
blocks per chunk, the maxResults(1000) analog) and joins with ' '.

Synthetic HTML: ordinary HTML; extraction is DOM-ish block segmentation +
text/link-density boilerplate scoring (see operators/html_extract.py).

Degradation contract (open-grammar hardening, round 2)
------------------------------------------------------
A real crawl contains malformed and hostile documents the closed grammar
never emits. The engine's behavior on ANY string input is DEFINED — never a
crash, never a silent wrong span — by these rules, which all three
implementations (JVM column expressions, Arrow/pandas batches, and the
pure-Python oracle in tools/oracle.py) follow exactly:

PDF:
  * malformed iff missing header prefix, missing %%EOF, or zero %%Page
    markers -> the document FAILS loudly (status FAILED,
    error='malformed pdf payload'), nothing extracted. Well-formed-but-
    hostile payloads degrade per the rules below.
  * Text layer = every maximal well-formed show-text literal matching
    TJ_PATTERN, scanned leftmost-first over the whole payload. Unterminated
    literals, unbalanced parens, stray BT/ET, a backslash before a line
    terminator, or trailing garbage contribute NOTHING (extract-what-
    parses); they never corrupt neighboring literals because a failed
    match restarts one character later.
  * Escapes: exactly \\ \( \) unescape; a backslash before any other
    character is content and survives verbatim.
  * OCR blocks: the payload of '%%OCRBlock PAGE ' is the maximal run of
    base64-alphabet characters (B64_TOKEN). A block is decoded iff that
    run is CANONICAL base64 (B64_CANONICAL: length % 4 == 0, correct
    padding, no interior '=') AND its bytes are valid UTF-8; otherwise the
    block is SKIPPED — one bad scan block must not poison the readable
    pages around it.

HTML (phases, applied in order; all tag scanning is quote-aware — a '>'
inside a quoted attribute value does not close the tag, matching the HTML5
tokenizer):
  1. closed comments <!--...--> -> ' '. An UNCLOSED '<!--' falls through
     to rule 3 ('<!' markup declaration).
  2. script/style, then head/nav/footer/header/aside pairs are dropped
     with content, first-closing semantics (content runs to the FIRST
     matching close tag — the script-CDATA rule, applied uniformly).
     An unclosed container drops nothing (its open tag is stripped by 3).
  3. a '<' followed by [a-zA-Z!?/] opens a tag: scanned quote-aware to the
     closing '>'. Block tags (HTML_BLOCK_TAGS) segment blocks; every
     matched tag contributes a ' '. A '<' followed by anything else, or a
     tag whose closing '>' never comes (unclosed quote / EOF), is TEXT and
     survives verbatim — exactly what html5 tokenizers emit as character
     data.
  4. entity decode strictly by HTML_ENTITIES in dict order ('&amp;' last);
     any other entity form ('&copy;', '&amp' without ';', '&#160;') is
     literal text. Numeric/named refs outside the table are NOT decoded —
     the contract trades completeness for three-way bit-reproducibility.
  5. whitespace: runs of ASCII whitespace (WS_RUN: space \t \n \x0B \f
     \r) collapse to one space; leading/trailing SPACES trim. Non-ASCII
     whitespace (\xa0, U+2007, ...) is CONTENT — Java regex \s is
     ASCII-only, so the Python implementations must not use unicode \s.

Text spans: rule 5 only. Invalid spans (missing payload) FAIL the document
with error='invalid span: missing required payload' (all-or-nothing, the
reference's per-document failure envelope).
"""

from __future__ import annotations

import base64

ASSUMED_MAX_CHAR_PER_PAGE = 528       # DocumentExtractManager.java:36
MIN_TEXT_PCT = 50                     # application.properties:4
OCR_BLOCK_BATCH = 1000                # maxResults(1000), DocumentExtractManager.java:544
# The reference's large-file gate (application.properties:5): payloads over
# this many bytes leave the inline request path for presigned direct upload.
# The Spark analog routes them to a chunked (multipart) plan computed
# map-side, so an oversized payload never rides a shuffle whole.
LARGE_FILE_THRESHOLD = 1_046_528

PDF_HEADER = "%PDF-1.4"
PDF_EOF = "%%EOF"
PAGE_MARKER = "%%Page:"
OCR_MARKER = "%%OCRBlock"

# --- shared regex fragments (Java-regex / Python-re common subset) ---------
# ASCII whitespace run — Java \s is exactly [ \t\n\x0B\f\r]; Python \s is
# unicode-wide, so every Python-side implementation uses THIS class instead.
WS_RUN = r"[ \t\n\x0B\f\r]+"

# Show-text literal: '(...) Tj' with \\ \( \) escapes. The escape tail
# excludes line terminators EXPLICITLY because Java '.' excludes \r and
# U+0085/U+2028/U+2029 while Python '.' excludes only \n — a bare '\\.'
# would make the two engines disagree on a backslash-before-\r.
# Friedl-unrolled (normal* (special normal*)*): Java compiles a quantified
# group whose body contains alternation to a RECURSIVE Pattern$Loop — one
# stack frame-set per matched character — which StackOverflowed executor
# threads on long literals (BENCH_r02 rc=1). The unrolled form recurses
# once per ESCAPE SEQUENCE instead; the plain-run [^()\\]* is an iterative
# Curly. Same language (tokenization is unique: '\\' starts an escape,
# nothing else can), so leftmost/greedy matches are byte-identical.
TJ_PATTERN = r"\(([^()\\]*(?:\\[^\n\r\u0085\u2028\u2029][^()\\]*)*)\) Tj"

# OCR block payload: maximal base64-alphabet run after the PAGE marker.
B64_TOKEN = r"([A-Za-z0-9+/=]+)"
# Canonical base64: full quanta + correct tail padding, no interior '='.
# (Spark's unbase64 RAISES on interior '='; Python b64decode is lenient on
# missing padding — only the canonical subset decodes identically in both.)
B64_CANONICAL = (
    r"(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?"
)

# Quote-aware tag body: a '>' inside "..." or '...' does not close the tag
# (HTML5 tokenizer attribute-value states).
#
# Friedl-unrolled for the same reason as TJ_PATTERN: the naive
# (?:"..."|'...'|[^>"'])* burns one Java stack frame-set per UNQUOTED
# character (Pattern$Loop recursion); a 64 KB attribute blob guarantees an
# executor StackOverflowError. Unrolled, recursion is per QUOTED SEGMENT
# only. Non-capturing throughout — ANCHOR_PATTERN's group 1 must stay the
# anchor body. Same language: '"'/'\'' can only start a quoted token and
# [^>"'] can never contain one, so the tokenization is unique and greedy
# matching is byte-identical to the naive form.
TAG_BODY = r"[^>\"']*(?:(?:\"[^\"]*\"|'[^']*')[^>\"']*)*"
WS_OPT = r"[ \t\n\x0B\f\r]*"

# HTML extraction thresholds (jusText/Arc90-style density heuristics — the
# north rule's per-node generalization of the per-document predicate P3).
HTML_MIN_BLOCK_CHARS = 10
HTML_MAX_LINK_DENSITY = 0.35

# Containers whose entire content is boilerplate by construction.
HTML_BOILERPLATE_CONTAINERS = ("head", "nav", "footer", "header", "aside")
# Tags removed with their content before any scoring.
HTML_STRIP_CONTENT_TAGS = ("script", "style")
# Block-level boundary tags that segment text into candidate blocks.
HTML_BLOCK_TAGS = (
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "div", "td", "th",
    "article", "section", "ul", "ol", "table", "tr", "body", "html",
    "title", "br", "blockquote", "pre",
)

# Decode order matters: '&amp;' must decode LAST so '&amp;lt;' -> '&lt;'
# (literal), never '<'. Both the vectorized extractor and the oracle iterate
# this dict in order.
HTML_ENTITIES = {
    "&lt;": "<", "&gt;": ">", "&quot;": '"',
    "&#39;": "'", "&nbsp;": " ", "&amp;": "&",
}


# --- ANALYSIS-mode layout grammar (FeatureType.LAYOUT analog) --------------
# The reference's second OCR mode (application.properties:3 'TextractMode
# may be either DETECTION or ANALYSIS'; DocumentExtractManager.java:304-308
# switches, 483-491 submits with FeatureType.LAYOUT). The synthetic stream
# carries layout blocks as '%%OCRBlock LAYOUT_<TYPE> <b64>' lines. ANALYSIS
# extraction keeps CONTENT block types in stream order and drops page
# furniture — the layout upgrade over DETECTION's flat PAGE concat.
# Same base64/UTF-8 degradation gates as PAGE blocks.
OCR_MODE_DETECTION = "DETECTION"
OCR_MODE_ANALYSIS = "ANALYSIS"
LAYOUT_CONTENT_TYPES = ("TITLE", "SECTION_HEADER", "TEXT", "LIST", "TABLE")
LAYOUT_FURNITURE_TYPES = ("HEADER", "FOOTER", "PAGE_NUMBER")
LAYOUT_TYPES = (*LAYOUT_CONTENT_TYPES, *LAYOUT_FURNITURE_TYPES)


def pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def pdf_unescape(s: str) -> str:
    return s.replace(r"\(", "(").replace(r"\)", ")").replace(r"\\", "\\")


def sufficiency_threshold(page_count: int) -> float:
    return (MIN_TEXT_PCT / 100.0) * page_count * ASSUMED_MAX_CHAR_PER_PAGE


def make_pdf(pages_text: list[str], ocr_pages: list[str] | None = None,
             truncated: bool = False, headerless: bool = False,
             layout_blocks: list[tuple[str, str]] | None = None) -> str:
    """Emit a synthetic-PDF payload. ``pages_text`` is the embedded text layer
    (one entry per page, possibly empty strings for scanned pages);
    ``ocr_pages`` is the latent scanned content recoverable only via OCR;
    ``layout_blocks`` is the ANALYSIS-mode stream — (LAYOUT type, text)
    pairs in reading order, types from LAYOUT_TYPES."""
    lines: list[str] = []
    if not headerless:
        lines.append(PDF_HEADER)
    for i, page in enumerate(pages_text):
        lines.append(f"{PAGE_MARKER} {i + 1}")
        if page:
            lines.append("BT")
            for part in page.split("\n"):
                lines.append(f"({pdf_escape(part)}) Tj")
            lines.append("ET")
    for i, ocr_text in enumerate(ocr_pages or []):
        b64 = base64.b64encode(ocr_text.encode("utf-8")).decode("ascii")
        lines.append(f"{OCR_MARKER} PAGE {b64}")
        # noise blocks the PAGE filter must drop:
        first_word = ocr_text.split(" ", 1)[0] if ocr_text else ""
        wb64 = base64.b64encode(first_word.encode("utf-8")).decode("ascii")
        lines.append(f"{OCR_MARKER} WORD {wb64}")
    for btype, btext in layout_blocks or []:
        bb64 = base64.b64encode(btext.encode("utf-8")).decode("ascii")
        lines.append(f"{OCR_MARKER} LAYOUT_{btype} {bb64}")
    if not truncated:
        lines.append(PDF_EOF)
    return "\n".join(lines) + "\n"
