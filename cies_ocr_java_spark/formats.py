"""Closed synthetic document grammars shared by the fixture generator, the
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
"""

from __future__ import annotations

import base64

ASSUMED_MAX_CHAR_PER_PAGE = 528       # DocumentExtractManager.java:36
MIN_TEXT_PCT = 50                     # application.properties:4
OCR_BLOCK_BATCH = 1000                # maxResults(1000), DocumentExtractManager.java:544

PDF_HEADER = "%PDF-1.4"
PDF_EOF = "%%EOF"
PAGE_MARKER = "%%Page:"
OCR_MARKER = "%%OCRBlock"

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


def pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def pdf_unescape(s: str) -> str:
    return s.replace(r"\(", "(").replace(r"\)", ")").replace(r"\\", "\\")


def sufficiency_threshold(page_count: int) -> float:
    return (MIN_TEXT_PCT / 100.0) * page_count * ASSUMED_MAX_CHAR_PER_PAGE


def make_pdf(pages_text: list[str], ocr_pages: list[str] | None = None,
             truncated: bool = False, headerless: bool = False) -> str:
    """Emit a synthetic-PDF payload. ``pages_text`` is the embedded text layer
    (one entry per page, possibly empty strings for scanned pages);
    ``ocr_pages`` is the latent scanned content recoverable only via OCR."""
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
    if not truncated:
        lines.append(PDF_EOF)
    return "\n".join(lines) + "\n"
