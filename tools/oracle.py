"""Independent single-threaded pure-Python oracle for the extraction pipeline.

Implements the same SEMANTICS as the Spark engine but with deliberately
different machinery (stdlib html.parser / line-walking PDF parse / explicit
loops) so golden tests compare two independent implementations — the
reference's test strategy upgraded with golden outputs (SURVEY.md §5).

Reference semantics implemented:
  * PDF text layer + page count  (DocumentExtractManager.java:438-461)
  * text-sufficiency predicate P3, strict '>'  (410-429; constant 528 at :36)
  * OCR PAGE-block filter + in-order concat  (540-599)
  * HTML main-content via per-block text/link-density (north_rule heuristics)
  * all-or-nothing per-document failure  (324-363)
  * dense output re-indexing after dropping empty extractions
"""

from __future__ import annotations

import base64
import re
from html.parser import HTMLParser

from cies_ocr_java_spark.formats import (
    ASSUMED_MAX_CHAR_PER_PAGE,
    HTML_BLOCK_TAGS,
    HTML_BOILERPLATE_CONTAINERS,
    HTML_MAX_LINK_DENSITY,
    HTML_MIN_BLOCK_CHARS,
    HTML_STRIP_CONTENT_TAGS,
    MIN_TEXT_PCT,
    OCR_MARKER,
    PAGE_MARKER,
    PDF_EOF,
    PDF_HEADER,
)

_WS = re.compile(r"\s+")


def norm(s: str) -> str:
    return _WS.sub(" ", s).strip()


# --- PDF -------------------------------------------------------------------


def parse_pdf(payload: str) -> dict:
    """Line-walking parser: returns dict(text, page_count, ocr_text, malformed)."""
    lines = payload.split("\n")
    has_header = bool(lines) and lines[0].startswith(PDF_HEADER)
    has_eof = any(ln.startswith(PDF_EOF) for ln in lines)
    pages = sum(1 for ln in lines if ln.startswith(PAGE_MARKER))
    tj_parts: list[str] = []
    ocr_parts: list[str] = []
    for ln in lines:
        if ln.endswith(") Tj") and ln.startswith("("):
            lit = ln[1:-4]
            # char-walk unescape (independent of the engine's regex)
            out, i = [], 0
            while i < len(lit):
                if lit[i] == "\\" and i + 1 < len(lit):
                    out.append(lit[i + 1])
                    i += 2
                else:
                    out.append(lit[i])
                    i += 1
            tj_parts.append("".join(out))
        elif ln.startswith(f"{OCR_MARKER} PAGE "):
            b64 = ln.split(" ", 2)[2]
            ocr_parts.append(base64.b64decode(b64).decode("utf-8"))
    return {
        "text": norm(" ".join(tj_parts)),
        "page_count": pages,
        "ocr_text": norm(" ".join(ocr_parts)),
        "malformed": not has_header or not has_eof or pages == 0,
    }


def pdf_sufficient(text: str, page_count: int) -> bool:
    return len(text) > (MIN_TEXT_PCT / 100.0) * page_count * ASSUMED_MAX_CHAR_PER_PAGE


def extract_pdf(payload: str) -> tuple[str | None, str | None]:
    """-> (extracted_text, error)."""
    p = parse_pdf(payload)
    if p["malformed"]:
        return None, "malformed pdf payload"
    if pdf_sufficient(p["text"], p["page_count"]):
        return p["text"], None
    return p["ocr_text"], None


# --- HTML --------------------------------------------------------------------

_BLOCK = set(HTML_BLOCK_TAGS)
_EXCLUDE = set(HTML_BOILERPLATE_CONTAINERS) | set(HTML_STRIP_CONTENT_TAGS)


class _MainContentParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.exclude_depth = 0
        self.blocks: list[tuple[str, int]] = []  # (block text, link_chars)
        self._chunks: list[str] = []
        self._link_chars = 0
        self._anchor_chunks: list[str] | None = None

    def _flush(self) -> None:
        text = norm(" ".join(self._chunks))
        if text or self._link_chars:
            self.blocks.append((text, self._link_chars))
        self._chunks = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _EXCLUDE:
            self.exclude_depth += 1
            return
        if self.exclude_depth:
            return
        if tag in _BLOCK:
            self._flush()
        elif tag == "a":
            self._anchor_chunks = []

    def handle_endtag(self, tag):
        if tag in _EXCLUDE:
            self.exclude_depth = max(0, self.exclude_depth - 1)
            return
        if self.exclude_depth:
            return
        if tag in _BLOCK:
            self._flush()
        elif tag == "a" and self._anchor_chunks is not None:
            self._link_chars += len(norm(" ".join(self._anchor_chunks)))
            self._anchor_chunks = None

    def handle_startendtag(self, tag, attrs):
        if not self.exclude_depth and tag in _BLOCK:
            self._flush()

    def handle_data(self, data):
        if self.exclude_depth:
            return
        self._chunks.append(data)
        if self._anchor_chunks is not None:
            self._anchor_chunks.append(data)

    def close(self):
        super().close()
        self._flush()


def extract_html(payload: str) -> str:
    p = _MainContentParser()
    p.feed(payload)
    p.close()
    kept = [
        text
        for text, link_chars in p.blocks
        if len(text) >= HTML_MIN_BLOCK_CHARS
        and link_chars / max(len(text), 1) <= HTML_MAX_LINK_DENSITY
    ]
    return norm(" ".join(kept))


# --- whole-document oracle -----------------------------------------------------


def extract_document(doc_id: str, spans: list[dict]) -> dict:
    """-> dict(doc_id, spans=[{kind,text,media_ref,order}]|None, text, status, error).
    spans is None (and status FAILED) when any input span fails."""
    if not spans:
        return {
            "doc_id": doc_id, "spans": None, "text": None,
            "status": "FAILED", "error": "invalid span: missing required payload",
            "used_ocr": False,
        }
    out: list[dict] = []
    used_ocr = False
    for span in sorted(spans, key=lambda s: s["offset"]):
        kind, text, media_ref = span["kind"], span["text"], span["media_ref"]
        if kind not in ("html", "pdf", "text", "media"):  # content sniff (F3 analog)
            if media_ref is not None:
                kind = "media"
            elif text is not None and text.startswith(PDF_HEADER):
                kind = "pdf"
            elif text is not None and re.match(r"^\s*<(!doctype\s+html|html)", text.lower()):
                kind = "html"
            else:
                kind = "text"
        if kind == "media":
            if media_ref is None:
                return _failed(doc_id, "invalid span: missing required payload")
            out.append({"kind": "media", "text": None, "media_ref": media_ref})
            continue
        if text is None:
            return _failed(doc_id, "invalid span: missing required payload")
        if kind == "pdf":
            extracted, err = extract_pdf(text)
            if err:
                return _failed(doc_id, err)
            if not pdf_sufficient(
                parse_pdf(text)["text"], parse_pdf(text)["page_count"]
            ):
                used_ocr = True
        elif kind == "html":
            extracted = extract_html(text)
        else:  # text (or sniffed text)
            extracted = norm(text)
        if extracted:
            out.append({"kind": "text", "text": extracted, "media_ref": None})
    for i, s in enumerate(out):
        s["order"] = i
    flat = " ".join(s["text"] for s in out if s["kind"] == "text")
    return {
        "doc_id": doc_id, "spans": out, "text": flat,
        "status": "SUCCEEDED", "error": None, "used_ocr": used_ocr,
    }


def _failed(doc_id: str, error: str) -> dict:
    return {
        "doc_id": doc_id, "spans": None, "text": None,
        "status": "FAILED", "error": error, "used_ocr": False,
    }
