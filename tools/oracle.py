"""Independent single-threaded pure-Python oracle for the extraction pipeline.

Implements the same SEMANTICS as the Spark engine but with deliberately
different machinery (explicit char-walking scanners and loops instead of
vectorized regex/codegen) so golden tests compare two independent
implementations — the reference's test strategy upgraded with golden
outputs (SURVEY.md §5).

The semantics are the degradation contract at the top of formats.py: every
phase here is a hand-written scanner for the construct the engine matches
with a (shared-constant) regex — leftmost-first, non-overlapping, restart
one character after a failed attempt — so hostile inputs (unterminated
literals, unbalanced parens, unclosed quotes/comments, bogus markup,
invalid base64/UTF-8 OCR blocks, non-ASCII whitespace) degrade
identically in all three implementations.

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

from cies_ocr_java_spark.formats import (
    ASSUMED_MAX_CHAR_PER_PAGE,
    B64_CANONICAL,
    HTML_BLOCK_TAGS,
    HTML_BOILERPLATE_CONTAINERS,
    HTML_ENTITIES,
    HTML_MAX_LINK_DENSITY,
    HTML_MIN_BLOCK_CHARS,
    HTML_STRIP_CONTENT_TAGS,
    MIN_TEXT_PCT,
    OCR_MARKER,
    PAGE_MARKER,
    PDF_EOF,
    PDF_HEADER,
)

# ASCII whitespace — the Java \s set; .strip(" ") mirrors Spark's trim.
_WS_CHARS = " \t\n\x0b\f\r"
_WS = re.compile("[" + _WS_CHARS + "]+")
_LINE_TERM = {"\n", "\r", "\u0085", "\u2028", "\u2029"}
_B64_ALPHABET = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/="
)
_B64_CANON = re.compile(B64_CANONICAL)
_WORD_CHARS = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")
# ASCII-only lowercase (A-Z -> a-z, every other char untouched). Python's
# str.lower() is NOT length-preserving (e.g. 'İ' U+0130 lowers to 2 chars),
# which would misalign every index computed on the lowered copy — and
# ASCII folding is also the DEFINED semantics: Java (?i) folds ASCII only
# unless UNICODE_CASE is set, and the pandas paths compile with
# re.I|re.ASCII, which restricts IGNORECASE to ASCII the same way.
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def _ascii_lower(s: str) -> str:
    return s.translate(_ASCII_LOWER)


def norm(s: str) -> str:
    return _WS.sub(" ", s).strip(" ")


# --- PDF -------------------------------------------------------------------


def _scan_tj_literals(payload: str) -> list[str]:
    """Char-walk scanner with the exact semantics of TJ_PATTERN: a literal
    opens at '(', consumes non-paren chars or backslash escapes (an escape
    before a line terminator fails the attempt), closes at an unescaped
    ')' that must be followed by ' Tj'. A failed attempt restarts one
    character later; a match resumes after ' Tj'."""
    out: list[str] = []
    i, n = 0, len(payload)
    while i < n:
        if payload[i] != "(":
            i += 1
            continue
        j = i + 1
        buf: list[str] = []
        closed = False
        while j < n:
            ch = payload[j]
            if ch == "\\":
                if j + 1 < n and payload[j + 1] not in _LINE_TERM:
                    buf.append(payload[j : j + 2])
                    j += 2
                    continue
                break  # bad escape: this attempt fails
            if ch == ")":
                closed = True
                break
            if ch == "(":
                break  # unescaped '(' inside: attempt fails
            buf.append(ch)
            j += 1
        if closed and payload[j + 1 : j + 4] == " Tj":
            out.append("".join(buf))
            i = j + 4
        else:
            i += 1
    return out


def _unescape(lit: str) -> str:
    """Only \\\\ \\( \\) unescape; any other backslash is content."""
    out, i = [], 0
    while i < len(lit):
        if lit[i] == "\\" and i + 1 < len(lit) and lit[i + 1] in "\\()":
            out.append(lit[i + 1])
            i += 2
        else:
            out.append(lit[i])
            i += 1
    return "".join(out)


def _scan_ocr_blocks(payload: str) -> list[str]:
    """PAGE blocks in document order: after each '%%OCRBlock PAGE ' the
    payload is the maximal base64-alphabet run; decoded iff canonical
    base64 AND valid UTF-8, else skipped (degradation contract)."""
    marker = f"{OCR_MARKER} PAGE "
    out: list[str] = []
    i = 0
    n = len(payload)
    while True:
        k = payload.find(marker, i)
        if k < 0:
            break
        j = k + len(marker)
        m = j
        while m < n and payload[m] in _B64_ALPHABET:
            m += 1
        token = payload[j:m]
        if token:
            i = m
            if _B64_CANON.fullmatch(token):
                try:
                    out.append(base64.b64decode(token).decode("utf-8"))
                except (ValueError, UnicodeDecodeError):
                    pass
        else:
            i = k + 1
    return out


_LAYOUT_TYPE_CHARS = set("ABCDEFGHIJKLMNOPQRSTUVWXYZ_")


def _scan_layout_blocks(payload: str) -> list[tuple[str, str]]:
    """ANALYSIS-mode layout blocks in order: after '%%OCRBlock LAYOUT_' a
    maximal [A-Z_]+ type run, one space, then the b64 payload under the
    same canonical+UTF-8 gates as PAGE blocks. -> [(block_type, text)]."""
    marker = f"{OCR_MARKER} LAYOUT_"
    out: list[tuple[str, str]] = []
    i = 0
    n = len(payload)
    while True:
        k = payload.find(marker, i)
        if k < 0:
            break
        j = k + len(marker)
        t = j
        while t < n and payload[t] in _LAYOUT_TYPE_CHARS:
            t += 1
        btype = payload[j:t]
        if not btype or t >= n or payload[t] != " ":
            i = k + 1
            continue
        m = t + 1
        b = m
        while b < n and payload[b] in _B64_ALPHABET:
            b += 1
        token = payload[m:b]
        if not token:
            i = k + 1
            continue
        i = b
        if _B64_CANON.fullmatch(token):
            try:
                out.append((btype, base64.b64decode(token).decode("utf-8")))
            except (ValueError, UnicodeDecodeError):
                pass
    return out


def ocr_analysis_text(payload: str) -> str:
    """ANALYSIS main text: CONTENT layout blocks joined in order,
    normalized; furniture dropped (FeatureType.LAYOUT analog)."""
    from cies_ocr_java_spark.formats import LAYOUT_CONTENT_TYPES

    return norm(
        " ".join(
            t for bt, t in _scan_layout_blocks(payload)
            if bt in LAYOUT_CONTENT_TYPES
        )
    )


def parse_pdf(payload: str) -> dict:
    """-> dict(text, page_count, ocr_text, malformed). Marker checks are
    position-free (payload-level startswith / substring / occurrence
    count), matching the engine's regex semantics exactly."""
    return {
        "text": norm(" ".join(_unescape(t) for t in _scan_tj_literals(payload))),
        "page_count": payload.count(PAGE_MARKER),
        "ocr_text": norm(" ".join(_scan_ocr_blocks(payload))),
        "malformed": (
            not payload.startswith(PDF_HEADER)
            or PDF_EOF not in payload
            or PAGE_MARKER not in payload
        ),
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

_BLOCK_TAGS_LOWER = tuple(t.lower() for t in HTML_BLOCK_TAGS)


def _tag_end(s: str, lt: int) -> int:
    """s[lt] == '<' and s[lt+1] is a tag-start char: return the index AFTER
    the quote-aware closing '>', or -1 if the tag never closes (unclosed
    quote / EOF) — in which case the '<' is character data."""
    i = lt + 1
    n = len(s)
    while i < n:
        c = s[i]
        if c == '"' or c == "'":
            j = s.find(c, i + 1)
            if j < 0:
                return -1
            i = j + 1
        elif c == ">":
            return i + 1
        else:
            i += 1
    return -1


def _is_tag_start(c: str) -> bool:
    return c.isascii() and (c.isalpha() or c in "!?/")


def _find_named_tag(s_lower: str, s: str, name: str, start: int,
                    closing: bool = False) -> tuple[int, int]:
    """Next occurrence of <name...> (or </name...>) with an ASCII word
    boundary after the name and a quote-aware closing '>'. For closing
    tags only WS is allowed before '>' (the engine's </tag\\s*> form).
    Returns (tag_start, tag_end_exclusive) or (-1, -1)."""
    pat = ("</" if closing else "<") + name
    i = start
    while True:
        k = s_lower.find(pat, i)
        if k < 0:
            return -1, -1
        after = k + len(pat)
        if after < len(s) and s[after] in _WORD_CHARS:
            i = k + 1
            continue
        if closing:
            m = after
            while m < len(s) and s[m] in _WS_CHARS:
                m += 1
            if m < len(s) and s[m] == ">":
                return k, m + 1
            i = k + 1
            continue
        end = _tag_end(s, k)
        if end < 0:
            i = k + 1
            continue
        return k, end


def _strip_comments(s: str) -> str:
    """Closed <!--...--> -> ' '; an unclosed '<!--' is left for the tag
    phase (where '<!' opens a markup declaration)."""
    out: list[str] = []
    i = 0
    while True:
        k = s.find("<!--", i)
        if k < 0:
            out.append(s[i:])
            break
        m = s.find("-->", k + 4)
        if m < 0:
            out.append(s[i:])
            break
        out.append(s[i:k])
        out.append(" ")
        i = m + 3
    return "".join(out)


def _strip_container(s: str, tag: str) -> str:
    """First-closing pair strip: <tag...> ... </tag> -> ' ', leftmost,
    non-overlapping; an open tag without a close drops nothing here."""
    out: list[str] = []
    i = 0
    sl = _ascii_lower(s)
    while True:
        k, open_end = _find_named_tag(sl, s, tag, i)
        if k < 0:
            out.append(s[i:])
            break
        ck, close_end = _find_named_tag(sl, s, tag, open_end, closing=True)
        if ck < 0:
            # no close anywhere after: the regex can never match from any
            # later open either, but later opens must still be re-tried
            # (an earlier failed open does not consume them) — simply
            # continue scanning one char later, like the regex engine.
            out.append(s[i : k + 1])
            i = k + 1
            continue
        out.append(s[i:k])
        out.append(" ")
        i = close_end
    return "".join(out)


def _split_blocks(s: str) -> list[str]:
    """Split at block-level tag occurrences (open or close, quote-aware),
    exactly like the engine's split regex — including matches that sit
    inside another tag's attribute text, because regex has no context."""
    frags: list[str] = []
    i = last = 0
    sl = _ascii_lower(s)
    n = len(s)
    while i < n:
        if s[i] != "<":
            i += 1
            continue
        j = i + 1
        if j < n and s[j] == "/":
            j += 1
        # longest-alternation semantics do not matter here: tag names are
        # boundary-checked, so at most one block tag can match at i
        name_start = j
        m = j
        while m < n and s[m].isascii() and (s[m].isalnum()):
            m += 1
        name = sl[name_start:m]
        if name in _BLOCK_TAGS_LOWER and not (m < n and s[m] in _WORD_CHARS):
            end = _tag_end(s, i)
            if end > 0:
                frags.append(s[last:i])
                last = i = end
                continue
        i += 1
    frags.append(s[last:])
    return frags


def _scan_anchors(frag: str) -> list[str]:
    """Inner bodies of <a ...>...</a> pairs, first-closing, non-overlapping."""
    out: list[str] = []
    i = 0
    fl = _ascii_lower(frag)
    while True:
        k, open_end = _find_named_tag(fl, frag, "a", i)
        if k < 0:
            break
        ck, close_end = _find_named_tag(fl, frag, "a", open_end, closing=True)
        if ck < 0:
            i = k + 1
            continue
        out.append(frag[open_end:ck])
        i = close_end
    return out


def _strip_tags(s: str) -> str:
    """'<' + [a-zA-Z!?/] + quote-aware body + '>' -> ' '; any other '<'
    (including one whose tag never closes) is character data."""
    out: list[str] = []
    i = last = 0
    n = len(s)
    while i < n:
        if s[i] == "<" and i + 1 < n and _is_tag_start(s[i + 1]):
            end = _tag_end(s, i)
            if end > 0:
                out.append(s[last:i])
                out.append(" ")
                last = i = end
                continue
        i += 1
    out.append(s[last:])
    return "".join(out)


def _clean(fragment: str) -> str:
    t = _strip_tags(fragment)
    for ent, ch in HTML_ENTITIES.items():  # '&amp;' last
        t = t.replace(ent, ch)
    return norm(t)


def extract_html(payload: str) -> str:
    s = _strip_comments(payload)
    for tag in (*HTML_STRIP_CONTENT_TAGS, *HTML_BOILERPLATE_CONTAINERS):
        s = _strip_container(s, tag)
    kept: list[str] = []
    for frag in _split_blocks(s):
        text = _clean(frag)
        if len(text) < HTML_MIN_BLOCK_CHARS:
            continue
        link_chars = sum(len(_clean(inner)) for inner in _scan_anchors(frag))
        if link_chars / max(len(text), 1) <= HTML_MAX_LINK_DENSITY:
            kept.append(text)
    return norm(" ".join(kept))


# --- whole-document oracle -----------------------------------------------------


def extract_document(doc_id: str, spans: list[dict],
                     ocr_mode: str = "DETECTION") -> dict:
    """-> dict(doc_id, spans=[{kind,text,media_ref,order}]|None, text, status, error).
    spans is None (and status FAILED) when any input span fails.
    ``ocr_mode`` mirrors TextractMode (application.properties:3): DETECTION
    concatenates PAGE blocks; ANALYSIS keeps CONTENT layout blocks in order
    and drops furniture (FeatureType.LAYOUT,
    DocumentExtractManager.java:483-491)."""
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
            elif text is not None and re.match(
                r"^[ \t\n\x0b\f\r]*<(!doctype[ \t\n\x0b\f\r]+html|html)",
                text.lower(),
            ):
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
            p = parse_pdf(text)
            if p["malformed"]:
                return _failed(doc_id, "malformed pdf payload")
            if pdf_sufficient(p["text"], p["page_count"]):
                extracted = p["text"]
            else:
                used_ocr = True
                extracted = (
                    ocr_analysis_text(text)
                    if ocr_mode == "ANALYSIS"
                    else p["ocr_text"]
                )
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
