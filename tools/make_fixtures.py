"""Deterministic fixture-corpus generator + golden-output writer (seed=42).

Generalizes the reference's 3-PDF fixture corpus + mocked single-block OCR
responses (SURVEY.md §5, FIXTURES.md) into the class mix of FIXTURES.md:
rich-text PDFs (shortcut path), scanned PDFs (OCR path), boundary PDFs
(strict-'>' edge), boilerplate HTML, plain text, interleaved text+media,
duplicate pairs, giant skew docs, and malformed payloads.

Writes:
  <out>/documents.parquet        input table (input_hint shape)
  <out>/expected_spans.parquet   golden outputs from the pure-Python oracle
  <out>/expected_state.parquet   golden per-doc status/error/used_ocr

Usage: python tools/make_fixtures.py [--docs 200] [--out fixtures/sf-small]
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from cies_ocr_java_spark.formats import make_pdf
from tools import oracle

WORDS = (
    "report patient scan finding normal result clinical exam chest axial "
    "contrast lesion stable study prior comparison impression history "
    "technique findings abdomen pelvis lung liver spleen kidney margin "
    "density nodule mass effusion fracture alignment signal series image"
).split()

BOILER_LINKS = ["Home", "About Us", "Contact", "Privacy Policy", "Terms", "Login",
                "Sitemap", "Careers", "Help Center", "Search"]


def words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def text_of_len(rng: random.Random, n: int) -> str:
    """Exactly-n-char normalized text (for the strict-'>' boundary class)."""
    s = words(rng, max(1, n // 6))
    while len(s) < n:
        s += " " + rng.choice(WORDS)
    if len(s) > n:
        s = s[:n].rstrip()
        while len(s) < n:
            s += "x"
    return s


# --- per-class builders; each returns list[span dict] -----------------------


def _span(kind, text, media_ref, offset):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def build_pdf_rich(rng, doc_id):
    pages = [words(rng, rng.randint(60, 110)) for _ in range(rng.randint(1, 4))]
    # occasionally exercise escapes
    if rng.random() < 0.3:
        pages[0] = pages[0] + " (escaped) " + "back\\slash"
    return [_span("pdf", make_pdf(pages), None, 0)]


def build_pdf_scanned(rng, doc_id):
    n_pages = rng.randint(1, 4)
    layer = [words(rng, rng.randint(0, 6)) for _ in range(n_pages)]  # thin layer
    ocr = [words(rng, rng.randint(40, 90)) for _ in range(n_pages)]
    # ANALYSIS-mode layout stream alongside the PAGE blocks: a title, the
    # page bodies as TEXT, and furniture the LAYOUT filter must drop.
    # Inert under DETECTION (LAYOUT_ lines never match the PAGE pattern).
    layout = [("TITLE", words(rng, rng.randint(3, 8)))]
    for i, page in enumerate(ocr):
        layout.append(("HEADER", f"page header {i + 1}"))
        layout.append(("TEXT", page))
        layout.append(("PAGE_NUMBER", str(i + 1)))
    return [_span("pdf", make_pdf(layer, ocr_pages=ocr, layout_blocks=layout),
                  None, 0)]


def build_pdf_boundary(rng, doc_id):
    # text layer EXACTLY at threshold (0.5 * 528 * pages) -> NOT sufficient
    # (strict '>' per DocumentExtractManager.java:417); 1 or 2 pages
    if rng.random() < 0.5:
        layer_pages = [text_of_len(rng, 264)]
    else:
        # two pages; join adds 1 separator char, so total must be 2*264:
        # page lengths L and 528-L-1 plus the ' ' joiner = 528 exactly
        left = rng.randint(200, 300)
        layer_pages = [text_of_len(rng, left), text_of_len(rng, 2 * 264 - left - 1)]
    ocr = [words(rng, 50) for _ in layer_pages]
    return [_span("pdf", make_pdf(layer_pages, ocr_pages=ocr), None, 0)]


def build_html(rng, doc_id):
    paras = [f"<p>{words(rng, rng.randint(15, 40))}</p>" for _ in range(rng.randint(2, 6))]
    linkfarm = "<p>" + " ".join(
        f'<a href="/l{i}">{rng.choice(BOILER_LINKS)}</a>' for i in range(6)
    ) + "</p>"
    nav = "<nav>" + " ".join(f'<a href="/n{i}">{t}</a>' for i, t in enumerate(BOILER_LINKS[:5])) + "</nav>"
    inline = f"<p>{words(rng, 10)} <b>{words(rng, 3)}</b> <a href=\"/x\">{words(rng, 2)}</a> {words(rng, 12)}</p>"
    pieces = paras + [inline]
    rng.shuffle(pieces)
    html = (
        "<html><head><title>Fixture</title><style>p{color:red}</style></head><body>"
        + nav
        + "<div class=\"content\">" + linkfarm + "".join(pieces) + "</div>"
        + "<!-- comment --><footer><a href=\"/a\">About</a> &copy; 2024</footer>"
        + "</body></html>"
    )
    return [_span("html", html, None, 0)]


def build_html_structured(rng, doc_id):
    """Tables, nested lists, blockquotes, entity-heavy text — the block-tag
    set beyond plain <p>."""
    rows = "".join(
        f"<tr><td>{words(rng, rng.randint(4, 9))}</td><td>{words(rng, rng.randint(4, 9))}</td></tr>"
        for _ in range(rng.randint(2, 4))
    )
    items = "".join(f"<li>{words(rng, rng.randint(5, 12))}</li>" for _ in range(rng.randint(2, 5)))
    entity_para = (
        f"<p>{words(rng, 8)} &amp; {words(rng, 4)} &lt;tagged&gt; "
        f"&quot;{words(rng, 3)}&quot; &#39;q&#39; &nbsp; {words(rng, 6)}</p>"
    )
    quote = f"<blockquote>{words(rng, rng.randint(12, 25))}</blockquote>"
    html = (
        "<html><head><title>S</title></head><body>"
        "<header><a href='/'>Top</a> menu menu</header>"
        f"<article><table>{rows}</table><ul>{items}</ul>{entity_para}{quote}</article>"
        "<aside><a>ad one</a> <a>ad two</a></aside>"
        "</body></html>"
    )
    return [_span("html", html, None, 0)]


def build_text(rng, doc_id):
    n = rng.randint(1, 3)
    return [
        _span("text", words(rng, rng.randint(10, 60)) + ("\n  extra\tws " if rng.random() < 0.5 else ""), None, i)
        for i in range(n)
    ]


def build_interleaved(rng, doc_id):
    spans = []
    n = rng.randint(3, 7)
    for i in range(n):
        if i % 2 == 1:
            spans.append(_span("media", None, f"media://{doc_id}/{i:04d}", i))
        else:
            kind = rng.choice(["text", "html", "pdf"])
            if kind == "text":
                spans.append(_span("text", words(rng, rng.randint(8, 30)), None, i))
            elif kind == "html":
                spans.append(build_html(rng, doc_id)[0] | {"offset": i})
            else:
                spans.append(build_pdf_rich(rng, doc_id)[0] | {"offset": i})
    rng.shuffle(spans)  # array order must NOT matter; offset is authoritative
    return spans


def build_giant(rng, doc_id):
    # skew tail: many spans, or one huge OCR doc crossing the 1000-block batch
    if rng.random() < 0.5:
        return [
            _span("text", words(rng, rng.randint(20, 40)), None, i)
            for i in range(rng.randint(120, 300))
        ]
    n_blocks = rng.randint(1200, 2500)
    ocr = [words(rng, 8) for _ in range(n_blocks)]
    return [_span("pdf", make_pdf([""], ocr_pages=ocr), None, 0)]


# Hostile construct soup for the adversarial tier (degradation contract,
# formats.py): unbalanced BT/ET and parens, unterminated literals, escapes
# before line terminators, invalid/non-canonical/non-UTF8 base64 OCR blocks,
# mid-line markers; unclosed comments and quotes, attribute bombs (quoted
# '>'), bogus markup ('<' + non-tag-start), undecodable entities, non-ASCII
# whitespace. Every atom is DEFINED behavior — the oracle computes the
# golden output and the engine must match it exactly.
PDF_HOSTILE_ATOMS = [
    "BT\n", "ET\n", "(", ")", " Tj", "\\", "\\(", "\\)", "\\\\",
    "(text inside) Tj\n", "(a\\) b) Tj\n", "((nested) Tj\n", "(\\z odd esc) Tj\n",
    "(unterminated literal", "junk (mid) Tj trailing", "(ok) Tjx\n",
    "(a\\\rb) Tj\n", "(a\\\nb) Tj\n", "\r", "\x0b", "\xa0", "\t",
    "%%OCRBlock PAGE !!notb64!!\n", "%%OCRBlock PAGE abc\n",
    "%%OCRBlock PAGE /w==\n", "%%OCRBlock PAGE a=b=\n",
    "%%OCRBlock PAGE aGVsbG8=\n", "%%OCRBlock WORD aGk=\n",
    "%%OCRBlock PAGE \n", "stray %%Page: 9 mid-line ", "plain words ",
    "%%OCRBlock LAYOUT_TITLE aGVsbG8=\n", "%%OCRBlock LAYOUT_BOGUS aGk=\n",
    "%%OCRBlock LAYOUT_TEXT !!bad!!\n", "%%OCRBlock LAYOUT_ x\n",
    "%%OCRBlock LAYOUT_TEXT /w==\n", "%%OCRBlock LAYOUT_PAGE_NUMBER MQ==\n",
]
HTML_HOSTILE_ATOMS = [
    "<p>", "</p>", "<div>", "</div>", "<nav>", "</nav>",
    "<script>var x = '</p>';</script>", "<a href='/x'>", "</a>",
    "long enough visible words to pass the min block filter ",
    "<!-- closed comment -->", "<!-- unclosed comment tail",
    '<p class="attr > bomb">', "<p a='q>r'>", '<img alt="<p>not a split">',
    '<p a="unclosed quote', "&amp;", "&lt;tag&gt;", "&copy;", "&amp",
    "&#160;", "< notag", "<1abc>", "</ x>", "<", ">", "\xa0", "\x0b",
    "<NAV>upper</NAV>", "<navx>not nav</navx>", "<prex>not pre</prex>",
    "\u0130stanbul length-changing-lower", "stra\u00dfe \u1e9e",
    "<?pi junk >", "<! decl >", "<a href=x>linkfarm linkfarm</a>",
]
MIXED_ENCODING_WORDS = [
    "caf\xe9", "na\xefve", "stra\xdfe", "日本語",
    "русский", "étude",
    "A\xa0B", "tab\there", "x\x0by", "emoji\U0001f600",
]


def build_pdf_adversarial(rng, doc_id):
    """Well-formed envelope (header/page/EOF) around hostile middle content:
    exercises extract-what-parses degradation, not the malformed gate."""
    middle = "".join(
        rng.choice(PDF_HOSTILE_ATOMS) for _ in range(rng.randint(4, 30))
    )
    payload = f"%PDF-1.4\n%%Page: 1\n{middle}\n%%EOF\n"
    return [_span("pdf", payload, None, 0)]


def build_html_adversarial(rng, doc_id):
    soup = "".join(
        rng.choice(HTML_HOSTILE_ATOMS) for _ in range(rng.randint(5, 40))
    )
    return [_span("html", soup, None, 0)]


def build_stack_bomb(rng, doc_id):
    """Regex-recursion killers (round-2 verdict #1): payloads where the old
    branch-in-loop grammar regexes burned one JVM stack frame-set per
    CHARACTER (Pattern$Loop recursion -> executor StackOverflowError at
    sf0.1). With the Friedl-unrolled TAG_BODY/TJ_PATTERN these must extract
    (or degrade per the contract) without crashing: >=64 KB quote-free tag
    bodies, >=64 KB Tj literals, and unterminated literals with long tails."""
    filler = "".join(rng.choice("abcdefgh -=") for _ in range(66000))
    mode = rng.randrange(4)
    if mode == 0:  # one tag, giant unquoted attribute blob
        body = f"{words(rng, 20)} visible main sentence {words(rng, 10)}"
        return [_span(
            "html",
            f"<html><body><p data-x={filler}>{body}</p></body></html>",
            None, 0,
        )]
    if mode == 1:  # unclosed quote: the tag never closes, '<' is text data
        return [_span(
            "html", f'<p a="{filler}>tail after unclosed quote {words(rng, 15)}',
            None, 0,
        )]
    if mode == 2:  # >=64 KB show-text literal (plain run, no escapes)
        return [_span("pdf", make_pdf([filler + " " + words(rng, 10)]), None, 0)]
    # unterminated '(' followed by the 64 KB tail; the good literal before
    # it must still extract (failed attempts restart one char later)
    payload = (
        f"%PDF-1.4\n%%Page: 1\nBT\n({words(rng, 8)}) Tj\n({filler}\nET\n%%EOF\n"
    )
    return [_span("pdf", payload, None, 0)]


def build_truncated(rng, doc_id):
    """A well-formed PDF cut at a random character — usually malformed
    (no %%EOF), occasionally still well-formed (cut inside the trailing
    newline); the oracle decides, the engine must agree either way."""
    base = make_pdf(
        [words(rng, rng.randint(30, 80))],
        ocr_pages=[words(rng, 20)] if rng.random() < 0.5 else None,
    )
    cut = rng.randrange(1, len(base))
    return [_span("pdf", base[:cut], None, 0)]


def build_mixed_encoding(rng, doc_id):
    """Non-ASCII content everywhere: text spans, HTML, and PDF literals.
    Pins the ASCII-whitespace contract (\\xa0 is content, \\x0b collapses)
    across the unicode range, CJK through combining marks."""
    t = " ".join(rng.choice(MIXED_ENCODING_WORDS) for _ in range(rng.randint(5, 20)))
    mode = rng.randrange(3)
    if mode == 0:
        return [_span("text", t, None, 0)]
    if mode == 1:
        return [_span("html", f"<html><body><p>{t} {t}</p></body></html>", None, 0)]
    return [_span("pdf", make_pdf([t + " " + words(rng, 60)]), None, 0)]


def build_malformed(rng, doc_id):
    mode = rng.randrange(4)
    if mode == 0:  # truncated pdf
        return [_span("pdf", make_pdf([words(rng, 80)], truncated=True), None, 0)]
    if mode == 1:  # headerless pdf
        return [_span("pdf", make_pdf([words(rng, 80)], headerless=True), None, 0)]
    if mode == 2:  # empty doc
        return []
    return [_span("text", None, None, 0)]  # body-required violation


def build_sniffed(rng, doc_id):
    # kind=null payloads: classifier must sniff
    p = rng.random()
    if p < 0.4:
        return [_span(None, make_pdf([words(rng, 90)]), None, 0)]
    if p < 0.7:
        return [_span(None, build_html(rng, doc_id)[0]["text"], None, 0)]
    return [_span(None, words(rng, 25), None, 0)]


CLASS_MIX = [
    ("pdf_rich", 0.16, build_pdf_rich),
    ("pdf_scanned", 0.16, build_pdf_scanned),
    ("pdf_boundary", 0.02, build_pdf_boundary),
    ("html", 0.15, build_html),
    ("stack_bomb", 0.01, build_stack_bomb),
    ("html_structured", 0.05, build_html_structured),
    ("text", 0.07, build_text),
    ("interleaved", 0.13, build_interleaved),
    ("giant", 0.02, build_giant),
    ("malformed", 0.04, build_malformed),
    ("sniffed", 0.04, build_sniffed),
    ("pdf_adversarial", 0.04, build_pdf_adversarial),
    ("html_adversarial", 0.04, build_html_adversarial),
    ("truncated", 0.02, build_truncated),
    ("mixed_encoding", 0.03, build_mixed_encoding),
    # dup pairs handled separately: 0.02
]


def generate(n_docs: int, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    docs = []
    i = 0
    while len(docs) < n_docs:
        doc_id = f"doc-{i:06d}"
        r = rng.random()
        acc = 0.0
        builder = build_text
        for _, share, fn in CLASS_MIX:
            acc += share
            if r < acc:
                builder = fn
                break
        else:
            # duplicate-content pair (PET-CT1 vs 1DAE93F8 twin fixture)
            spans = build_pdf_rich(rng, doc_id)
            docs.append({"doc_id": doc_id, "spans": spans})
            i += 1
            docs.append({"doc_id": f"doc-{i:06d}", "spans": [dict(s) for s in spans]})
            i += 1
            continue
        docs.append({"doc_id": doc_id, "spans": builder(rng, doc_id)})
        i += 1
    return docs[:n_docs]


SPAN_T = pa.struct(
    [("kind", pa.string()), ("text", pa.string()),
     ("media_ref", pa.string()), ("offset", pa.int32())]
)
OUT_SPAN_T = pa.struct(
    [("kind", pa.string()), ("text", pa.string()),
     ("media_ref", pa.string()), ("order", pa.int32())]
)


def write_corpus(docs: list[dict], out_dir: str, goldens: bool = True) -> None:
    """``goldens=False`` writes only documents.parquet — for callers that
    need an input corpus but not the (single-threaded, driver-side)
    oracle pass, e.g. the bench skew probe."""
    os.makedirs(out_dir, exist_ok=True)
    tbl = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
            "spans": pa.array(
                [
                    [
                        (s["kind"], s["text"], s["media_ref"], s["offset"])
                        for s in d["spans"]
                    ]
                    for d in docs
                ],
                pa.list_(SPAN_T),
            ),
        }
    )
    # Bounded row groups: Spark cannot split WITHIN a parquet row group, so
    # a single-row-group file serializes the scan (measured: caps 2->8 thread
    # scaling at ~2.2x on a 150k-doc corpus). ~4k rows/group ~= 16 MB keeps
    # the scan splittable at any corpus size.
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"),
                   row_group_size=4096)
    if not goldens:
        return

    golden = [oracle.extract_document(d["doc_id"], d["spans"]) for d in docs]
    ok = [g for g in golden if g["status"] == "SUCCEEDED"]
    exp = pa.table(
        {
            "doc_id": pa.array([g["doc_id"] for g in ok], pa.string()),
            "spans": pa.array(
                [
                    [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in g["spans"]]
                    for g in ok
                ],
                pa.list_(OUT_SPAN_T),
            ),
            "text": pa.array([g["text"] for g in ok], pa.string()),
        }
    )
    pq.write_table(exp, os.path.join(out_dir, "expected_spans.parquet"))

    state = pa.table(
        {
            "doc_id": pa.array([g["doc_id"] for g in golden], pa.string()),
            "status": pa.array([g["status"] for g in golden], pa.string()),
            "error": pa.array([g["error"] for g in golden], pa.string()),
            "used_ocr": pa.array([g["used_ocr"] for g in golden], pa.bool_()),
        }
    )
    pq.write_table(state, os.path.join(out_dir, "expected_state.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default="fixtures/sf-small")
    args = ap.parse_args()
    docs = generate(args.docs, args.seed)
    write_corpus(docs, args.out)
    n_spans = sum(len(d["spans"]) for d in docs)
    print(f"wrote {len(docs)} docs / {n_spans} spans -> {args.out}")


if __name__ == "__main__":
    main()
