"""EPUB/OCF extraction (operators/epub_real.py): spine-vs-zip-order
hazard, OCF mimetype constraints, zipfile interop, degradation + fuzz."""

import io
import random
import zipfile

import pytest

from cies_ocr_java_spark.operators.archive import build_zip
from cies_ocr_java_spark.operators.epub_real import (
    EPUB_MIMETYPE,
    build_epub,
    parse_epub,
)

CHS = [(f"Chapter {k}", f"Body {k}") for k in range(4)]


def test_spine_order_beats_zip_order():
    spine = [2, 0, 3, 1]
    rows = parse_epub(build_epub(CHS, spine))
    assert [r["title"] for r in rows] == [f"Chapter {c}" for c in spine]
    assert [r["text"] for r in rows] == [f"Body {c}" for c in spine]
    assert [r["spine_idx"] for r in rows] == [0, 1, 2, 3]
    assert [r["href"] for r in rows] == [f"chap{c}.xhtml" for c in spine]


def test_ocf_mimetype_constraints():
    b = build_epub(CHS, [0, 1, 2, 3])
    z = zipfile.ZipFile(io.BytesIO(b))
    info = z.infolist()[0]
    assert info.filename == "mimetype"
    assert info.compress_type == zipfile.ZIP_STORED
    # bytes 30..58 carry name+payload uncompressed — the sniff readers use
    assert b[30:38] == b"mimetype"
    assert b[38:58] == EPUB_MIMETYPE.encode()[:20]


def test_bad_mimetype_rows():
    deflated = build_zip([("mimetype", EPUB_MIMETYPE, 8)])
    assert parse_epub(deflated)[0]["error"] == "bad epub mimetype member"
    misplaced = build_zip([("a", "x", 0), ("mimetype", EPUB_MIMETYPE, 0)])
    assert parse_epub(misplaced)[0]["error"] == "bad epub mimetype member"
    # flipped byte inside the stored payload fails the member CRC
    b = build_epub(CHS, [0, 1, 2, 3])
    pb = b[:38] + b"x" + b[39:]
    assert parse_epub(pb)[0]["error"] == "crc mismatch"


def test_package_degradation():
    b = build_epub(CHS, [0, 1, 2, 3])
    assert parse_epub(b[:-5])[0]["error"] == (
        "truncated end-of-central-directory"
    )
    assert parse_epub(None)[0]["error"] == "short or missing payload"
    # spine idref pointing at a manifest id that does not exist
    broken = build_zip([
        ("mimetype", EPUB_MIMETYPE, 0),
        ("META-INF/container.xml",
         '<rootfile full-path="content.opf"/>', 8),
        ("content.opf",
         '<manifest><item id="a" href="a.xhtml" media-type="t"/>'
         '</manifest><spine><itemref idref="zz"/></spine>', 8),
    ])
    assert parse_epub(broken)[0]["error"] == "spine idref 'zz' not in manifest"


def test_build_rejects_non_permutation():
    with pytest.raises(ValueError):
        build_epub(CHS, [0, 1, 2, 2])


def test_fuzz_never_raises():
    b = build_epub(CHS, [3, 1, 0, 2])
    for cut in range(0, len(b), 17):
        parse_epub(b[:cut])
    rnd = random.Random(13)
    for _ in range(300):
        bb = bytearray(b)
        for _ in range(rnd.randrange(1, 6)):
            bb[rnd.randrange(len(bb))] = rnd.randrange(256)
        parse_epub(bytes(bb))


def test_interleaved_spans_spine_major():
    from cies_ocr_java_spark.operators.epub_real import (
        build_epub_interleaved,
        parse_epub_spans,
    )

    ich = [
        ("C0", [("text", "intro 0"), ("media", "img0.png"),
                ("text", "outro 0")]),
        ("C1", [("media", "img1.png"), ("text", "body 1")]),
    ]
    spans = parse_epub_spans(build_epub_interleaved(ich, [1, 0]))
    got = [(r["kind"], r["media_ref"] or r["text"]) for r in spans]
    assert got == [("media", "img1.png"), ("text", "body 1"),
                   ("text", "intro 0"), ("media", "img0.png"),
                   ("text", "outro 0")]
    assert [r["span_order"] for r in spans] == [0, 1, 2, 3, 4]
    bad = parse_epub_spans(b"\x00" * 40)
    assert bad[0]["error"] is not None and bad[0]["span_order"] is None


def test_media_spans_decode_from_archive_members():
    from cies_ocr_java_spark.operators.epub_real import (
        build_epub_interleaved,
        parse_epub_media_spans,
    )
    from cies_ocr_java_spark.operators.multimodal import build_png

    png = build_png(5, 3, 40)
    ich = [
        ("C0", [("text", "intro 0"), ("media", "im0.png"),
                ("text", "outro 0")]),
        ("C1", [("media", "gone.png"), ("text", "body 1")]),
    ]
    rows = parse_epub_media_spans(
        build_epub_interleaved(ich, [1, 0], [("im0.png", png)])
    )
    # spine puts C1 first: its dangling media degrades per-SPAN only
    assert rows[0]["error"] == "missing member 'gone.png'"
    assert rows[1]["text"] == "body 1" and rows[1]["error"] is None
    assert rows[3]["ink_sum"] == 5 * 3 * 40
    assert rows[3]["width"] == 5 and rows[3]["height"] == 3
    # container-level failure still collapses to one error row
    bad = parse_epub_media_spans(b"\x00" * 40)
    assert len(bad) == 1 and bad[0]["error"] is not None
