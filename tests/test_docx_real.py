"""OOXML DOCX extraction (operators/docx_real.py): zipfile interop both
directions, run-fragmentation identity, entity decode, degradation +
fuzz."""

import io
import random
import zipfile

import pytest

from cies_ocr_java_spark.operators.archive import build_zip
from cies_ocr_java_spark.operators.docx_real import (
    build_docx,
    parse_docx,
)


def test_round_trip_identity_and_fragmentation():
    paras = [
        ("Paragraph 0 of doc 7", 2),
        ("Q&A section <1> of doc 7", 3),
        ("short", 1),
        ("x" * 50, 3),
    ]
    rows = parse_docx(build_docx(paras))
    assert [r["text"] for r in rows] == [p[0] for p in paras]
    assert [r["n_runs"] for r in rows] == [2, 3, 1, 3]
    assert [r["para_idx"] for r in rows] == [0, 1, 2, 3]
    assert all(r["error"] is None for r in rows)


def test_stdlib_zipfile_opens_output():
    b = build_docx([("hello world", 2)])
    z = zipfile.ZipFile(io.BytesIO(b))
    assert "word/document.xml" in z.namelist()
    doc = z.read("word/document.xml").decode()
    assert "<w:body>" in doc and 'xml:space="preserve"' in doc
    assert z.testzip() is None  # CRCs verify


def test_stdlib_zipfile_written_docx_parses():
    """The reader must accept containers WE did not write."""
    doc = (
        '<?xml version="1.0"?><w:document xmlns:w="x"><w:body>'
        "<w:p><w:r><w:t>via </w:t></w:r><w:r><w:t>zipfile</w:t></w:r>"
        "</w:p></w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("word/document.xml", doc)
    rows = parse_docx(buf.getvalue())
    assert rows[0]["text"] == "via zipfile"
    assert rows[0]["n_runs"] == 2


def test_no_separator_concat():
    """A separator between runs would corrupt words mid-split."""
    rows = parse_docx(build_docx([("unbroken", 4)]))
    assert rows[0]["text"] == "unbroken"


def test_entity_decode_order():
    # '&amp;lt;' in XML means the literal string '&lt;'
    b = build_docx([("&lt; literal", 1)])
    assert parse_docx(b)[0]["text"] == "&lt; literal"


def test_degradation_rows():
    b = build_docx([("x", 1)])
    assert parse_docx(b[:-5])[0]["error"] == (
        "truncated end-of-central-directory"
    )
    assert parse_docx(None)[0]["error"] == "short or missing payload"
    assert parse_docx(build_zip([("a.txt", "hi", 0)]))[0]["error"] == (
        "missing word/document.xml"
    )
    notdoc = build_zip([("word/document.xml", "<html></html>", 8)])
    assert parse_docx(notdoc)[0]["error"] == (
        "not a wordprocessingml document"
    )


def test_build_rejects_bad_args():
    with pytest.raises(ValueError):
        build_docx([("x", 0)])


def test_fuzz_never_raises():
    b = build_docx([("Paragraph %d" % p, 1 + p % 3) for p in range(3)])
    for cut in range(0, len(b), 7):
        parse_docx(b[:cut])
    rnd = random.Random(5)
    for _ in range(400):
        bb = bytearray(b)
        for _ in range(rnd.randrange(1, 6)):
            bb[rnd.randrange(len(bb))] = rnd.randrange(256)
        parse_docx(bytes(bb))
