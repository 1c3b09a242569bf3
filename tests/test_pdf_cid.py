"""Composite-font ToUnicode decode (operators/pdf_cid.py): round-trip
identity through real subset code assignment + CMap, the Tf-switch path,
the per-glyph vs per-document degradation split, and the fuzz contract
(malformed bytes -> error row, never an exception)."""

from __future__ import annotations

import random
import re
import zlib

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.pdf_cid import (
    _parse_cmap,
    _subset_codes,
    _tounicode_cmap,
    build_pdf_cid,
    parse_pdf_cid,
)

TEXTS = [
    "hello world",
    "abcdefghijklmnop",                # one long bfrange
    "Cid 7 abcdefghij end é→\U0001d11e",
    "repeats aaa bbb aaa",             # re-used codes
    "parens (x) and \\slash",          # literal-show escaping
    "zyxwvu",                          # descending cps: bfchars only
    "ÿĀā",              # dst low-byte 0x100 boundary
]


@pytest.mark.parametrize("text", TEXTS)
@pytest.mark.parametrize("two_fonts", [False, True])
def test_round_trip(text: str, two_fonts: bool):
    r = parse_pdf_cid(build_pdf_cid(text, two_fonts=two_fonts))
    assert r["error"] is None
    assert r["text"] == text
    assert r["n_codes"] == len(text)
    assert r["n_unmapped"] == 0
    assert r["n_fonts"] == (2 if two_fonts else 1)


def test_codes_are_subset_order_not_codepoints():
    # 'b' appears first -> code 1; extraction must go THROUGH the CMap,
    # not assume identity between codes and codepoints
    codes = _subset_codes(list("bca"), 1)
    assert codes == {"b": 1, "c": 2, "a": 3}
    r = parse_pdf_cid(build_pdf_cid("bca"))
    assert r["text"] == "bca"


def test_bfrange_compression_and_last_byte_rule():
    # contiguous run -> one bfrange; a run crossing the destination
    # low-byte 0xFF boundary must BREAK (spec: only the last byte of the
    # range destination increments)
    codes = _subset_codes(list("abcdef"), 1)
    cmap = _tounicode_cmap(codes)
    assert cmap.count(b"beginbfrange") == 1
    assert b"<0001> <0006> <0061>" in cmap
    boundary = _subset_codes([chr(0xFE), chr(0xFF), chr(0x100)], 1)
    m = _parse_cmap(_tounicode_cmap(boundary))
    assert m[1] == "þ" and m[2] == "ÿ" and m[3] == "Ā"
    assert b"<0001> <0003>" not in _tounicode_cmap(boundary)


def test_unmapped_code_is_per_glyph_degradation():
    r = parse_pdf_cid(build_pdf_cid("abc ~", poison="unmapped_tail"))
    assert r["error"] is None
    assert r["text"] == "abc �"
    assert r["n_unmapped"] == 1
    assert r["n_codes"] == 5


@pytest.mark.parametrize(
    "poison,err",
    [
        ("dangling_tounicode", "object 9 not in xref"),
        ("bad_bfrange", "bad bfrange"),
        ("odd_hex", "odd-length CID string"),
    ],
)
def test_structural_poison_fails_document(poison: str, err: str):
    r = parse_pdf_cid(build_pdf_cid("abcdefgh", poison=poison))
    assert r["text"] is None
    assert r["error"] == err


def test_cmap_canonical_gates():
    ok = build_pdf_cid("azbq")
    # corrupt the FlateDecoded CMap stream in place: declared bfchar
    # count vs entries must be enforced
    raw = _tounicode_cmap(_subset_codes(list("azbq"), 1))
    assert b"beginbfchar" in raw
    with pytest.raises(Exception):
        _parse_cmap(re.sub(rb"(\d+) beginbfchar", b"9 beginbfchar", raw))
    with pytest.raises(Exception):
        _parse_cmap(raw.replace(b"begincodespacerange", b"beginxx"))
    assert parse_pdf_cid(ok)["error"] is None


def test_non_bmp_destination_is_two_code_units():
    text = "g\U0001d11eh"
    cmap = _tounicode_cmap(_subset_codes(list(text), 1))
    assert b"<D834DD1E>" in cmap
    r = parse_pdf_cid(build_pdf_cid(text))
    assert r["text"] == text and r["n_codes"] == 3


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=400), st.integers(0, 2 ** 32 - 1))
def test_fuzz_never_raises(blob: bytes, seed: int):
    base = build_pdf_cid("fuzz target abcdef", two_fonts=True)
    rng = random.Random(seed)
    mode = rng.randrange(3)
    if mode == 0:
        data = blob
    elif mode == 1:
        at = rng.randrange(len(base))
        data = base[:at] + blob + base[at + len(blob):]
    else:
        data = base[: rng.randrange(len(base))]
    r = parse_pdf_cid(data)
    assert (r["error"] is None) != (r["text"] is None)


def test_flate_cmap_poison_fails_cleanly():
    pdf = build_pdf_cid("abcdef")
    # find the compressed CMap stream and corrupt a zlib byte
    cmap = zlib.compress(_tounicode_cmap(_subset_codes(list("abcdef"), 1)))
    at = pdf.index(cmap)
    bad = pdf[:at + 2] + bytes([pdf[at + 2] ^ 0xFF]) + pdf[at + 3:]
    r = parse_pdf_cid(bad)
    assert r["error"] is not None and r["text"] is None
