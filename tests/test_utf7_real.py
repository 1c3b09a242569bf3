"""UTF-7 decoder (operators/utf7_real.py): stdlib-codec interop, the
aliasing and code-unit gates, literal-plus, fuzz."""

import random

import pytest

from cies_ocr_java_spark.operators.utf7_real import (
    parse_utf7_doc,
    utf7_decode,
)


def test_stdlib_codec_interop():
    cases = [
        "plain ascii only",
        "héllo wörld",
        "mixed ascii and 日本語 text",
        "plus + sign and more",
        "Ünïcode: αβγ δε ζ",
        "",
        "Re: doc 7 — résumé für h7 日本7語",
    ]
    for s in cases:
        assert utf7_decode(s.encode("utf_7")) == s


def test_surrogate_pairs_ride_utf16():
    s = "astral 😀 char"
    assert utf7_decode(s.encode("utf_7")) == s


def test_literal_plus_and_terminator():
    assert utf7_decode(b"+-") == "+"
    assert utf7_decode(b"a+-b") == "a+b"
    # '-' after a segment is absorbed; a second one is literal
    assert utf7_decode("é".encode("utf_7") + b"-") == "é-"


def test_validator_gates():
    assert parse_utf7_doc(b"+x-")["error"] == "nonzero trailing bits"
    assert parse_utf7_doc(b"+AA-")["error"] == "dangling utf-16 byte"
    assert parse_utf7_doc(b"caf\xe9")["error"] == "non-ascii byte at 3"
    assert parse_utf7_doc(b"ab+")["error"] \
        == "empty shifted segment at 3"
    with pytest.raises(ValueError, match="nonzero trailing"):
        # aliased encoding of 'é': correct is '+AOk-'; '+AOl-' sets a
        # trailing bit a lenient decoder would silently drop
        utf7_decode(b"+AOl-")


def test_fuzz_never_raises():
    rng = random.Random(73)
    base = "mixed ascii and 日本語 + end".encode("utf_7")
    for _ in range(500):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        assert "error" in parse_utf7_doc(
            bytes(x[:rng.randrange(len(x) + 1)]))
