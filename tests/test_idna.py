"""Punycode decoder (operators/idna.py): RFC 3492 §7.1 official
vectors, stdlib-codec parity, overflow/digit gates, ACE envelope."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.idna import (
    PunycodeError,
    ace_to_unicode,
    decode_punycode,
    encode_punycode,
    unicode_to_ace,
)

# RFC 3492 §7.1 sample strings (encoded -> code points)
_RFC_VECTORS = {
    # (A) Arabic (Egyptian)
    "egbpdaj6bu4bxfgehfvwxn": [
        0x0644, 0x064A, 0x0647, 0x0645, 0x0627, 0x0628, 0x062A, 0x0643,
        0x0644, 0x0645, 0x0648, 0x0634, 0x0639, 0x0631, 0x0628, 0x064A,
        0x061F,
    ],
    # (B) Chinese (simplified)
    "ihqwcrb4cv8a8dqg056pqjye": [
        0x4ED6, 0x4EEC, 0x4E3A, 0x4EC0, 0x4E48, 0x4E0D, 0x8BF4, 0x4E2D,
        0x6587,
    ],
    # (I) Japanese with basic code points and mixed case
    "Hello-Another-Way--fc4qua05auwb3674vfr0b": list(
        map(ord, "Hello-Another-Way-")
    ) + [0x305D, 0x308C, 0x305E, 0x308C, 0x306E, 0x5834, 0x6240],
    # (P) Katakana + ASCII interleaved
    "de-jg4avhby1noc0d": [
        0x30D1, 0x30D5, 0x30A3, 0x30FC, 0x0064, 0x0065, 0x30EB, 0x30F3,
        0x30D0,
    ],
    # (S) -> $1.00 <-  (pure basic, trailing delimiter form)
    "-> $1.00 <--": list(map(ord, "-> $1.00 <-")),
}


@pytest.mark.parametrize("enc,points", list(_RFC_VECTORS.items()))
def test_rfc_3492_vectors(enc, points):
    expected = "".join(chr(c) for c in points)
    assert decode_punycode(enc) == expected
    # our decoder also agrees with what the stdlib encodes
    assert decode_punycode(encode_punycode(expected)) == expected


def test_digit_case_insensitive():
    lower = "egbpdaj6bu4bxfgehfvwxn"
    assert decode_punycode(lower.upper()) == decode_punycode(lower)


@settings(max_examples=300, deadline=None)
@given(st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFFF),
    max_size=40,
))
def test_stdlib_parity(s):
    enc = encode_punycode(s)
    assert decode_punycode(enc) == s
    assert enc.encode("ascii").decode("punycode") == s


def test_error_gates():
    with pytest.raises(PunycodeError, match="bad punycode digit"):
        decode_punycode("x-!!")
    with pytest.raises(PunycodeError, match="truncated punycode"):
        decode_punycode("x-z")
    with pytest.raises(PunycodeError, match="punycode overflow"):
        decode_punycode("a-999999999999")
    with pytest.raises(PunycodeError, match="non-basic code point"):
        decode_punycode("ü-abc")


def test_ace_envelope():
    assert unicode_to_ace("bücher") == "xn--bcher-kva"
    assert ace_to_unicode("xn--bcher-kva") == "bücher"
    assert unicode_to_ace("plain") == "plain"
    assert ace_to_unicode("plain") == "plain"
    assert ace_to_unicode("XN--BCHER-KVA".lower()) == "bücher"
