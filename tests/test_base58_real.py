"""Base58Check codec (operators/base58_real.py): base-conversion
round trip, leading-zero rule, checksum/alphabet gates, fuzz."""

import random

import pytest

from cies_ocr_java_spark.operators.base58_real import (
    ALPHABET,
    b58check_decode,
    b58check_encode,
    parse_b58_doc,
)


def test_round_trip_identity():
    rng = random.Random(42)
    for _ in range(100):
        p = bytes(rng.randrange(256)
                  for _ in range(rng.randrange(1, 40)))
        assert b58check_decode(b58check_encode(p)) == p


def test_leading_zero_rule():
    """Each leading 0x00 byte rides as a literal '1' outside the big
    number — the round trip must preserve the COUNT."""
    for nz in (0, 1, 2, 5):
        p = b"\x00" * nz + b"\x07payload"
        s = b58check_encode(p)
        assert s.startswith("1" * nz)
        assert not s.startswith("1" * (nz + 1))
        assert b58check_decode(s) == p


def test_known_vector():
    """The canonical Bitcoin genesis-era address vector: version 0 +
    hash160 of all zeros."""
    s = b58check_encode(b"\x00" + b"\x00" * 20)
    assert s == "1111111111111111111114oLvT2"
    assert b58check_decode(s) == b"\x00" * 21


def test_gates():
    s = b58check_encode(b"\x05" + bytes(range(1, 21)))
    idx = ALPHABET.index(s[-1])
    bad = s[:-1] + ALPHABET[(idx + 1) % 58]
    assert parse_b58_doc(bad.encode())["error"] == "checksum mismatch"
    bad2 = s[:3] + "O" + s[4:]
    assert parse_b58_doc(bad2.encode())["error"] \
        == "invalid base58 character at 3"
    assert parse_b58_doc(b"")["error"] == "empty base58 string"
    with pytest.raises(ValueError, match="too short"):
        b58check_decode("11")


def test_fuzz_never_raises():
    rng = random.Random(97)
    s = b58check_encode(b"\x05" + bytes(range(1, 21))).encode()
    for _ in range(400):
        x = bytearray(s)
        for _ in range(rng.randrange(1, 4)):
            x[rng.randrange(len(x))] = rng.randrange(33, 127)
        assert "error" in parse_b58_doc(
            bytes(x[:rng.randrange(len(x) + 1)]))
