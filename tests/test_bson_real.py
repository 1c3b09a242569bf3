"""BSON codec (operators/bson_real.py): triple-framing agreement,
arrays-are-documents key verification, type spectrum, fuzz."""

import random
import struct

import pytest

from cies_ocr_java_spark.operators.bson_real import (
    decode_bson,
    encode_bson,
    parse_bson_doc,
)


def _doc(i):
    return {
        "id": i * 7919 + (2**33 if i % 4 == 0 else 0),
        "name": f"doc-{i}" + ("π" if i % 6 == 0 else ""),
        "tags": [f"t{i % 5 + k}" for k in range(1 + i % 4)],
        "ratio": i + 0.5,
        "oid": bytes((i * 13 + j) % 256 for j in range(12)),
        "blob": bytes((3 * j) & 0xFF for j in range(5 + i % 9)),
        "active": i % 2 == 0,
        "note": None if i % 3 == 0 else f"n{i % 11}",
        "meta": {"city": f"c{i % 17}", "zip": i % 1000},
    }


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 4, 7, 12]:
        d = _doc(i)
        assert decode_bson(encode_bson(d)) == d


def test_array_keys_are_verified_not_trusted():
    b = encode_bson(_doc(5), array_key_shuffle=True)
    with pytest.raises(ValueError, match="array keys not sequential"):
        decode_bson(b)
    # single-element arrays cannot be shuffled — the poison is a no-op
    b1 = encode_bson(_doc(0), array_key_shuffle=True)
    assert decode_bson(b1) == _doc(0)


def test_triple_framing_agreement():
    b = encode_bson(_doc(3))
    assert parse_bson_doc(b[:-4])["error"] == "document size mismatch"
    bad = bytearray(b)
    bad[-1] = 1
    assert parse_bson_doc(bytes(bad))["error"] \
        == "missing document terminator"
    # size says more than the bytes present
    bad = bytearray(b)
    struct.pack_into("<i", bad, 0, len(b) + 8)
    assert parse_bson_doc(bytes(bad))["error"] \
        == "document size mismatch"


def test_string_length_includes_nul():
    b = encode_bson({"s": "ab"})
    # the string element: type 02, 's\0', int32=3, 'ab\0'
    at = b.index(b"\x02s\x00") + 3
    assert struct.unpack_from("<i", b, at)[0] == 3
    bad = bytearray(b)
    bad[at + 4 + 2] = 0x41  # overwrite the string's NUL
    assert parse_bson_doc(bytes(bad))["error"] \
        == "string missing terminator"


def test_int_width_selection():
    small = encode_bson({"v": 7})
    big = encode_bson({"v": 2**40})
    assert small[4] == 0x10 and big[4] == 0x12
    assert decode_bson(small)["v"] == 7
    assert decode_bson(big)["v"] == 2**40


def test_fuzz_never_raises():
    rng = random.Random(71)
    b = encode_bson(_doc(6))
    for _ in range(600):
        x = bytearray(b)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_bson_doc(blob)
