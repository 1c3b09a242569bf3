"""MessagePack codec (operators/msgpack_real.py): shortest-form
round-trip, marker spectrum edges, exact-consumption discipline,
cross-codec transcode to deterministic CBOR, fuzz."""

import random

import pytest

from cies_ocr_java_spark.operators.cbor_real import encode_cbor
from cies_ocr_java_spark.operators.msgpack_real import (
    decode_msgpack,
    encode_msgpack,
    parse_msgpack_doc,
)


def _doc(i):
    return {
        "id": i * 7919 + (2**33 if i % 4 == 0 else 0),
        "name": f"doc-{i}" + ("π" if i % 6 == 0 else ""),
        "tags": [f"t{i % 5 + k}" for k in range(1 + i % 4)],
        "ratio": i + 0.5,
        "blob": bytes((3 * j) & 0xFF for j in range(5 + i % 9)),
        "ok": i % 2 == 0,
        "neg": -(i % 100) - 1,
        "note": None if i % 3 == 0 else f"n{i % 11}",
    }


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 4, 5, 7, 12, 100]:
        d = _doc(i)
        assert decode_msgpack(encode_msgpack(d)) == d


def test_marker_boundaries():
    """The width ladders switch exactly at their limits."""
    for v, size in [(0x7F, 1), (0x80, 2), (0xFF, 2), (0x100, 3),
                    (0xFFFF, 3), (0x10000, 5), (2**32 - 1, 5),
                    (2**32, 9), (-32, 1), (-33, 2), (-129, 3),
                    (-(2**31), 5), (-(2**31) - 1, 9)]:
        enc = encode_msgpack(v)
        assert len(enc) == size, (v, enc.hex())
        assert decode_msgpack(enc) == v
    assert len(encode_msgpack("x" * 31)) == 32   # fixstr
    assert len(encode_msgpack("x" * 32)) == 34   # str8
    assert len(encode_msgpack(list(range(15)))) == 16   # fixarray
    assert len(encode_msgpack(list(range(16)))) == 19   # array16


def test_exact_consumption_discipline():
    b = encode_msgpack(_doc(5))
    with pytest.raises(ValueError, match="trailing bytes"):
        decode_msgpack(b + b"\x00")
    with pytest.raises(ValueError, match="unexpected end"):
        decode_msgpack(b[:-3])
    assert parse_msgpack_doc(b + b"\x00")["error"] \
        == "trailing bytes after value"
    assert parse_msgpack_doc(b"")["error"] == "short or missing payload"
    assert parse_msgpack_doc(encode_msgpack([1, 2]))["error"] \
        == "top-level value is not a map"


def test_depth_cap():
    v = 1
    for _ in range(40):
        v = [v]
    with pytest.raises(ValueError, match="nesting too deep"):
        decode_msgpack(encode_msgpack(v))


def test_transcode_to_deterministic_cbor():
    """msgpack -> values -> RFC 8949 CBOR equals the direct CBOR
    encoding of the same structure: the two first-principles codecs
    agree on the value model."""
    for i in [0, 3, 7, 11]:
        d = _doc(i)
        via = encode_cbor(decode_msgpack(encode_msgpack(d)))
        assert via == encode_cbor(d)


def test_random_structure_round_trip():
    rng = random.Random(4)

    def gen(depth):
        r = rng.randrange(8 if depth < 3 else 6)
        if r == 0:
            return rng.randrange(-2**40, 2**40)
        if r == 1:
            return "".join(chr(rng.randrange(32, 0x2FF))
                           for _ in range(rng.randrange(40)))
        if r == 2:
            return bytes(rng.randrange(256)
                         for _ in range(rng.randrange(20)))
        if r == 3:
            return rng.choice([None, True, False])
        if r == 4:
            return rng.randrange(-10**6, 10**6) + 0.5
        if r == 5:
            return rng.randrange(256)
        if r == 6:
            return [gen(depth + 1) for _ in range(rng.randrange(5))]
        return {f"k{j}": gen(depth + 1)
                for j in range(rng.randrange(5))}

    for _ in range(300):
        v = gen(0)
        assert decode_msgpack(encode_msgpack(v)) == v


def test_fuzz_never_raises():
    rng = random.Random(17)
    b = encode_msgpack(_doc(6))
    for _ in range(600):
        x = bytearray(b)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        m = parse_msgpack_doc(bytes(x[:rng.randrange(len(x) + 1)]))
        assert "error" in m
