"""CBOR deterministic-encoding walker (operators/cbor_real.py):
round-trip identity, every §4.2 canonical gate, head-width boundaries,
float shortest-width selection, and the fuzz contract."""

from __future__ import annotations

import math
import random
import struct

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.cbor_real import (
    MAX_DEPTH,
    _head,
    cbor_walk_features,
    encode_cbor,
    parse_cbor,
)

VALUES = [
    0, 23, 24, 255, 256, 65535, 65536, (1 << 32) - 1, 1 << 32,
    (1 << 64) - 1, -1, -24, -25, -256, -(1 << 32),
    "", "hello", "naïve café 中文", b"", b"\x00\xff",
    True, False, None,
    0.0, 1.5, 1.75, -2.5, 3.141592653589793, 1e300, float("inf"),
    [], [1, [2, [3]]], {}, {"a": 1, "b": [2, "x"]}, {"": 0},
    1 << 64, (1 << 64) + 77, -(1 << 64) - 1,
]


@pytest.mark.parametrize("v", VALUES, ids=repr)
def test_round_trip(v):
    got, err = parse_cbor(encode_cbor(v))
    assert err is None
    if isinstance(v, float):
        assert got == v and isinstance(got, float)
    else:
        assert got == v and type(got) is type(v if v != 0 else got)


def test_head_width_boundaries():
    assert encode_cbor(23) == b"\x17"
    assert encode_cbor(24) == b"\x18\x18"
    assert encode_cbor(255) == b"\x18\xff"
    assert encode_cbor(256) == b"\x19\x01\x00"
    assert encode_cbor(65536) == b"\x1a\x00\x01\x00\x00"
    assert encode_cbor(1 << 32)[0] == 0x1B


def test_float_shortest_width():
    assert encode_cbor(1.5) == b"\xf9\x3e\x00"           # float16
    assert encode_cbor(1.0 + 2 ** -20)[0] == 0xFA        # float32
    assert encode_cbor(math.pi)[0] == 0xFB               # float64
    # widened forms must be rejected
    assert parse_cbor(b"\xfa" + struct.pack(">f", 1.5))[1] == (
        "non-minimal float encoding")
    assert parse_cbor(b"\xfb" + struct.pack(">d", 1.5))[1] == (
        "non-minimal float encoding")


def test_map_key_canonical_order_is_bytewise_of_encoding():
    # shorter encodings sort first: int keys before string keys
    enc = encode_cbor({"z": 1, "aa": 2, 7: 3})
    v, err = parse_cbor(enc)
    assert err is None and list(v.keys()) == [7, "z", "aa"]


@pytest.mark.parametrize(
    "blob,err",
    [
        (b"\x18\x05", "non-minimal integer encoding"),
        (b"\x19\x00\xff", "non-minimal integer encoding"),
        (b"\xa2\x61b\x01\x61a\x02", "unsorted map keys"),
        (b"\xa2\x61a\x01\x61a\x02", "duplicate map key"),
        (b"\x5f\x41a\xff", "indefinite length in canonical mode"),
        (b"\x7f", "indefinite length in canonical mode"),
        (b"\x1c", "reserved additional info"),
        (b"\x01\x02", "trailing bytes"),
        (b"\x62\xff\xff", "invalid utf-8 in text string"),
        (b"\xc2\x49\x00" + b"\x01" * 8, "non-canonical bignum"),
        (b"\xc2\x48" + b"\x01" * 8, "bignum fits integer form"),
        (b"\xc2\x01", "bignum content must be a byte string"),
        (b"\xc1\x00", "unsupported tag 1"),
        (b"\xf8\x20", "two-byte simple value"),
        (b"\xf0", "unsupported simple value 16"),
        (b"\x19\x01", "truncated cbor"),
        (b"\x64abc", "truncated cbor"),
    ],
)
def test_canonical_gates(blob: bytes, err: str):
    assert parse_cbor(blob) == (None, err)


def test_depth_cap():
    deep = [0]
    for _ in range(MAX_DEPTH + 2):
        deep = [deep]
    assert parse_cbor(encode_cbor(deep))[1] == "nesting too deep"
    ok = [0]
    for _ in range(MAX_DEPTH - 2):
        ok = [ok]
    assert parse_cbor(encode_cbor(ok))[1] is None


def test_walk_features():
    r = cbor_walk_features(encode_cbor(
        {"a": [1, 2, "x"], "b": {"c": "y", "d": 1 << 70}, "f": 0.5}
    ))
    assert r["error"] is None
    assert r["int_sum"] == 3
    assert r["text"] == "x/y"
    assert r["n_bignums"] == 1
    assert r["float_sum"] == 0.5
    assert r["max_depth"] == 2
    assert r["n_items"] == 9


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=200))
def test_fuzz_never_raises(blob: bytes):
    v, err = parse_cbor(blob)
    assert (err is None) or (v is None)


@settings(max_examples=50, deadline=None)
@given(st.recursive(
    st.one_of(st.integers(-(1 << 70), 1 << 70), st.text(max_size=8),
              st.binary(max_size=8), st.booleans(), st.none()),
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(max_size=4), inner, max_size=4)),
    max_leaves=12,
))
def test_property_round_trip(v):
    got, err = parse_cbor(encode_cbor(v))
    assert err is None and got == v
