"""Bencode + torrent metainfo (operators/bencode_real.py): canonical
gates, span-captured infohash, property round trips, fuzz."""

from __future__ import annotations

import hashlib
import random

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.bencode_real import (
    bdecode,
    bencode,
    parse_torrent,
)

INFO = {"length": 999, "name": "n.bin", "piece length": 64,
        "pieces": "x" * 40}
META = {"announce": "udp://t.example", "info": INFO}


def test_round_trip_and_key_order():
    v, spans, err = bdecode(bencode(META))
    assert err is None
    assert list(v.keys()) == [b"announce", b"info"]  # byte-sorted
    assert v[b"info"][b"piece length"] == 64


def test_infohash_is_over_the_raw_info_span():
    t = bencode(META)
    r = parse_torrent(t)
    assert r["error"] is None
    assert r["infohash"] == hashlib.sha256(bencode(INFO)).hexdigest()
    assert r["n_pieces"] == 2


@pytest.mark.parametrize(
    "blob,err",
    [
        (b"i03e", "non-canonical integer"),
        (b"i-0e", "non-canonical integer"),
        (b"ie", "malformed integer"),
        (b"i--1e", "malformed integer"),
        (b"03:abc", "non-canonical string length"),
        (b"d1:b0:1:a0:e", "unsorted dict keys"),
        (b"d1:a0:1:a0:e", "duplicate dict key"),
        (b"di1e0:e", "dict key is not a string"),
        (b"i1ei2e", "trailing bytes"),
        (b"l1:a", "truncated bencode"),
        (b"5:abc", "truncated bencode"),
        (b"x", "unexpected byte 0x78"),
    ],
)
def test_canonical_gates(blob: bytes, err: str):
    assert bdecode(blob)[2] == err


def test_depth_cap():
    from cies_ocr_java_spark.operators.bencode_real import MAX_DEPTH

    deep = b"l" * (MAX_DEPTH + 2) + b"e" * (MAX_DEPTH + 2)
    assert bdecode(deep)[2] == "nesting too deep"


def test_negative_ints_round_trip():
    v, _, err = bdecode(bencode([-1, 0, -999]))
    assert err is None and v == [-1, 0, -999]


@settings(max_examples=60, deadline=None)
@given(st.recursive(
    st.one_of(st.integers(-(10 ** 12), 10 ** 12), st.binary(max_size=12)),
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.binary(max_size=6), inner, max_size=4)),
    max_leaves=10,
))
def test_property_round_trip(v):
    got, _, err = bdecode(bencode(v))
    assert err is None and got == v


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=200), st.integers(0, 2 ** 32 - 1))
def test_fuzz_never_raises(blob: bytes, seed: int):
    base = bencode(META)
    rng = random.Random(seed)
    mode = rng.randrange(3)
    if mode == 0:
        data = blob
    elif mode == 1:
        at = rng.randrange(len(base))
        data = base[:at] + blob + base[at + len(blob):]
    else:
        data = base[: rng.randrange(len(base))]
    r = parse_torrent(data)
    assert (r["error"] is None) != (r["infohash"] is None)
