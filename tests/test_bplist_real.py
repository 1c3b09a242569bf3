"""Binary plist walker (operators/bplist_real.py): ref-graph
round-trip, cycle detection, trailer gates, marker widths, fuzz."""

import random
import struct

import pytest

from cies_ocr_java_spark.operators.bplist_real import (
    build_bplist,
    parse_bplist,
    parse_bplist_doc,
)


def _doc(i):
    return {
        "id": i * 524287 + (2**34 if i % 4 == 0 else 0),
        "name": f"app-{i}",
        "uname": f"ü{i % 9}·{i % 7}",
        "vals": [((i + k) * (i + k)) % 1000 for k in range(1 + i % 5)],
        "flag": i % 2 == 0,
        "payload": bytes((5 * j) & 0xFF for j in range(300 + i % 50)),
    }


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 4, 7, 12, 33]:
        d = _doc(i)
        v, n_obj, off_size, ref_size = parse_bplist(build_bplist(d))
        assert v == d
        assert n_obj == 14 + i % 5
        assert off_size == 2 and ref_size == 1


def test_value_spectrum():
    cases = [None, True, False, 0, 14, 15, 255, 256, 65535, 65536,
             -7, 2**40, 1.5, "plain", "über-ünïcode", b"\x00\x01",
             [1, [2, [3]]], {"a": {"b": [1, None]}}]
    for c in cases:
        v, *_ = parse_bplist(build_bplist(c))
        assert v == c, c
    # 15-element array exercises the inline-count escape (0xF nibble)
    big = list(range(20))
    v, *_ = parse_bplist(build_bplist(big))
    assert v == big
    s = "x" * 300  # string count as inline int object
    v, *_ = parse_bplist(build_bplist(s))
    assert v == s


def test_cycle_detection():
    raw = bytearray(b"bplist00")
    raw += b"\xa1\x00"  # object 0: array of one ref -> itself
    toff = len(raw)
    raw += bytes([8])
    raw += struct.pack(">6xBBQQQ", 1, 1, 1, 0, toff)
    with pytest.raises(ValueError, match="reference cycle"):
        parse_bplist(bytes(raw))
    # two-node cycle: 0 -> 1 -> 0
    raw = bytearray(b"bplist00")
    raw += b"\xa1\x01"  # object 0 at 8
    raw += b"\xa1\x00"  # object 1 at 10
    toff = len(raw)
    raw += bytes([8, 10])
    raw += struct.pack(">6xBBQQQ", 1, 1, 2, 0, toff)
    with pytest.raises(ValueError, match="reference cycle"):
        parse_bplist(bytes(raw))


def test_shared_substructure_is_not_a_cycle():
    """The visited guard is per-PATH: one object referenced twice from
    siblings is legal (a DAG), only a back-edge is a cycle."""
    raw = bytearray(b"bplist00")
    raw += b"\xa2\x01\x01"  # object 0: array [obj1, obj1]
    raw += b"\x10\x2a"      # object 1: int 42
    toff = len(raw)
    raw += bytes([8, 11])
    raw += struct.pack(">6xBBQQQ", 1, 1, 2, 0, toff)
    v, *_ = parse_bplist(bytes(raw))
    assert v == [42, 42]


def test_trailer_gates():
    d = _doc(3)
    assert parse_bplist_doc(build_bplist(d, bad_top=True))["error"] \
        == "top object out of range"
    assert parse_bplist_doc(
        build_bplist(d, bad_offset_table=True))["error"] \
        == "offset table out of bounds"
    assert parse_bplist_doc(None)["error"] == "not a bplist00"
    assert parse_bplist_doc(b"bplist01" + bytes(40))["error"] \
        == "not a bplist00"


def test_fuzz_never_raises():
    rng = random.Random(31)
    for seed in (6, 9):
        base = build_bplist(_doc(seed))
        for _ in range(700):
            x = bytearray(base)
            for _ in range(rng.randrange(1, 6)):
                x[rng.randrange(len(x))] = rng.randrange(256)
            blob = (bytes(x[:rng.randrange(len(x) + 1)])
                    if rng.random() < 0.3 else bytes(x))
            assert "error" in parse_bplist_doc(blob)
