"""CPython marshal walker (operators/pymarshal_real.py): ref-table
slot order, identity-driven sharing, PyLong digits, stdlib interop
(the fixture encoder IS marshal.dumps), gates, fuzz."""

import marshal
import random

from cies_ocr_java_spark.operators.pymarshal_real import (
    parse_marshal,
)


def test_census_against_stdlib_dumps():
    t = ("s1", 503)
    obj = {
        "id": 1011,
        "vals": [100000, 100013],
        "name": "doc-11",
        "shared": [t, t],
    }
    r = parse_marshal(marshal.dumps(obj))
    assert r["error"] is None
    assert r["n_containers"] == 4  # dict, vals, shared, t
    assert r["n_ints"] == 4 and r["int_sum"] == 1011 + 200013 + 503
    assert r["n_refs"] == 1  # second occurrence of t
    assert r["max_depth"] == 4


def test_small_int_cache_creates_refs():
    # 7 is the SAME cached object both times -> def + ref; big ints
    # constructed at RUNTIME are two objects -> two defs (a literal
    # 100000 twice would be constant-folded to one shared object!)
    a = parse_marshal(marshal.dumps([7, 7]))
    b = parse_marshal(marshal.dumps(
        [int(str(100000)), int(str(100000))]))
    assert a["n_refs"] == 1 and a["n_ints"] == 1
    assert b["n_refs"] == 0 and b["n_ints"] == 2
    assert a["int_sum"] == 7 and b["int_sum"] == 200000


def test_pylong_digits_and_negative():
    v = -(1 << 50) - 7
    r = parse_marshal(marshal.dumps(v))
    assert r["error"] is None and r["int_sum"] == v


def test_ref_table_slot_reserved_before_children():
    # self-referential list: the child ref resolves to the RESERVED
    # parent slot — only correct if slots are claimed at encounter
    x: list = []
    x.append(x)
    r = parse_marshal(marshal.dumps(x))
    assert r["error"] is None
    assert r["n_refs"] == 1 and r["n_containers"] == 1


def test_sets_and_floats_and_bytes():
    r = parse_marshal(marshal.dumps(
        {frozenset((100000, 200000)), 0.5, b"abc"}))
    assert r["error"] is None
    assert r["n_containers"] == 2
    assert r["int_sum"] == 300000


def test_gates():
    assert parse_marshal(b"\xff\x00")["error"] == "unknown type code"
    assert parse_marshal(b"r\xe7\x03\x00\x00")["error"] \
        == "ref index out of range"
    good = marshal.dumps({"k": [1000, 2000]})
    assert parse_marshal(good + b"N")["error"] \
        == "trailing bytes after value"
    assert parse_marshal(good[:-2])["error"] == "truncated value"
    assert parse_marshal(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0x99C)
    base = marshal.dumps({
        "id": 1011, "vals": [100000, 100013, 100026],
        "name": "doc-11", "blob": b"\x01\x02\x03",
        "big": (1 << 40) + 11,
    })
    for _ in range(500):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_marshal(blob)
