"""git index walker (operators/git_index.py): the 8-byte padding
rule, 12-bit path length, sort order, sha1 gate, fuzz."""

import random
import struct

from cies_ocr_java_spark.operators.git_index import (
    build_index,
    parse_index,
)


def _mk(i, **kw):
    ne = 2 + i % 4
    entries = []
    for k in range(ne):
        mode = 0o100755 if (i + k) % 5 == 0 else 0o100644
        size = 100 + (i + k) % 900
        oid = bytes((i * 19 + k * 3 + j) % 256 for j in range(20))
        entries.append((f"src/f{k:02d}_{i % 7}.py", mode, size, oid))
    return build_index(entries, **kw), entries


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 7, 12]:
        b, entries = _mk(i)
        r = parse_index(b)
        assert r["error"] is None
        assert r["n_entries"] == len(entries)
        assert r["paths"] == ",".join(e[0] for e in entries)
        assert r["total_size"] == sum(e[2] for e in entries)
        assert r["checksum_ok"] == 1


def test_padding_rule_at_least_one_nul():
    """A path whose entry lands exactly on a multiple of 8 still gets
    EIGHT pad NULs — the at-least-one rule."""
    # 62 + len(path) == 64 needs len 2; 62+2=64 -> pad 8 -> entry 72
    oid = bytes(20)
    b = build_index([("ab", 0o100644, 5, oid)])
    r = parse_index(b)
    assert r["error"] is None and r["paths"] == "ab"
    assert len(b) == 12 + 72 + 20


def test_sort_order_enforced():
    oid = bytes(20)
    b = build_index([("b.txt", 0o100644, 1, oid),
                     ("a.txt", 0o100644, 1, oid)])
    assert parse_index(b)["error"] == "entries not sorted by path"


def test_checksum_and_magic_gates():
    assert parse_index(_mk(3, bad_checksum=True)[0])["error"] \
        == "index checksum mismatch"
    assert parse_index(_mk(3, bad_magic=True)[0])["error"] \
        == "bad index magic"
    b, _ = _mk(3)
    bad = bytearray(b)
    struct.pack_into(">I", bad, 4, 3)
    assert "unsupported index version" in parse_index(bytes(bad))[
        "error"]
    assert parse_index(None)["error"] == "bad index magic"


def test_fuzz_never_raises():
    rng = random.Random(137)
    for seed in (5, 8):
        base, _ = _mk(seed)
        for _ in range(500):
            x = bytearray(base)
            for _ in range(rng.randrange(1, 5)):
                x[rng.randrange(len(x))] = rng.randrange(256)
            blob = (bytes(x[:rng.randrange(len(x) + 1)])
                    if rng.random() < 0.3 else bytes(x))
            assert "error" in parse_index(blob)
