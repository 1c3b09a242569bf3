"""git packfile walker (operators/git_pack.py): delta-chain
round-trip, offset-encoding bias, copy/insert ISA edges, prefix
inflate composition, trailer gate, fuzz."""

import hashlib
import random

import pytest

from cies_ocr_java_spark.operators.git_pack import (
    _ofs_encode,
    apply_delta,
    build_delta,
    build_pack,
    delta_copy,
    delta_insert,
    object_id,
    parse_pack,
)


def _mk(i, **kw):
    b0 = (f"base content {i} " * (3 + i % 4)).encode()
    tail = f"tail {i % 7}".encode()
    b1 = b0 + tail
    head = f"head {i % 5} ".encode()
    b2 = head + b1
    d1 = build_delta(len(b0), len(b1),
                     delta_copy(0, len(b0)) + delta_insert(tail))
    d2 = build_delta(len(b1), len(b2),
                     delta_insert(head) + delta_copy(0, len(b1)))
    commit = (f"tree {'0' * 64}\nmsg {i % 9}\n").encode()
    entries = [("blob", b0), ("ofs", 0, d1),
               ("ref", object_id("blob", b1), d2), ("commit", commit)]
    return build_pack(entries, **kw), (b0, b1, b2, commit)


def test_delta_chain_round_trip():
    for i in [0, 1, 2, 3, 7, 12]:
        pack, (b0, b1, b2, commit) = _mk(i)
        rows, err = parse_pack(pack)
        assert err is None
        assert [r["otype"] for r in rows] \
            == ["blob", "blob", "blob", "commit"]
        assert [r["size"] for r in rows] \
            == [len(b0), len(b1), len(b2), len(commit)]
        assert [r["delta_depth"] for r in rows] == [0, 1, 2, 0]
        assert [r["base_kind"] for r in rows] \
            == [None, "ofs", "ref", None]
        assert rows[2]["oid"] == object_id("blob", b2)
        assert rows[1]["content_md5"] == hashlib.md5(b1).hexdigest()


def test_ofs_encoding_bias():
    """git's offset varint is +1-biased per continuation byte: the
    2-byte encoding of 128 is 0x80 0x00 (not 0x81 0x00) — round-trip
    a spread of values through the builder/parser pair."""
    assert _ofs_encode(127) == b"\x7f"
    assert _ofs_encode(128) == b"\x80\x00"
    assert _ofs_encode(255) == b"\x80\x7f"
    assert _ofs_encode(256) == b"\x81\x00"


def test_delta_isa_edges():
    base = bytes(range(256)) * 300  # 76800 bytes
    # size 0 in a copy opcode means 0x10000
    d = build_delta(len(base), 0x10000, delta_copy(0, 0x10000))
    assert apply_delta(base, d) == base[:0x10000]
    # insert chunks >127 bytes split across opcodes
    lit = b"L" * 300
    d = build_delta(len(base), 300, delta_insert(lit))
    assert apply_delta(base, d) == lit
    # copy beyond the base is gated
    with pytest.raises(ValueError, match="copy out of base bounds"):
        apply_delta(b"short", build_delta(5, 10, delta_copy(0, 10)))
    # declared target size must match exactly
    with pytest.raises(ValueError, match="target size mismatch"):
        apply_delta(b"short", build_delta(5, 99, delta_copy(0, 5)))
    with pytest.raises(ValueError, match="reserved delta opcode"):
        apply_delta(b"x", build_delta(1, 1, b"\x00"))


def test_poison_tiers():
    assert parse_pack(_mk(3, bad_trailer=True)[0])[1] \
        == "pack checksum mismatch"
    assert parse_pack(_mk(3, bad_ofs=True)[0])[1] \
        == "delta base is not an object boundary"
    assert parse_pack(None)[1] == "short or missing pack"
    pack, _ = _mk(3)
    assert parse_pack(b"PACL" + pack[4:])[1] == "bad pack magic"


def test_fuzz_never_raises():
    rng = random.Random(19)
    base, _ = _mk(5)
    for _ in range(400):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        rows, err = parse_pack(blob)
        assert (rows is None) == (err is not None)
