"""uuencode decoder (operators/uuencode_real.py): stdlib interop,
backtick-zero folding, length-prefix gates, fuzz."""

import hashlib
import random

import pytest

from cies_ocr_java_spark.operators.uuencode_real import (
    build_uu,
    parse_uu_doc,
    uu_decode,
)


def test_stdlib_interop_identity():
    rng = random.Random(42)
    for payload in [b"", b"abc", b"x" * 45, b"y" * 46,
                    bytes(range(256)) * 3,
                    bytes(rng.randrange(256) for _ in range(1000))]:
        b = build_uu("f.bin", 0o644, payload)
        name, mode, got, _n = uu_decode(b)
        assert (name, mode, got) == ("f.bin", 0o644, payload)


def test_backtick_and_space_both_mean_zero():
    """binascii emits spaces for zero; most Unix uuencodes emit
    backticks — both must decode identically."""
    b = build_uu("z", 0o600, b"\x00\x00\x00")
    _n, _m, got, _ = uu_decode(b)
    assert got == b"\x00\x00\x00"
    hdr_end = b.index(b"\n") + 1  # swap only inside data lines
    swapped = b[:hdr_end] + b[hdr_end:].replace(b" ", b"`")
    assert uu_decode(swapped)[2] == b"\x00\x00\x00"


def test_length_prefix_gates():
    b = build_uu("x", 0o644, b"A" * 90)
    p1 = b.index(b"\n") + 1
    p2 = b.index(b"\n", p1)
    short = b[:p1 + 28] + b[p2:]
    assert parse_uu_doc(short)["error"] == "line 1 too short"
    assert parse_uu_doc(b.replace(b"end\n", b""))["error"] \
        == "missing end marker"
    with pytest.raises(ValueError, match="claims"):
        # 'R' = 32 + 50: a valid uu char claiming 50 > 45 bytes
        uu_decode(b"begin 644 f\nRAAAA\n`\nend\n")
    assert parse_uu_doc(b"notuu data here!")["error"] \
        == "missing begin header"
    assert parse_uu_doc(b"begin 9z9 name\n`\nend\n")["error"] \
        == "bad mode field"


def test_fuzz_never_raises():
    rng = random.Random(83)
    b = build_uu("doc.bin", 0o644, b"payload " * 30)
    for _ in range(500):
        x = bytearray(b)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        assert "error" in parse_uu_doc(
            bytes(x[:rng.randrange(len(x) + 1)]))


def test_md5_surface():
    payload = b"stable payload"
    m = parse_uu_doc(build_uu("p", 0o644, payload))
    assert m["payload_md5"] == hashlib.md5(payload).hexdigest()
