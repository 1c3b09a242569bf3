"""BER walker (operators/ber_real.py): indefinite lengths with
bracket-paired EOCs, non-minimal long-form lengths, constructed
string reassembly, pyasn1 interop, gates, fuzz."""

import random

import pytest

from cies_ocr_java_spark.operators.ber_real import (
    indef,
    parse_ber,
    tlv,
)

pyasn1 = pytest.importorskip("pyasn1")


def _msg():
    inner = indef(0x24, tlv(0x04, b"abc") + tlv(0x04, b"defg"))
    seq_nm = tlv(0x30, tlv(0x01, b"\xff"), wide=1)
    return indef(0x30, tlv(0x02, b"\x01\x02") + inner + seq_nm)


def test_hand_built_census():
    r = parse_ber(_msg())
    assert r["error"] is None
    assert r["n_values"] == 7
    assert r["n_indefinite"] == 2
    assert r["n_nonminimal"] == 1
    assert r["content_bytes"] == 2 + 3 + 4 + 1
    assert r["n_constructed_strings"] == 1
    assert r["max_depth"] == 3


def test_pyasn1_interop_both_modes():
    from pyasn1.codec.ber import encoder
    from pyasn1.type import univ

    seq = univ.Sequence()
    seq.setComponentByPosition(0, univ.Integer(258))
    seq.setComponentByPosition(
        1, univ.OctetString(b"hello world, this is a longer "
                            b"string"))
    seq.setComponentByPosition(2, univ.Boolean(True))
    # indefinite + 8-byte chunked constructed string
    r = parse_ber(encoder.encode(seq, defMode=False,
                                 maxChunkSize=8))
    assert r["error"] is None
    assert r["n_indefinite"] == 2
    assert r["n_constructed_strings"] == 1
    assert r["content_bytes"] == 2 + 36 + 1
    # definite mode: same content, no freedoms used
    d = parse_ber(encoder.encode(seq))
    assert d["error"] is None
    assert (d["n_indefinite"], d["n_constructed_strings"]) == (0, 0)
    assert d["content_bytes"] == r["content_bytes"]


def test_high_tag_number_form():
    ht = bytes((0x3F, 0x81, 0x23)) + b"\x80" + tlv(0x04, b"xy") \
        + b"\x00\x00"
    r = parse_ber(ht)
    assert r["error"] is None and r["n_values"] == 2


def test_gates():
    assert parse_ber(b"\x00\x00")["error"] \
        == "unexpected end-of-contents"
    assert parse_ber(indef(0x30, tlv(0x02, b"\x05"),
                           drop_eoc=True))["error"] \
        == "missing end-of-contents"
    assert parse_ber(b"\x04\x80abc\x00\x00")["error"] \
        == "indefinite length on primitive"
    deep = tlv(0x04, b"z")
    for _ in range(40):
        deep = indef(0x30, deep)
    assert parse_ber(deep)["error"] == "nesting too deep"
    assert parse_ber(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0xBE4)
    base = _msg()
    for _ in range(500):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_ber(blob)
