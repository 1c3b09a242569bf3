"""ASN.1 DER walker (operators/der_real.py): round-trip identity,
canonical-form gates, OID arc math, UTCTime pivot, fuzz."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.der_real import (
    DerError,
    build_certificate,
    der_decode,
    encode_integer,
    encode_oid,
    encode_tlv,
    parse_certificate,
)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1, max_value=2**62),
       st.text(max_size=40),
       st.integers(min_value=0, max_value=2 * 10**9),
       st.integers(min_value=0, max_value=7),
       st.binary(min_size=1, max_size=64))
def test_certificate_round_trip(serial, cn, nb, unused, key):
    cert = build_certificate(serial, cn, "issuer", nb, nb + 1000, key,
                             unused_bits=unused)
    r = parse_certificate(cert)
    assert r["serial"] == serial
    assert r["subject_cn"] == cn
    assert r["not_before"] == nb and r["not_after"] == nb + 1000
    assert r["key_bits"] == len(key) * 8 - unused
    assert r["version"] == 2


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-2**70, max_value=2**70))
def test_integer_minimal_round_trip(v):
    tag, got = der_decode(encode_integer(v))
    assert tag == 0x02 and got == v


def test_oid_multibyte_arcs():
    # 113549 needs three base-128 bytes; 2.999 exercises the 40*X+Y edge
    for dotted in ("1.2.840.113549.1.1.11", "2.5.4.3", "1.3.6.1.4.1.311"):
        tag, got = der_decode(encode_oid(dotted))
        assert tag == 0x06 and got == dotted


def test_canonical_form_gates():
    with pytest.raises(DerError, match="indefinite length"):
        der_decode(b"\x30\x80\x00\x00")
    with pytest.raises(DerError, match="non-minimal length"):
        der_decode(b"\x04\x81\x05hello")  # long form for a short length
    with pytest.raises(DerError, match="non-minimal INTEGER"):
        der_decode(b"\x02\x02\x00\x05")
    with pytest.raises(DerError, match="non-minimal INTEGER"):
        der_decode(b"\x02\x02\xff\xfb")
    with pytest.raises(DerError, match="bad DER BOOLEAN"):
        der_decode(b"\x01\x01\x01")
    with pytest.raises(DerError, match="nonzero BIT STRING padding"):
        der_decode(b"\x03\x02\x03\x07")
    with pytest.raises(DerError, match="bad BIT STRING unused"):
        der_decode(b"\x03\x02\x08\x00")
    with pytest.raises(DerError, match="non-minimal OID arc"):
        der_decode(b"\x06\x03\x55\x80\x03")
    with pytest.raises(DerError, match="trailing garbage"):
        der_decode(b"\x05\x00\x00")
    with pytest.raises(DerError, match="value past end"):
        der_decode(b"\x04\x05ab")


def test_utctime_pivot():
    # YY < 50 -> 20YY, YY >= 50 -> 19YY (RFC 5280)
    tag, epoch = der_decode(b"\x17\x0d" + b"490101000000Z")
    assert epoch == 2493072000  # 2049-01-01
    tag, epoch = der_decode(b"\x17\x0d" + b"500101000000Z")
    assert epoch == -631152000  # 1950-01-01


def test_poison_modes():
    for poison, kind in [
        ("indefinite", "indefinite length forbidden in DER"),
        ("nonminimal", "non-minimal INTEGER"),
        ("padding", "nonzero BIT STRING padding"),
    ]:
        cert = build_certificate(5, "x", "y", 1, 2, b"\x01\x02",
                                 poison=poison)
        with pytest.raises(DerError, match=kind.split(" ")[0]):
            parse_certificate(cert)


def test_nesting_depth_guard():
    blob = b"\x05\x00"
    for _ in range(40):
        blob = encode_tlv(0x30, blob)
    with pytest.raises(DerError, match="nesting too deep"):
        der_decode(blob)


def test_fuzz_never_raises_uncaught():
    cert = build_certificate(99, "fuzz.example", "ca", 10**9, 2 * 10**9,
                             bytes(range(16)), unused_bits=3)
    rng = random.Random(12)
    for _ in range(600):
        m = bytearray(cert)
        for _ in range(rng.randint(1, 8)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        try:
            parse_certificate(bytes(m))
        except DerError:
            pass
