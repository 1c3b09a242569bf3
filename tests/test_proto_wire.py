"""Protobuf wire walker (operators/proto_wire.py): varint framing,
unknown-field skip, nested recursion, fail-loud bounds, fuzz."""

import random

import pytest

from cies_ocr_java_spark.operators.proto_wire import (
    build_proto_doc,
    encode_varint,
    parse_proto_doc,
)


def test_round_trip_identity():
    for i in [0, 1, 127, 128, 300, 12345, 2**32]:
        b = build_proto_doc(i, f"doc-{i}", 300 + i * 7, i % 100,
                            "inner", unknown_fields=i % 4)
        m = parse_proto_doc(b)
        assert m["error"] is None
        assert m["f_id"] == i and m["big"] == 300 + i * 7
        assert m["name"] == f"doc-{i}" and m["inner_s"] == "inner"
        assert m["inner_n"] == i % 100
        assert m["n_unknown"] == i % 4


def test_varint_boundaries():
    # 127 fits one byte, 128 needs two — the continuation-bit edge
    assert encode_varint(127) == b"\x7f"
    assert encode_varint(128) == b"\x80\x01"
    assert encode_varint(300) == b"\xac\x02"  # the spec's own example


def test_unknown_fields_skipped_not_fatal():
    b = build_proto_doc(5, "n", 300, 1, "s", unknown_fields=3)
    m = parse_proto_doc(b)
    assert m["error"] is None and m["n_unknown"] == 3
    # fixed64 / fixed32 unknowns skip by width too
    extra = (encode_varint((11 << 3) | 1) + b"\x01" * 8
             + encode_varint((12 << 3) | 5) + b"\x02" * 4)
    m2 = parse_proto_doc(build_proto_doc(5, "n", 300, 1, "s") + extra)
    assert m2["error"] is None and m2["n_unknown"] == 2


def test_fail_loud_bounds():
    b = build_proto_doc(7, "x", 300, 1, "y")
    assert parse_proto_doc(b[:-2])["error"] == (
        "length-delimited field overruns"
    )
    assert parse_proto_doc(b"\x08" + b"\x80" * 11)["error"] == (
        "varint too long"
    )
    assert parse_proto_doc(bytes([(9 << 3) | 3]))["error"] == (
        "unskippable wire type 3"
    )
    assert parse_proto_doc(b"")["error"] == "short or missing payload"
    assert parse_proto_doc(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    b = build_proto_doc(9, "doc-9-name", 363, 9, "inner-4",
                        unknown_fields=2)
    for cut in range(len(b)):
        parse_proto_doc(b[:cut])
    rnd = random.Random(21)
    for _ in range(500):
        bb = bytearray(b)
        for _ in range(rnd.randrange(1, 5)):
            bb[rnd.randrange(len(bb))] = rnd.randrange(256)
        parse_proto_doc(bytes(bb))


def test_build_rejects_negative():
    with pytest.raises(ValueError):
        encode_varint(-1)
