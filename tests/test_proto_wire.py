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


class TestProtoGroups:
    """Wire types 3/4 (proto1 groups): bracket-matched field
    numbers, nesting depth, packed repeated varints with exact
    consumption."""

    _TOP = [("int", 1, 100),
            ("group", 2, [("int", 1, 7),
                          ("group", 3, [("int", 1, 9)]),
                          ("int", 2, 11)]),
            ("packed", 5, [1, 300, 70000]),
            ("int", 6, 50)]

    def test_round_trip(self):
        from cies_ocr_java_spark.operators.proto_wire import (
            build_proto_groups,
            parse_proto_groups,
        )
        r = parse_proto_groups(build_proto_groups(self._TOP))
        assert r["error"] is None
        assert (r["n_groups"], r["max_group_depth"]) == (2, 2)
        assert r["int_sum"] == 100 + 7 + 9 + 11 + 50
        assert (r["n_packed_values"], r["packed_sum"]) == (3, 70301)

    def test_gates(self):
        from cies_ocr_java_spark.operators.proto_wire import (
            build_proto_groups,
            parse_proto_groups,
        )
        assert parse_proto_groups(build_proto_groups(
            self._TOP, mismatch_end=True))["error"] \
            == "group end mismatches start"
        assert parse_proto_groups(build_proto_groups(
            self._TOP, drop_end=True))["error"] \
            == "unterminated group"
        assert parse_proto_groups(build_proto_groups(
            self._TOP, stray_end=True))["error"] \
            == "group end without start"

    def test_fuzz_never_raises(self):
        import random

        from cies_ocr_java_spark.operators.proto_wire import (
            build_proto_groups,
            parse_proto_groups,
        )
        rng = random.Random(0x347)
        base = build_proto_groups(self._TOP)
        for _ in range(400):
            x = bytearray(base)
            for _ in range(rng.randrange(1, 5)):
                x[rng.randrange(len(x))] = rng.randrange(256)
            blob = (bytes(x[:rng.randrange(len(x) + 1)])
                    if rng.random() < 0.3 else bytes(x))
            assert "error" in parse_proto_groups(blob)
