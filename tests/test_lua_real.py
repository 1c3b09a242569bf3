"""Lua 5.4 chunk walker (operators/lua_real.py): the inverted
(termination-marked) size varint, header canaries, nested protos,
string off-by-one, gates, fuzz."""

import random

from cies_ocr_java_spark.operators.lua_real import (
    build_chunk,
    build_proto,
    dump_size,
    dump_string,
    parse_lua_chunk,
)


def _chunk():
    inner2 = build_proto(None, [0x81, 0x02], [42, b"deep"], [])
    inner1 = build_proto(None, [0x83] * 3,
                         [True, None, 3.5, b"x" * 50], [inner2],
                         n_upvals=2)
    main = build_proto(b"@test.lua", [0x51] * 5,
                       [100000, -7, b"hello"], [inner1])
    return build_chunk(main)


def test_inverted_varint_encoding():
    # termination bit on the LAST byte, MSB-first payload
    assert dump_size(0) == b"\x80"
    assert dump_size(0x7F) == b"\xff"
    assert dump_size(0x80) == b"\x01\x80"
    assert dump_size(300) == bytes((0x02, 0x2C | 0x80))


def test_string_off_by_one():
    assert dump_string(None) == b"\x80"        # size 0 = NULL
    assert dump_string(b"") == b"\x81"         # size 1 = empty
    assert dump_string(b"a") == b"\x82a"


def test_nested_proto_census():
    r = parse_lua_chunk(_chunk())
    assert r["error"] is None
    assert (r["n_functions"], r["max_depth"]) == (3, 3)
    assert r["n_instructions"] == 10
    assert r["n_constants"] == 9
    assert r["int_const_sum"] == 100000 - 7 + 42
    assert r["str_const_bytes"] == 5 + 50 + 4
    assert r["n_upvalues"] == 4


def test_multibyte_sizes():
    big = build_proto(None, [7] * 200, [b"y" * 300], [])
    r = parse_lua_chunk(build_chunk(big))
    assert r["error"] is None
    assert r["n_instructions"] == 200
    assert r["str_const_bytes"] == 300


def test_header_canaries():
    inner = build_proto(None, [1], [5], [])
    assert parse_lua_chunk(build_chunk(
        inner, bad_watermark=True))["error"] \
        == "corrupt chunk watermark"
    assert parse_lua_chunk(build_chunk(
        inner, byteswap_int=True))["error"] \
        == "integer format mismatch"
    assert parse_lua_chunk(build_chunk(
        inner, bad_float=True))["error"] == "float format mismatch"
    assert parse_lua_chunk(None)["error"] \
        == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0x10A)
    base = _chunk()
    for _ in range(500):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_lua_chunk(blob)
