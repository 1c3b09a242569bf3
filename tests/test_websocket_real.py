"""WebSocket walker (operators/websocket_real.py): XOR masking,
minimal-length escapes, fragmentation with interleaved control
frames, UTF-8-after-reassembly, gates, fuzz."""

import random

from cies_ocr_java_spark.operators.websocket_real import (
    build_frame,
    build_stream,
    parse_ws_stream,
)

_TEXT = ("héllo wörld ✓ " * 10).encode()
_MSGS = [(1, _TEXT, 3), (2, bytes(range(200)), 2),
         (9, b"ping", 1),
         (8, (1000).to_bytes(2, "big") + b"bye", 1)]


def test_round_trip_with_interleaved_ping():
    r = parse_ws_stream(build_stream(_MSGS, interleave_ping=True))
    assert r["error"] is None
    assert (r["n_messages"], r["n_control"]) == (2, 3)
    assert r["text_chars"] == len(_TEXT.decode())
    assert r["binary_bytes"] == 200
    assert r["n_fragmented"] == 2
    assert r["close_code"] == 1000
    # 3 text fragments + interleaved ping + 2 binary fragments +
    # explicit ping + close
    assert r["n_frames"] == 8


def test_utf8_checked_only_after_reassembly():
    eu = "✓".encode()  # 3 bytes, split across fragments
    f1 = build_frame(1, eu[:1], fin=False)
    good = f1 + build_frame(0, eu[1:], fin=True)
    bad = f1 + build_frame(0, b"\xff\xff", fin=True)
    assert parse_ws_stream(good)["error"] is None
    assert parse_ws_stream(good)["text_chars"] == 1
    assert parse_ws_stream(bad)["error"] \
        == "invalid utf-8 after reassembly"


def test_64bit_length_path():
    big = bytes(70000)
    r = parse_ws_stream(build_frame(2, big))
    assert r["error"] is None and r["binary_bytes"] == 70000


def test_gates():
    assert parse_ws_stream(build_stream(_MSGS, unmasked_one=True)) \
        ["error"] == "mask bit violates role"
    assert parse_ws_stream(build_stream(
        [(1, b"hi", 1)], overlong_one=True))["error"] \
        == "overlong length encoding"
    assert parse_ws_stream(build_stream(
        [(9, b"p", 1)], fragment_control=True))["error"] \
        == "fragmented control frame"
    assert parse_ws_stream(build_stream(_MSGS, chop=3))["error"] \
        == "truncated frame"
    # continuation with no started message
    assert parse_ws_stream(build_frame(0, b"x", fin=True)) \
        ["error"] == "continuation without start"
    assert parse_ws_stream(None)["error"] \
        == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0x6455)
    base = build_stream(_MSGS)
    for _ in range(500):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_ws_stream(blob)
