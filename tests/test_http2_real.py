"""HTTP/2 walker (operators/http2_real.py): connection-scoped HPACK
table, CONTINUATION discipline with mid-integer block splits,
padding gates, stream-0 rules, gates, fuzz."""

import random

from cies_ocr_java_spark.operators.http2_real import (
    build_connection,
    parse_connection,
)

_STREAMS = [
    (1, [(":method", "GET", "auto"), (":path", "/index.html", "auto"),
         ("x-custom", "value-one", "auto"),
         ("cookie", "secret", "never")], b"hello body"),
    (3, [(":method", "GET", "auto"),
         ("x-custom", "value-one", "auto")], b""),
]


def test_round_trip_with_split_headers_and_padding():
    r = parse_connection(build_connection(
        _STREAMS, split_headers_at=5, pad_data=4))
    assert r["error"] is None
    assert (r["n_streams"], r["n_headers"]) == (2, 6)
    assert r["data_bytes"] == 10  # padding removed
    assert (r["n_settings"], r["n_pings"]) == (2, 1)
    assert r["window_delta"] == 512
    assert r["goaway_last_stream"] == 3


def test_dynamic_table_is_connection_scoped():
    # stream 3's x-custom resolves via the index stream 1 added;
    # a frame-scoped decoder would fail the lookup or mis-decode
    r = parse_connection(build_connection(_STREAMS))
    assert r["error"] is None
    # ':path /index.html' is a static-table EXACT match (entry 5),
    # so only x-custom enters the dynamic table; cookie is
    # never-indexed by policy
    assert r["dyn_entries"] == 1


def test_block_split_mid_hpack():
    # every split point must decode identically after joining
    want = None
    for cut in range(1, 12):
        r = parse_connection(build_connection(
            _STREAMS, split_headers_at=cut))
        assert r["error"] is None, cut
        want = want or r["n_headers"]
        assert r["n_headers"] == want


def test_gates():
    assert parse_connection(build_connection(
        _STREAMS, split_headers_at=5, interleave_bad=True)) \
        ["error"] == "expected continuation"
    assert parse_connection(build_connection(
        _STREAMS, settings_on_stream=True))["error"] \
        == "settings on nonzero stream"
    assert parse_connection(build_connection(
        _STREAMS, ack_with_payload=True))["error"] \
        == "settings ack with payload"
    assert parse_connection(build_connection(
        _STREAMS, zero_window=True))["error"] \
        == "zero window increment"
    assert parse_connection(
        b"GET / HTTP/1.1\r\n\r\npayload-padding-bytes")["error"] \
        == "missing connection preface"
    assert parse_connection(None)["error"] \
        == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0x7540)
    base = build_connection(_STREAMS, split_headers_at=5)
    for _ in range(400):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_connection(blob)
