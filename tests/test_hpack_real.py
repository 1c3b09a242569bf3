"""HPACK (operators/hpack_real.py): RFC 7541 Appendix C request
examples (plain AND huffman), netty-encoder interop vectors, huffman
round-trip + padding gates, dynamic-table eviction, fuzz."""

import random
from pathlib import Path

import pytest

import cies_ocr_java_spark.operators.hpack_real as hp
from cies_ocr_java_spark.operators.hpack_real import (
    HpackCodec,
    encode_header_block,
    huffman_decode,
    huffman_encode,
    parse_header_block,
)


def _dec_stateful(codec, data):
    pos, headers = 0, []
    while pos < len(data):
        b = data[pos]
        if b & 0x80:
            idx, pos = hp._decode_int(data, pos, 7)
            headers.append(codec.lookup(idx))
        elif b & 0x40:
            idx, pos = hp._decode_int(data, pos, 6)
            name = codec.lookup(idx)[0] if idx else None
            if name is None:
                name, pos, _ = hp._decode_str(data, pos)
            val, pos, _ = hp._decode_str(data, pos)
            headers.append((name, val))
            codec.add(name, val)
        elif b & 0x20:
            v, pos = hp._decode_int(data, pos, 5)
            codec.resize(v)
        else:
            idx, pos = hp._decode_int(data, pos, 4)
            name = codec.lookup(idx)[0] if idx else None
            if name is None:
                name, pos, _ = hp._decode_str(data, pos)
            val, pos, _ = hp._decode_str(data, pos)
            headers.append((name, val))
    return headers


_RFC_REQ = [
    (":method", "GET"), (":scheme", "http"), (":path", "/"),
    (":authority", "www.example.com"),
]


@pytest.mark.parametrize("blocks", [
    # C.3: without huffman
    ["828684410f7777772e6578616d706c652e636f6d",
     "828684be58086e6f2d6361636865",
     "828785bf400a637573746f6d2d6b65790c637573746f6d2d76616c7565"],
    # C.4: with huffman
    ["828684418cf1e3c2e5f23a6ba0ab90f4ff",
     "828684be5886a8eb10649cbf",
     "828785bf408825a849e95ba97d7f8925a849e95bb8e8b4bf"],
])
def test_rfc7541_appendix_c_request_examples(blocks):
    codec = HpackCodec()
    h1 = _dec_stateful(codec, bytes.fromhex(blocks[0]))
    assert h1 == _RFC_REQ
    h2 = _dec_stateful(codec, bytes.fromhex(blocks[1]))
    assert h2 == _RFC_REQ + [("cache-control", "no-cache")]
    h3 = _dec_stateful(codec, bytes.fromhex(blocks[2]))
    assert h3 == [(":method", "GET"), (":scheme", "https"),
                  (":path", "/index.html"),
                  (":authority", "www.example.com"),
                  ("custom-key", "custom-value")]
    # the RFC's published table state after the third block
    assert codec.size == 164
    assert codec.table[0] == ("custom-key", "custom-value")


def test_netty_encoder_vectors_decode():
    """Blocks produced by netty-codec-http2's real HpackEncoder
    (committed vectors; generation recipe in BASELINE.md round-4) —
    exercises dynamic refs across blocks, without-indexing literals
    with multi-byte name indices, and static matches."""
    vecs = Path(__file__).with_name("data") \
        .joinpath("netty_hpack_vectors.txt").read_text().split()
    codec = HpackCodec()
    got = [_dec_stateful(codec, bytes.fromhex(v)) for v in vecs]
    assert got[0] == [(":method", "POST"), (":path", "/api/v2/items"),
                      ("content-type", "application/json"),
                      ("x-request-id", "11aa22bb")]
    assert got[1] == [(":method", "POST"), (":path", "/api/v2/items"),
                      ("x-request-id", "11aa22bb"),
                      ("accept-encoding", "gzip, deflate, br")]
    assert got[2] == [(":status", "200"),
                      ("content-type", "text/html; charset=utf-8"),
                      ("server", "h2tester/1.0")]


def test_huffman_round_trip_and_padding_gates():
    rng = random.Random(7541)
    for _ in range(50):
        raw = bytes(rng.randrange(256)
                    for _ in range(rng.randrange(0, 40)))
        assert huffman_decode(huffman_encode(raw)) == raw
    # padding must be all-ones and < 8 bits
    with pytest.raises(ValueError, match="bad huffman padding"):
        huffman_decode(b"\x00")  # '0' + 3 zero pad bits
    with pytest.raises(ValueError, match="bad huffman padding"):
        huffman_decode(huffman_encode(b"ab") + b"\xff")  # 8+ pad bits


def test_parse_block_facts_and_gates():
    codec = HpackCodec()
    blk = encode_header_block(
        [(":method", "GET", "auto"), ("x-a", "1", "auto"),
         ("x-a", "1", "auto"), ("cookie", "s", "never")],
        codec, huffman=True)
    r = parse_header_block(blk)
    assert r["error"] is None
    assert r["n_headers"] == 4
    assert r["n_indexed"] == 2      # :method + second x-a
    assert r["n_never"] == 1
    assert r["dyn_entries"] == 1
    assert parse_header_block(bytes([0x80]))["error"] == "zero index"
    assert parse_header_block(hp.encode_int(200, 7, 0x80))["error"] \
        == "index out of table"
    assert parse_header_block(
        hp.encode_int(99999, 5, 0x20))["error"] \
        == "table size update above maximum"
    assert parse_header_block(None)["error"] == "short or missing payload"


def test_dynamic_table_eviction():
    codec = HpackCodec(max_size=100)
    codec.add("aaaaaaaaaa", "bbbbbbbbbb")  # 52
    codec.add("cccccccccc", "dddddddddd")  # 52 -> evicts first
    assert len(codec.table) == 1
    assert codec.table[0][0] == "cccccccccc"
    assert codec.size == 52


def test_fuzz_never_raises():
    rng = random.Random(2)
    codec = HpackCodec()
    t = encode_header_block(
        [(":path", "/x/y", "auto"), ("k", "v", "auto")], codec)
    for _ in range(400):
        x = bytearray(t)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_header_block(blob)
