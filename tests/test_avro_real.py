"""Avro OCF walker (operators/avro_real.py): zigzag identity, codec
split (null vs raw-deflate via operators/inflate.py), sync-marker
gates, union branches, fuzz-never-raises."""

import random

import pytest

from cies_ocr_java_spark.operators.avro_real import (
    build_avro,
    decode_long,
    encode_long,
    parse_avro,
)


def test_zigzag_identity():
    for n in [0, -1, 1, -2, 2, 63, -64, 64, 127, 128, -12345,
              2**40, -(2**40), 2**62, -(2**62)]:
        v, pos = decode_long(encode_long(n), 0)
        assert v == n and pos == len(encode_long(n))
    # small magnitudes get small encodings (the point of zigzag)
    assert len(encode_long(-1)) == 1
    assert len(encode_long(-64)) == 1
    assert len(encode_long(64)) == 2


def _mk(i):
    nbk = 1 + i % 3
    sizes = [2 + (i + b) % 3 for b in range(nbk)]
    recs = []
    for k in range(sum(sizes)):
        name = f"rec-{i}-{k}" + ("ü" if k % 3 == 0 else "")
        score = None if (i + k) % 5 == 0 else i + k * 3 + 0.25
        recs.append((i * 1000 + k, name, score))
    codec = "deflate" if i % 2 == 0 else "null"
    return build_avro(recs, sizes, codec=codec), recs, nbk


@pytest.mark.parametrize("i", [0, 1, 2, 3, 7, 10])
def test_round_trip_identity(i):
    b, recs, nbk = _mk(i)
    rows, err = parse_avro(b)
    assert err is None
    assert len(rows) == len(recs)
    for r, (rid, name, score) in zip(rows, recs):
        assert r["rid"] == rid and r["name"] == name
        assert r["score_isnull"] == (1 if score is None else 0)
        assert r["score"] == (0.0 if score is None else score)
        assert r["n_blocks"] == nbk
        assert r["codec"] == ("deflate" if i % 2 == 0 else "null")


def test_deflate_actually_compresses_and_inflates():
    recs = [(k, "x" * 50, None) for k in range(20)]
    plain = build_avro(recs, [20], codec="null")
    packed = build_avro(recs, [20], codec="deflate")
    assert len(packed) < len(plain)  # repetitive payload compresses
    rows, err = parse_avro(packed)
    assert err is None and len(rows) == 20
    assert rows[5]["name"] == "x" * 50


def test_sync_marker_gates():
    b, _, nbk = _mk(4)
    bad = bytearray(b)
    bad[-1] ^= 0xFF
    assert parse_avro(bytes(bad))[1] \
        == f"sync marker mismatch after block {nbk - 1}"
    assert parse_avro(b[:-5])[1] \
        == f"truncated sync marker after block {nbk - 1}"


def test_structural_errors():
    assert parse_avro(None)[1] == "bad avro magic"
    assert parse_avro(b"Obj\x02xxxx")[1] == "bad avro magic"
    b = build_avro([(1, "a", None)], [1], codec="null")
    # rewrite the union branch index to 2 (out of range): the record
    # body is ...id(1 byte) name-len name branch; branch is the last
    # byte before the trailing sync
    bad = bytearray(b)
    bad[-17] = 0x04  # zigzag(2)
    assert "union index 2 out of range" in parse_avro(bytes(bad))[1]


def test_negative_metadata_count_form():
    """A negative map-block count carries an extra byte-size long —
    the spec's skip-affordance; the reader must handle both forms."""
    b = build_avro([(7, "n", 1.5)], [1], codec="null")
    # hand-splice: replace count=2 with count=-2 + size
    pos = 4
    body = b[pos + 1:]  # after the count byte
    # find where the metadata map ends (count 0 byte before sync)
    import re
    from cies_ocr_java_spark.operators.avro_real import encode_string
    meta_len = len(b) - len(body) - 4  # 1
    assert meta_len == 1
    spliced = b[:4] + encode_long(-2) + encode_long(len(body)) + body
    rows, err = parse_avro(spliced)
    assert err is None and rows[0]["rid"] == 7


def test_fuzz_never_raises():
    rng = random.Random(3)
    for seed_doc in (4, 5):
        b, _, _ = _mk(seed_doc)
        for _ in range(400):
            x = bytearray(b)
            for _ in range(rng.randrange(1, 6)):
                x[rng.randrange(len(x))] = rng.randrange(256)
            rows, err = parse_avro(bytes(x[:rng.randrange(len(x) + 1)]))
            assert (rows is None) == (err is not None)
