"""OGG page walk (operators/ogg_real.py): lacing round trip including
exact-255 packets and page-spanning, the format's own CRC flavor, flag
placement gates, poison tiers, and the fuzz contract."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.ogg_real import (
    LACING_PER_PAGE,
    _lacings,
    _ogg_crc,
    build_ogg,
    parse_ogg,
)


def test_round_trip_with_spanning():
    pkts = [b"A" * 300, b"B" * 10, b"C" * 255, b"D" * 600]
    r = parse_ogg(build_ogg(pkts, 77))
    assert r["error"] is None
    assert r["n_packets"] == 4
    assert r["serial"] == 77
    assert r["granule"] == 4
    assert r["text"] == "|".join(p.decode() for p in pkts)
    # lacing arithmetic: 300->2, 10->1, 255->2, 600->3 = 8 values
    assert r["n_pages"] == -(-8 // LACING_PER_PAGE)


def test_exact_255_needs_trailing_zero_lacing():
    assert _lacings([b"x" * 255]) == [(255, False), (0, True)]
    r = parse_ogg(build_ogg([b"x" * 255], 1))
    assert r["error"] is None and r["n_packets"] == 1


def test_ogg_crc_is_not_zlib():
    import zlib

    data = b"the ogg crc is the unreflected one"
    assert _ogg_crc(data) != zlib.crc32(data)
    # known property: crc of empty input is 0
    assert _ogg_crc(b"") == 0


def test_capture_pattern_in_payload_does_not_desync():
    # a payload containing 'OggS' must be walked THROUGH, not re-synced
    pkts = [b"xxOggS" + b"\x00" * 30 + b"OggSyy"]
    r = parse_ogg(build_ogg(pkts, 5))
    assert r["error"] == "non-utf8 packet" or r["n_packets"] == 1
    r2 = parse_ogg(build_ogg([b"abOggScd"], 5))
    assert r2["error"] is None and r2["text"] == "abOggScd"


@pytest.mark.parametrize(
    "poison,err",
    [
        ("crc", "page crc mismatch"),
        ("seq_gap", "page sequence gap"),
        ("version", "unsupported version"),
        ("truncate", "truncated page"),
    ],
)
def test_poison_tiers(poison: str, err: str):
    pkts = [b"hello" * 20, b"world" * 60]
    assert parse_ogg(build_ogg(pkts, 9, poison=poison))["error"] == err


def test_flag_gates():
    good = bytearray(build_ogg([b"q" * 600], 3))
    # flip the BOS flag off page 0 and recompute the CRC so the FLAG is
    # what fails
    good[5] &= ~0x02
    struct.pack_into("<I", good, 22, 0)
    seg = good[26]
    body = sum(good[27:27 + seg])
    crc = _ogg_crc(bytes(good[:27 + seg + body]))
    struct.pack_into("<I", good, 22, crc)
    assert parse_ogg(bytes(good))["error"] == "misplaced bos flag"


def test_missing_eos_detected():
    pages = build_ogg([b"a" * 8], 3)
    b = bytearray(pages)
    b[5] &= ~0x04
    struct.pack_into("<I", b, 22, 0)
    seg = b[26]
    body = sum(b[27:27 + seg])
    struct.pack_into("<I", b, 22, _ogg_crc(bytes(b[:27 + seg + body])))
    assert parse_ogg(bytes(b))["error"] == "missing eos flag"


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300), st.integers(0, 2 ** 32 - 1))
def test_fuzz_never_raises(blob: bytes, seed: int):
    base = build_ogg([b"fuzz" * 30, b"tgt" * 100], 11)
    rng = random.Random(seed)
    mode = rng.randrange(3)
    if mode == 0:
        data = blob
    elif mode == 1:
        at = rng.randrange(len(base))
        data = base[:at] + blob + base[at + len(blob):]
    else:
        data = base[: rng.randrange(len(base))]
    r = parse_ogg(data)
    assert (r["error"] is None) != (r["text"] is None)
