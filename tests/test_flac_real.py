"""FLAC metadata walk (operators/flac_real.py): bit-packed STREAMINFO,
the little-endian Vorbis island, block-chain discipline, gates, fuzz."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.flac_real import build_flac, parse_flac


def _f(**kw):
    args = dict(rate=44100, channels=2, bits=16, total=220500,
                vendor="vend", comments=["TITLE=t", "ARTIST=a"])
    args.update(kw)
    return build_flac(args.pop("rate"), args.pop("channels"),
                      args.pop("bits"), args.pop("total"),
                      args.pop("vendor"), args.pop("comments"), **args)


def test_streaminfo_bit_unpacking():
    r = parse_flac(_f(rate=96000, channels=8, bits=24,
                      total=(1 << 36) - 1))
    assert r["error"] is None
    assert (r["sample_rate"], r["channels"], r["bits"]) == (96000, 8, 24)
    assert r["total_samples"] == (1 << 36) - 1


def test_vorbis_island_is_little_endian():
    data = _f(vendor="V" * 3, comments=["TITLE=x"])
    at = data.index(b"VVV") - 4
    # the vendor length must be LE: 3 0 0 0, not 0 0 0 3
    assert data[at:at + 4] == b"\x03\x00\x00\x00"
    r = parse_flac(data)
    assert r["vendor"] == "VVV" and r["fields"]["TITLE"] == "x"


def test_value_may_contain_equals():
    r = parse_flac(_f(comments=["COMMENT=a=b=c"]))
    assert r["fields"]["COMMENT"] == "a=b=c"


def test_field_names_case_fold():
    r = parse_flac(_f(comments=["title=lower"]))
    assert r["fields"]["TITLE"] == "lower"


@pytest.mark.parametrize(
    "poison,err",
    [
        ("not_first", "streaminfo not first"),
        ("dirty_padding", "dirty padding"),
        ("no_equals", "malformed vorbis comment"),
        ("truncated", "truncated block body"),
    ],
)
def test_poison_tiers(poison: str, err: str):
    assert parse_flac(_f(poison=poison))["error"] == err


def test_invalid_type_127():
    data = bytearray(_f())
    data[4] = (data[4] & 0x80) | 127
    assert parse_flac(bytes(data))["error"] == "invalid block type 127"


def test_missing_audio_sync():
    data = _f()[:-2]  # chop the frame-sync bytes
    assert parse_flac(data)["error"] == "missing audio sync"


def test_duplicate_streaminfo():
    data = _f()
    si = data[4:4 + 4 + 34]
    # splice a second streaminfo (clear its last flag) before the rest
    spliced = data[:42] + bytes([si[0] & 0x7F]) + si[1:] + data[42:]
    assert parse_flac(spliced)["error"] == "duplicate streaminfo"


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300), st.integers(0, 2 ** 32 - 1))
def test_fuzz_never_raises(blob: bytes, seed: int):
    base = _f()
    rng = random.Random(seed)
    mode = rng.randrange(3)
    if mode == 0:
        data = blob
    elif mode == 1:
        at = rng.randrange(len(base))
        data = base[:at] + blob + base[at + len(blob):]
    else:
        data = base[: rng.randrange(len(base))]
    r = parse_flac(data)
    assert (r["error"] is None) != (r["n_blocks"] is None)
