"""ICO favicon container (operators/ico_real.py): round trip over mixed
PNG/DIB members, the 256-encoded-as-0 dimension rule, largest-image
selection, poison tiers, and the fuzz contract."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.ico_real import build_ico, parse_ico


def test_round_trip_mixed_members():
    r = parse_ico(build_ico([("png", 16, 16, 10), ("dib", 32, 24, 7),
                             ("png", 8, 8, 200)]))
    assert r["error"] is None
    assert r["n_images"] == 3
    assert r["entries"] == "16x16:png,32x24:dib,8x8:png"
    assert (r["best_width"], r["best_height"], r["best_kind"]) == (32, 24,
                                                                   "dib")
    assert r["best_ink"] == 3 * 32 * 24 * 7


def test_largest_first_wins_ties():
    r = parse_ico(build_ico([("dib", 16, 16, 1), ("png", 16, 16, 2)]))
    assert r["best_kind"] == "dib" and r["best_ink"] == 3 * 16 * 16


def test_256_stored_as_zero():
    data = build_ico([("png", 256, 256, 3)])
    assert data[6] == 0 and data[7] == 0  # width/height bytes
    r = parse_ico(data)
    assert (r["best_width"], r["best_height"]) == (256, 256)
    assert r["error"] is None


def test_dib_height_not_doubled_fails():
    data = bytearray(build_ico([("dib", 8, 8, 5)]))
    off = struct.unpack_from("<I", data, 6 + 12)[0]
    # biHeight sits 8 bytes into the info header
    struct.pack_into("<i", data, off + 8, 15)
    assert parse_ico(bytes(data))["error"] == "dib height not doubled"


def test_entry_header_mismatch_fails():
    data = bytearray(build_ico([("png", 16, 16, 5)]))
    data[6] = 8  # directory claims 8x16
    assert parse_ico(bytes(data))["error"] == "entry/header size mismatch"


def test_poisoned_png_member_propagates_png_error():
    data = bytearray(build_ico([("png", 16, 16, 5)]))
    off = struct.unpack_from("<I", data, 6 + 12)[0]
    data[off + 20] ^= 0xFF  # inside IHDR body -> chunk CRC fails
    r = parse_ico(bytes(data))
    assert r["error"] is not None and r["error"].startswith("png member: ")


@pytest.mark.parametrize(
    "mut,err",
    [
        (lambda b: b[:2] + struct.pack("<H", 2) + b[4:], "bad icondir"),
        (lambda b: b[:4] + struct.pack("<H", 0) + b[6:], "empty icon"),
        (lambda b: b[:10], "truncated icon directory"),
        (lambda b: b[:18] + struct.pack("<I", 1 << 28) + b[22:],
         "entry out of bounds"),
    ],
)
def test_directory_poisons(mut, err):
    assert parse_ico(mut(build_ico([("dib", 8, 8, 5)])))["error"] == err


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300), st.integers(0, 2 ** 32 - 1))
def test_fuzz_never_raises(blob: bytes, seed: int):
    base = build_ico([("png", 8, 8, 9), ("dib", 16, 8, 4)])
    rng = random.Random(seed)
    mode = rng.randrange(3)
    if mode == 0:
        data = blob
    elif mode == 1:
        at = rng.randrange(len(base))
        data = base[:at] + blob + base[at + len(blob):]
    else:
        data = base[: rng.randrange(len(base))]
    r = parse_ico(data)
    assert (r["error"] is None) != (r["n_images"] is None)
