"""TTF/sfnt walker (operators/sfnt_real.py): checksum discipline
(per-table, head-adjustment-zeroed, whole-font 0xB1B0AFBA), cmap
format-4 mapping through BOTH mechanisms, gates, and the fuzz
contract."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.sfnt_real import (
    _csum,
    build_ttf,
    parse_ttf,
)

DELTA_SEG = (ord("a"), ord("j"), (10 - ord("a")) & 0xFFFF)
ARRAY_SEG = (ord("p"), ord("t"), [100, 101, 105, 111, 120])


def _font(**kw):
    return build_ttf(DELTA_SEG, ARRAY_SEG, 200, **kw)


def test_both_mapping_mechanisms():
    r = parse_ttf(_font(), "abcjpqtz")
    assert r["error"] is None
    # idDelta path: a..j -> 10..19; idRangeOffset path: p,q,t -> array
    assert r["glyph_sum"] == (10 + 11 + 12 + 19) + (100 + 101 + 120) + 0
    assert r["n_segments"] == 3 and r["n_tables"] == 4
    assert r["num_glyphs"] == 200


def test_unmapped_chars_are_zero_not_error():
    r = parse_ttf(_font(), "zzz")
    assert r["error"] is None and r["glyph_sum"] == 0


def test_whole_font_sums_to_magic():
    font = bytearray(_font())
    # zero the adjustment (head is the 2nd table; find its record)
    n = struct.unpack_from(">H", font, 4)[0]
    for k in range(n):
        tag, _cs, off, _ln = struct.unpack_from(">4sIII", font, 12 + 16 * k)
        if tag == b"head":
            adj = struct.unpack_from(">I", font, off + 8)[0]
            struct.pack_into(">I", font, off + 8, 0)
            assert (_csum(bytes(font)) + adj) & 0xFFFFFFFF == 0xB1B0AFBA
            return
    raise AssertionError("no head table")


@pytest.mark.parametrize(
    "poison,err",
    [
        ("search_range", "bad search range"),
        ("table_sum", "table checksum mismatch"),
        ("font_sum", "font checksum mismatch"),
        ("no_sentinel", "cmap missing sentinel"),
    ],
)
def test_poison_tiers(poison: str, err: str):
    assert parse_ttf(_font(poison=poison), "a")["error"] == err


def test_any_byte_flip_fails_a_checksum_gate():
    font = _font()
    rng = random.Random(7)
    for _ in range(12):
        at = rng.randrange(len(font))
        bad = font[:at] + bytes([font[at] ^ 0x01]) + font[at + 1:]
        r = parse_ttf(bad, "a")
        assert r["error"] is not None  # the checksum net catches all


def test_unsorted_directory_fails():
    font = bytearray(_font())
    # swap the first two directory records (cmap <-> head)
    a = bytes(font[12:28])
    b = bytes(font[28:44])
    font[12:28], font[28:44] = b, a
    assert parse_ttf(bytes(font), "")["error"] == (
        "table directory not sorted")


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300), st.integers(0, 2 ** 32 - 1))
def test_fuzz_never_raises(blob: bytes, seed: int):
    base = _font()
    rng = random.Random(seed)
    mode = rng.randrange(3)
    if mode == 0:
        data = blob
    elif mode == 1:
        at = rng.randrange(len(base))
        data = base[:at] + blob + base[at + len(blob):]
    else:
        data = base[: rng.randrange(len(base))]
    r = parse_ttf(data, "abc")
    assert (r["error"] is None) != (r["glyph_sum"] is None)
