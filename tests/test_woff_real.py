"""WOFF 1.0 wrapper (operators/woff_real.py): exact sfnt
reconstruction, the compressed and stored table paths, gates, fuzz."""

from __future__ import annotations

import random
import struct
import zlib

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.sfnt_real import build_ttf, parse_ttf
from cies_ocr_java_spark.operators.woff_real import (
    build_woff,
    parse_woff,
    reconstruct_sfnt,
)

DELTA = (97, 106, (10 - 97) & 0xFFFF)


def _sfnt(n_arr: int = 5):
    return build_ttf(DELTA, (112, 111 + n_arr,
                             [100 + k % 7 for k in range(n_arr)]), 200)


def test_reconstruction_is_byte_exact():
    sfnt = _sfnt()
    assert reconstruct_sfnt(build_woff(sfnt)) == sfnt


def test_full_sfnt_gates_rerun_on_reconstruction():
    r = parse_woff(build_woff(_sfnt()), "abcjpqtz")
    assert r == parse_ttf(_sfnt(), "abcjpqtz")
    assert r["error"] is None and r["glyph_sum"] > 0


def test_large_repetitive_table_takes_the_zlib_path():
    sfnt = _sfnt(n_arr=1200)  # big repetitive cmap -> compresses
    w = build_woff(sfnt)
    assert len(w) < len(sfnt)
    # at least one directory entry has compLength < origLength
    n = struct.unpack_from(">H", w, 12)[0]
    comps = [struct.unpack_from(">4sIIII", w, 44 + 20 * k) for k in
             range(n)]
    assert any(c[2] < c[3] for c in comps)
    assert reconstruct_sfnt(w) == sfnt


@pytest.mark.parametrize(
    "poison,err",
    [
        ("signature", "bad woff signature"),
        ("sfnt_size", "totalSfntSize mismatch"),
        ("orig_checksum", "origChecksum mismatch"),
        ("overlong", "compressed longer than original"),
    ],
)
def test_poison_tiers(poison: str, err: str):
    assert parse_woff(build_woff(_sfnt(), poison=poison), "a")[
        "error"] == err


def test_corrupt_zlib_stream_fails_cleanly():
    sfnt = _sfnt(n_arr=1200)
    w = bytearray(build_woff(sfnt))
    n = struct.unpack_from(">H", w, 12)[0]
    for k in range(n):
        tag, off, cl, ol, _cs = struct.unpack_from(">4sIIII", w,
                                                   44 + 20 * k)
        if cl < ol:
            w[off + 2] ^= 0xFF
            break
    r = parse_woff(bytes(w), "a")
    assert r["error"] is not None


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=300), st.integers(0, 2 ** 32 - 1))
def test_fuzz_never_raises(blob: bytes, seed: int):
    base = build_woff(_sfnt())
    rng = random.Random(seed)
    mode = rng.randrange(3)
    if mode == 0:
        data = blob
    elif mode == 1:
        at = rng.randrange(len(base))
        data = base[:at] + blob + base[at + len(blob):]
    else:
        data = base[: rng.randrange(len(base))]
    r = parse_woff(data, "abc")
    assert (r["error"] is None) != (r["glyph_sum"] is None)
