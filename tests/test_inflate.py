"""From-scratch DEFLATE decoder (operators/inflate.py): stdlib-encoder
parity across block types, the RFC 1950 wrapper gates, and handcrafted
bitstreams for the corners a real encoder never emits (oversubscribed
tables, repeat-with-no-previous, distance-too-far, unassigned fixed
distance codes, incomplete literal tables)."""

from __future__ import annotations

import random
import zlib

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.inflate import (
    InflateError,
    deflate_raw,
    deflate_zlib,
    inflate_raw,
    inflate_zlib,
)


class _BitWriter:
    """LSB-first bit packer mirroring the decoder's _Bits reader.

    ``bits`` writes header/extra fields (LSB-first values); ``code``
    writes Huffman codes (MSB of the code first, per RFC 1951 3.1.1)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value: int, width: int) -> None:
        self.acc |= value << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def code(self, value: int, width: int) -> None:
        for k in range(width - 1, -1, -1):
            self.bits((value >> k) & 1, 1)

    def bytes_(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _err(data: bytes, fn=inflate_raw) -> str:
    with pytest.raises(InflateError) as ei:
        fn(data)
    return str(ei.value)


# ---------------------------------------------------------------------------
# stdlib-encoder parity
# ---------------------------------------------------------------------------

@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=4000),
       st.sampled_from([0, 1, 6, 9]),
       st.sampled_from([zlib.Z_DEFAULT_STRATEGY, zlib.Z_FIXED]))
def test_raw_round_trip(data, level, strategy):
    got, n_blocks = inflate_raw(deflate_raw(data, level, strategy))
    assert got == data
    assert n_blocks >= 1


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=4000), st.sampled_from([0, 6, 9]))
def test_zlib_round_trip(data, level):
    got, _ = inflate_zlib(deflate_zlib(data, level))
    assert got == data


def test_multi_block_stored_and_long_matches():
    big = b"The quick brown fox jumps over the lazy dog. " * 8000
    payload, n_blocks = inflate_raw(deflate_raw(big, 0))
    assert payload == big
    assert n_blocks > 1  # > 64 KiB forces multiple stored blocks
    assert inflate_raw(deflate_raw(big, 9))[0] == big


def test_overlapping_back_reference():
    # dist=1, length up to 258: the match copies its own output
    data = b"a" * 1000 + b"bc" * 500
    assert inflate_raw(deflate_raw(data, 9))[0] == data


# ---------------------------------------------------------------------------
# RFC 1950 wrapper gates
# ---------------------------------------------------------------------------

def test_zlib_gates():
    good = deflate_zlib(b"payload bytes" * 10)
    bad = good[:-1] + bytes([good[-1] ^ 0xFF])
    assert _err(bad, inflate_zlib) == "adler32 mismatch"
    assert _err(bytes([0x79]) + good[1:], inflate_zlib) == (
        "unsupported zlib compression method"
    )
    assert _err(bytes([0x88]) + good[1:], inflate_zlib) == (
        "zlib window size too large"
    )
    assert _err(good[:1] + bytes([good[1] ^ 0x01]) + good[2:],
                inflate_zlib) == "bad zlib header check"
    # FDICT set (and FCHECK recomputed so the header check passes)
    cmf = good[0]
    flg = good[1] | 0x20
    flg = (flg & 0xE0) | ((31 - (cmf * 256 + (flg & 0xE0)) % 31) % 31)
    assert _err(bytes([cmf, flg]) + good[2:], inflate_zlib) == (
        "preset dictionary not supported"
    )
    assert _err(b"\x78\x9c", inflate_zlib) == "zlib stream too short"


# ---------------------------------------------------------------------------
# handcrafted corners
# ---------------------------------------------------------------------------

def test_handcrafted_stored_block():
    w = _BitWriter()
    w.bits(1, 1)  # BFINAL
    w.bits(0, 2)  # stored
    buf = bytearray(w.bytes_())
    buf += (3).to_bytes(2, "little") + (0xFFFC).to_bytes(2, "little")
    buf += b"abc"
    assert inflate_raw(bytes(buf)) == (b"abc", 1)


def test_bad_block_type():
    assert _err(b"\x06") == "bad block type"


def test_stored_length_mismatch():
    assert _err(b"\x01\x05\x00\x00\x00") == "stored length mismatch"


def test_distance_too_far():
    w = _BitWriter()
    w.bits(1, 1)
    w.bits(1, 2)          # fixed
    w.code(0x30 + 65, 8)  # literal 'A'
    w.code(1, 7)          # length symbol 257 -> length 3
    w.code(4, 5)          # distance symbol 4 -> base 5, 1 extra bit
    w.bits(0, 1)          # extra -> distance 5 > 1 byte of output
    assert _err(w.bytes_()) == "distance too far back"


def test_unassigned_fixed_distance_code():
    w = _BitWriter()
    w.bits(1, 1)
    w.bits(1, 2)
    w.code(0x30 + 66, 8)  # literal 'B'
    w.code(1, 7)          # length 3
    w.code(30, 5)         # distance code 30: unassigned in fixed table
    data = w.bytes_() + b"\xff\xff"  # padding so the probe isn't EOS
    assert _err(data) == "invalid distance code"


def test_oversubscribed_code_length_code():
    w = _BitWriter()
    w.bits(1, 1)
    w.bits(2, 2)   # dynamic
    w.bits(0, 5)   # HLIT = 257
    w.bits(0, 5)   # HDIST = 1
    w.bits(0, 4)   # HCLEN = 4 -> lengths for syms 16,17,18,0
    for _ in range(4):
        w.bits(1, 3)  # four 1-bit codes: oversubscribed
    assert _err(w.bytes_()) == "oversubscribed code-length code lengths"


def test_repeat_with_no_previous_length():
    w = _BitWriter()
    w.bits(1, 1)
    w.bits(2, 2)
    w.bits(0, 5)
    w.bits(0, 5)
    w.bits(0, 4)      # HCLEN=4: syms 16,17,18,0
    w.bits(1, 3)      # len(16)=1
    w.bits(0, 3)      # len(17)=0
    w.bits(1, 3)      # len(18)=1
    w.bits(0, 3)      # len(0)=0
    w.code(0, 1)      # first CL symbol = 16: repeat, nothing before it
    assert _err(w.bytes_()) == "repeat with no previous length"


def test_incomplete_literal_table():
    w = _BitWriter()
    w.bits(1, 1)
    w.bits(2, 2)
    w.bits(0, 5)       # HLIT = 257
    w.bits(0, 5)       # HDIST = 1
    w.bits(12, 4)      # HCLEN = 16 -> through order index 15 (sym 2)
    # order: 16,17,18,0,8,7,9,6,10,5,11,4,12,3,13,2
    cl = {18: 1, 0: 2, 2: 2}
    for sym in (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2):
        w.bits(cl.get(sym, 0), 3)
    # canonical: sym18 -> 0 (1 bit); sym0 -> 10, sym2 -> 11 (2 bits)
    w.code(3, 2)       # lit length[0] = 2
    w.code(3, 2)       # lit length[1] = 2
    w.code(0, 1)       # 18: zero run
    w.bits(127, 7)     # 138 zeros
    w.code(0, 1)       # 18: zero run
    w.bits(107, 7)     # 118 zeros -> 2 + 138 + 118 = 258 = HLIT + HDIST
    assert _err(w.bytes_()) == "incomplete literal/length code lengths"


def test_fuzz_never_raises_uncaught():
    rng = random.Random(77)
    for level, strategy in [(9, zlib.Z_DEFAULT_STRATEGY), (0, 0),
                            (9, zlib.Z_FIXED)]:
        base = deflate_raw(b"fuzz target content " * 30, level, strategy)
        for _ in range(200):
            m = bytearray(base)
            for _ in range(rng.randint(1, 8)):
                m[rng.randrange(len(m))] = rng.randrange(256)
            try:
                inflate_raw(bytes(m))
            except InflateError:
                pass


def test_output_cap():
    # 50 MiB of zeros against a 1 MiB cap — the guard, not memory, stops it
    enc = deflate_raw(b"\x00" * (50 << 20), 9)
    with pytest.raises(InflateError, match="output size cap"):
        inflate_raw(enc, max_out=1 << 20)
