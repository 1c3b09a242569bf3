"""LZ4 block/frame + xxHash32 (operators/lz4_real.py): published hash
vectors, block round trips including overlap RLE, frame verification
tiers, and the fuzz contract."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.lz4_real import (
    BLOCK_SIZE,
    build_lz4_frame,
    lz4_compress_block,
    lz4_decompress_block,
    parse_lz4_frame,
    xxh32,
)


def test_xxh32_published_vectors():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"", seed=1) != xxh32(b"")
    # 16-byte stripe path vs short path join
    assert xxh32(b"0123456789abcdef") != xxh32(b"0123456789abcde")


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=4000))
def test_block_round_trip(src: bytes):
    blk = lz4_compress_block(src)
    got = lz4_decompress_block(blk, 70000) if src or blk else b""
    assert got == src


def test_overlap_forward_copy_is_rle():
    # offset 1 + long match extends the single previous byte: hand-built
    # sequence [token F/F][lit 'A'... wait: 1 literal 'A', offset 1,
    # match 30] -> 'A' * 31
    blk = bytes([0x1F]) + b"A" + struct.pack("<H", 1) + bytes([30 - 15])
    blk += bytes([0x10]) + b"B"  # final literals
    out = lz4_decompress_block(blk, 1000)
    assert out == b"A" * 35 + b"B"


def test_compression_actually_compresses_repetition():
    src = b"the quick brown fox " * 50
    assert len(lz4_compress_block(src)) < len(src) // 3


@pytest.mark.parametrize(
    "blk,err",
    [
        (b"", "empty block"),
        (bytes([0x00]) + struct.pack("<H", 0), "invalid match offset"),
        (bytes([0x00]) + struct.pack("<H", 9), "invalid match offset"),
        (bytes([0x50]) + b"ab", "truncated literals"),
        # ending on a completed match is illegal: the last sequence must
        # be literals-only (spec end-of-block restrictions)
        (bytes([0x10]) + b"A" + struct.pack("<H", 1), "truncated sequence"),
        (bytes([0x00, 0x01]), "truncated match offset"),
    ],
)
def test_block_gates(blk: bytes, err: str):
    with pytest.raises(Exception, match=err):
        lz4_decompress_block(blk, 1000)


def test_frame_round_trip_multi_block():
    content = b"x" * (3 * BLOCK_SIZE + 17)
    r = parse_lz4_frame(build_lz4_frame(content))
    assert r["error"] is None
    assert r["content"] == content and r["n_blocks"] == 4


def test_incompressible_blocks_are_stored():
    rng = random.Random(3)
    content = bytes(rng.randrange(256) for _ in range(BLOCK_SIZE))
    frame = build_lz4_frame(content)
    r = parse_lz4_frame(frame)
    assert r["error"] is None and r["content"] == content
    # stored flag: high bit of the first block word
    (bword,) = struct.unpack_from("<I", frame, 15)
    assert bword & 0x80000000


@pytest.mark.parametrize(
    "poison,err",
    [
        ("header_sum", "header checksum mismatch"),
        ("block_sum", "block checksum mismatch"),
        ("bad_offset", "invalid match offset"),
        ("content_size", "content size mismatch"),
    ],
)
def test_frame_poisons(poison: str, err: str):
    r = parse_lz4_frame(build_lz4_frame(b"abc" * 200, poison=poison))
    assert r["error"] == err


def test_content_checksum_catches_block_swap():
    # two identical-checksum... simplest: flip a stored byte AND fix the
    # block checksum — the content checksum must still catch it
    rng = random.Random(5)
    content = bytes(rng.randrange(256) for _ in range(BLOCK_SIZE))
    frame = bytearray(build_lz4_frame(content))
    at = 19  # inside the stored block payload
    frame[at] ^= 0xFF
    blk = bytes(frame[19:19 + BLOCK_SIZE])
    struct.pack_into("<I", frame, 19 + BLOCK_SIZE, xxh32(blk))
    assert parse_lz4_frame(bytes(frame))["error"] == (
        "content checksum mismatch")


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300), st.integers(0, 2 ** 32 - 1))
def test_fuzz_never_raises(blob: bytes, seed: int):
    base = build_lz4_frame(b"fuzz target " * 40)
    rng = random.Random(seed)
    mode = rng.randrange(3)
    if mode == 0:
        data = blob
    elif mode == 1:
        at = rng.randrange(len(base))
        data = base[:at] + blob + base[at + len(blob):]
    else:
        data = base[: rng.randrange(len(base))]
    r = parse_lz4_frame(data)
    assert (r["error"] is None) != (r["content"] is None)
