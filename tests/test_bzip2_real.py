"""bzip2 decoder (operators/bzip2_real.py): stdlib interop identity,
multi-block streams, CRC gates, RLE1 edges, fuzz-never-raises."""

import bz2
import random

import pytest

from cies_ocr_java_spark.operators.bzip2_real import (
    _bz_crc,
    bunzip2,
    parse_bzip2_doc,
)


def test_stdlib_interop_identity():
    rng = random.Random(42)
    cases = [
        b"",
        b"hello world\n",
        b"a" * 1000,                       # long RLE1 runs
        bytes(range(256)) * 10,            # full alphabet
        b"The quick brown fox. " * 400,
        bytes(rng.randrange(256) for _ in range(5000)),
    ]
    for lvl in (1, 5, 9):
        for c in cases:
            assert bunzip2(bz2.compress(c, lvl)) == c


def test_multi_block_stream_crc_combination():
    """>100k at level 1 forces multiple blocks; the stream CRC is the
    rotate-left-1-xor combination of block CRCs."""
    big = b"".join(b"doc %d line\n" % k for k in range(9000))
    assert len(big) > 100000  # two blocks at level 1
    assert bunzip2(bz2.compress(big, 1)) == big


def test_rle1_exact_run_boundaries():
    """Runs of exactly 4, 5, 259 and 260 bytes cross the RLE1
    4-equal-bytes + count-byte encoding edges."""
    for n in (3, 4, 5, 8, 251, 255, 259, 260, 600):
        data = b"x" * n + b"|tail"
        assert bunzip2(bz2.compress(data, 9)) == data


def test_crc_gates():
    z = bytearray(bz2.compress(b"payload " * 100, 9))
    # flip one bit deep in the symbol stream: either the Huffman walk
    # or the block CRC must reject it -- never a wrong answer
    z[len(z) // 2] ^= 0x10
    with pytest.raises(ValueError):
        bunzip2(bytes(z))


def test_bz_crc_discipline():
    """Unreflected CRC-32 with init/xor 0xFFFFFFFF: matches the
    published bzip2 check value family, not zlib.crc32."""
    import zlib
    assert _bz_crc(b"123456789") != zlib.crc32(b"123456789")
    assert _bz_crc(b"") == 0  # init ^ final-xor cancel on empty input


def test_structural_errors():
    assert parse_bzip2_doc(None)["error"] == "short or missing payload"
    assert parse_bzip2_doc(b"BZx1234567890")["error"] \
        == "not a bzip2 stream"
    assert parse_bzip2_doc(b"BZh01234567890")["error"] \
        == "bad bzip2 level"
    z = bz2.compress(b"text " * 50, 3)
    assert parse_bzip2_doc(z[:-4])["error"] \
        == "unexpected end of stream"
    assert parse_bzip2_doc(z[:4] + b"\x00" + z[5:])["error"] \
        == "bad block magic"


def test_fuzz_never_raises():
    rng = random.Random(7)
    # level 1: the 100k block-size cap bounds how far a corrupted
    # symbol stream can run before a gate fires
    z = bz2.compress(b"The quick brown fox jumps over the lazy dog. "
                     * 50, 1)
    for _ in range(200):
        x = bytearray(z)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_bzip2_doc(blob)
