"""xz walker (operators/xz_real.py): stdlib interop across all four
check types, CRC64 vector pin, envelope gates, LZMA2 chunk protocol,
fuzz-never-raises."""

import lzma
import random

import pytest

from cies_ocr_java_spark.operators.xz_real import (
    crc64_xz,
    parse_xz_doc,
    xz_decode,
)


def test_crc64_xz_vector():
    """The canonical check value for the reflected ECMA-182 CRC64."""
    assert crc64_xz(b"123456789") == 0x995DC9BBDF1939FA
    assert crc64_xz(b"") == 0


def test_stdlib_interop_all_checks():
    rng = random.Random(42)
    cases = [
        b"", b"hello world\n", b"a" * 1000, bytes(range(256)) * 10,
        b"The quick brown fox jumps over the lazy dog. " * 300,
        bytes(rng.randrange(256) for _ in range(5000)),
    ]
    for check, name in [(lzma.CHECK_CRC32, "crc32"),
                        (lzma.CHECK_CRC64, "crc64"),
                        (lzma.CHECK_SHA256, "sha256"),
                        (lzma.CHECK_NONE, "none")]:
        for c in cases:
            z = lzma.compress(c, format=lzma.FORMAT_XZ, check=check)
            out, facts = xz_decode(z)
            assert out == c
            assert facts["check_type"] == name


def test_mid_block_dict_reset_keeps_block_prefix():
    """Round-3 advice item: a mid-block dictionary reset (ctrl 0x01 /
    reset==3) must NOT clear the block's output accumulator — the
    window-base fence makes earlier bytes invisible to distances while
    keeping them in the payload. Chunk 1 is a handcrafted uncompressed
    dict-reset chunk; chunk 2 is stdlib liblzma's raw LZMA2 output,
    whose first chunk is a genuine reset==3 COMPRESSED chunk — so the
    reset fires mid-block with a non-empty accumulator."""
    import struct
    from cies_ocr_java_spark.operators.xz_real import _decode_lzma2

    pre = b"hello world, first chunk bytes "
    chunk1 = bytes([0x01]) + struct.pack(">H", len(pre) - 1) + pre
    tail = b"second chunk after mid-block dict reset" * 3
    raw = lzma.compress(
        tail, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}])
    assert raw[0] >> 5 == 0x07  # reset==3: props+state+dict reset
    data = chunk1 + raw
    payload, nxt, n_chunks = _decode_lzma2(data, 0, len(data), 1 << 20)
    assert payload == pre + tail
    assert nxt == len(data)
    assert n_chunks == 2


def test_check_actually_gates():
    """Flipping one decoded-payload bit inside the compressed stream
    must be caught by SOME gate (chunk size, range coder, or the
    block check) — never returned as wrong bytes."""
    c = b"payload " * 200
    z = bytearray(lzma.compress(c, format=lzma.FORMAT_XZ,
                                check=lzma.CHECK_CRC64))
    z[40] ^= 0x01  # inside the first LZMA chunk
    with pytest.raises(ValueError):
        xz_decode(bytes(z))


def test_envelope_gates():
    z = lzma.compress(b"x" * 500, format=lzma.FORMAT_XZ)
    assert parse_xz_doc(z[:-1] + bytes([z[-1] ^ 0xFF]))["error"] \
        == "bad footer magic"
    assert parse_xz_doc(z[:8] + bytes([z[8] ^ 0xFF]) + z[9:])["error"] \
        == "stream header crc mismatch"
    assert parse_xz_doc(None)["error"] == "short or missing payload"
    assert parse_xz_doc(b"\xfd7zXY\x00" + z[6:])["error"] \
        == "bad xz magic"
    # footer flags must EQUAL header flags
    bad = bytearray(z)
    bad[-4] ^= 0x05  # check-id byte inside the footer flags
    err = parse_xz_doc(bytes(bad))["error"]
    assert err in ("footer flags disagree with header",
                   "stream footer crc mismatch")


def test_fuzz_never_raises():
    rng = random.Random(7)
    z = lzma.compress(b"Fuzz target content. " * 100,
                      format=lzma.FORMAT_XZ, check=lzma.CHECK_CRC64)
    for _ in range(400):
        x = bytearray(z)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_xz_doc(blob)
