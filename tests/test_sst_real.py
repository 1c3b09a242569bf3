"""SSTable walker (operators/sst_real.py) + Snappy codec
(operators/snappy_real.py): prefix reconstruction, masked crc32c,
restart discipline, snappy round trips, fuzz."""

import hashlib
import random

import pytest

from cies_ocr_java_spark.operators.snappy_real import (
    snappy_compress,
    snappy_decompress,
)
from cies_ocr_java_spark.operators.sst_real import (
    build_block,
    build_sst,
    crc32c,
    mask_crc,
    parse_block,
    parse_sst,
    unmask_crc,
)


def test_snappy_round_trip():
    rng = random.Random(42)
    cases = [b"", b"a", b"hello world hello world hello world",
             b"a" * 1000, bytes(range(256)) * 5,
             b"The quick brown fox. " * 200,
             bytes(rng.randrange(256) for _ in range(4000))]
    for c in cases:
        assert snappy_decompress(snappy_compress(c)) == c
    # repetitive input genuinely compresses
    assert len(snappy_compress(b"x" * 10000)) < 1000


def test_snappy_gates():
    z = snappy_compress(b"abcabcabc" * 20)
    with pytest.raises(ValueError):
        snappy_decompress(z[:-2])
    with pytest.raises(ValueError, match="zero copy offset"):
        snappy_decompress(b"\x04\x02\x00\x00\x00")
    rng = random.Random(7)
    for _ in range(400):
        x = bytearray(z)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        try:
            snappy_decompress(bytes(x[:rng.randrange(len(x) + 1)]))
        except ValueError:
            pass


def test_crc32c_vector_and_mask():
    assert crc32c(b"123456789") == 0xE3069283  # the canonical check
    for v in (0, 1, 0xDEADBEEF, 0xFFFFFFFF):
        assert unmask_crc(mask_crc(v)) == v


def test_block_prefix_reconstruction():
    entries = [(b"apple:001", b"v1"), (b"apple:002", b"v2"),
               (b"apple:010", b"v3"), (b"banana:001", b"v4"),
               (b"banana:002", b"v5")]
    got, nr = parse_block(build_block(entries))
    assert got == entries
    assert nr == 2  # restart every 4 entries
    # shared-prefix-exceeds-previous is corruption
    raw = bytearray(build_block(entries))
    raw[0] = 50  # first entry claims a 50-byte shared prefix
    with pytest.raises(ValueError, match="shared prefix"):
        parse_block(bytes(raw))


def test_sst_round_trip():
    for i in [0, 1, 2, 3, 7, 12]:
        ne = 6 + i % 5
        kvs = [(f"k{i % 7}:{j:03d}".encode(),
                (f"v{i}:{j}" * (1 + (i + j) % 3)).encode())
               for j in range(ne)]
        r = parse_sst(build_sst(kvs, 4, compress=i % 2 == 0))
        assert r["error"] is None
        assert r["n_entries"] == ne
        assert r["n_blocks"] == -(-ne // 4)
        assert r["keys_md5"] == hashlib.md5(
            b"".join(k for k, _v in kvs)).hexdigest()
        assert r["compression"] == ("snappy" if i % 2 == 0
                                    else "none")


def test_sst_gates_and_fuzz():
    kvs = [(b"k:%03d" % j, b"val%d" % j) for j in range(9)]
    assert parse_sst(build_sst(kvs, 4, bad_crc=True))["error"] \
        == "data block crc mismatch"
    assert parse_sst(build_sst(kvs, 4, bad_magic=True))["error"] \
        == "bad sst magic"
    assert parse_sst(None)["error"] == "table too short"
    rng = random.Random(101)
    base = build_sst(kvs, 4, compress=True)
    for _ in range(400):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_sst(blob)
