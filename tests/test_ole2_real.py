"""OLE2/CFB walker (operators/ole2_real.py): two-level FAT/miniFAT
indirection, mini-stream residency at the 4096 cutoff, chain
exactness, directory tree walk, gates, fuzz."""

import random

from cies_ocr_java_spark.operators.ole2_real import (
    build_cfb,
    parse_cfb,
)


def _streams(i):
    out = []
    for j in range(1 + i % 3):
        sz = 20 + (i + 13 * j) % 61
        v = (i * 3 + j * 5) % 251
        out.append((f"mini{j}",
                    2 if (i % 2 == 0 and j == 0) else 1,
                    bytes([v]) * sz))
    for j in range(1 + i % 2):
        sz = 4096 + 512 * ((i + j) % 3)
        v = (i * 7 + j * 11) % 251
        out.append((f"big{j}", 1, bytes([v]) * sz))
    return out


def test_round_trip_sweep():
    for i in range(50):
        st = _streams(i)
        r = parse_cfb(build_cfb(st))
        assert r["error"] is None, (i, r)
        assert r["n_streams"] == len(st)
        assert r["n_mini"] == sum(1 for _, _, c in st
                                  if len(c) < 4096)
        assert r["stream_bytes"] == sum(len(c) for _, _, c in st)
        assert r["content_sum"] == sum(sum(c) for _, _, c in st)
        has_sub = any(d == 2 for _, d, _ in st)
        assert r["n_storages"] == (1 if has_sub else 0)
        assert r["max_depth"] == (2 if has_sub else 1)


def test_cutoff_boundary():
    # 4095 bytes -> mini stream, 4096 -> regular sectors
    below = [("s", 1, b"\x01" * 4095)]
    at = [("s", 1, b"\x01" * 4096)]
    rb = parse_cfb(build_cfb(below))
    ra = parse_cfb(build_cfb(at))
    assert rb["error"] is None and ra["error"] is None
    assert (rb["n_mini"], ra["n_mini"]) == (1, 0)
    assert rb["content_sum"] == 4095
    assert ra["content_sum"] == 4096


def test_gates():
    st = _streams(3)
    assert parse_cfb(build_cfb(st, bad_magic=True))["error"] \
        == "bad magic"
    assert parse_cfb(build_cfb(st, cycle_fat=True))["error"] \
        == "fat chain cycle"
    assert parse_cfb(build_cfb(st, lying_size=True))["error"] \
        == "stream size overruns chain"
    assert parse_cfb(build_cfb(st, chop=100))["error"] \
        == "file not sector aligned"
    assert parse_cfb(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0xCFB)
    base = build_cfb(_streams(5))
    for _ in range(300):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_cfb(blob)
