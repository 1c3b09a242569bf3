"""regf hive walker (operators/regf_real.py): XOR-32 base-block
checksum, sequence-number torn-write flag, sign-encoded cells,
inline-data bit 31, lf hash verification, gates, fuzz."""

import random

from cies_ocr_java_spark.operators.regf_real import (
    build_regf,
    parse_regf,
)


def _keys(i):
    keys = []
    for k in range(1 + i % 3):
        vals = []
        for v in range(1 + (i + k) % 3):
            if (i + v) % 2 == 0:
                vals.append((f"dw{v}", 4, 1000 + i * 7 + v * 13))
            else:
                vals.append((f"s{v}", 1,
                             bytes((i + v + t) % 256
                                   for t in range(5 + (i + v) % 20))))
        keys.append((f"Key{k}", vals))
    return keys


def test_round_trip_sweep():
    for i in range(40):
        keys = _keys(i)
        r = parse_regf(build_regf(keys, torn_write=i % 5 == 0))
        assert r["error"] is None, (i, r)
        assert r["n_keys"] == 1 + len(keys)
        assert r["n_values"] == sum(len(v) for _, v in keys)
        assert r["inline_values"] == sum(
            1 for _, vs in keys for _, _, d in vs
            if isinstance(d, int))
        assert r["dword_sum"] == sum(
            d for _, vs in keys for _, _, d in vs
            if isinstance(d, int))
        assert r["torn"] == (1 if i % 5 == 0 else 0)


def test_torn_write_is_a_flag_not_an_error():
    r = parse_regf(build_regf(_keys(2), torn_write=True))
    assert r["error"] is None and r["torn"] == 1


def test_gates():
    keys = _keys(3)
    assert parse_regf(build_regf(keys, bad_checksum=True)) \
        ["error"] == "base block checksum mismatch"
    assert parse_regf(build_regf(keys, bad_hash=True))["error"] \
        == "subkey hash disagrees with name"
    assert parse_regf(build_regf(keys, free_subkey=True)) \
        ["error"] == "reference into a free cell"
    assert parse_regf(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0x4E67)
    base = build_regf(_keys(5))
    for _ in range(400):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_regf(blob)
