"""Roaring walker (operators/roaring_real.py): hybrid containers
around the 4096 crossover, redundant-offset verification, popcount
gate, fuzz."""

import random
import struct

from cies_ocr_java_spark.operators.roaring_real import (
    build_roaring,
    parse_roaring,
)


def _mk(i, **kw):
    na = 10 + i % 20
    arr = [601 * j + i % 601 for j in range(na)]
    bm = [13 * j + i % 13 for j in range(4800)]
    return build_roaring([(0, arr), (1, bm)], **kw), arr, bm


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 7, 12]:
        b, arr, bm = _mk(i)
        r = parse_roaring(b)
        assert r["error"] is None
        assert r["cardinality"] == len(arr) + len(bm)
        assert r["vmin"] == arr[0]
        assert r["vmax"] == 65536 + bm[-1]
        assert r["value_sum"] == sum(arr) \
            + sum(65536 + v for v in bm)
        assert (r["n_array"], r["n_bitmap"]) == (1, 1)


def test_crossover_is_the_format():
    """4096 values fit an array; 4097 must be a bitmap — the
    serializer picks by cardinality and the parser accepts both."""
    small = build_roaring([(0, list(range(4096)))])
    big = build_roaring([(0, list(range(4097)))])
    assert parse_roaring(small)["n_array"] == 1
    assert parse_roaring(big)["n_bitmap"] == 1
    assert len(big) - len(small) == 8192 - 2 * 4096


def test_offset_and_order_gates():
    assert parse_roaring(_mk(3, lie_offset=True)[0])["error"] \
        == "container 1 offset mismatch"
    assert parse_roaring(_mk(3, unsorted=True)[0])["error"] \
        == "container 0 array not sorted"
    # popcount disagreement: clear one bitmap bit
    b, arr, _bm = _mk(2)
    # bitmap container follows the array container
    body_at = 8 + 4 * 2 + 4 * 2
    bm_at = body_at + 2 * len(arr)
    bad = bytearray(b)
    # find a set byte and clear one bit
    for k in range(bm_at, bm_at + 8192):
        if bad[k]:
            bad[k] &= bad[k] - 1
            break
    assert "popcount disagrees" in parse_roaring(bytes(bad))["error"]
    assert parse_roaring(None)["error"] == "short or missing bitmap"
    assert parse_roaring(struct.pack("<II", 12345, 0))["error"] \
        == "unsupported cookie 12345"


def test_fuzz_never_raises():
    rng = random.Random(139)
    base, *_ = _mk(5)
    for _ in range(300):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert parse_roaring(blob) is not None
