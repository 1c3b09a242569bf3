"""QOI codec (operators/qoi_real.py): encode->decode round trip over
all op kinds, running-index agreement, gates, fuzz."""

import random

from cies_ocr_java_spark.operators.qoi_real import (
    build_qoi,
    parse_qoi,
)


def _rand_pixels(rng, n):
    px = []
    for _ in range(n):
        if px and rng.random() < 0.4:
            px.append(px[-1])  # runs
        elif px and rng.random() < 0.3:
            r, g, b, a = px[-1]  # small deltas -> DIFF/LUMA
            px.append((
                (r + rng.randrange(-2, 2)) % 256,
                (g + rng.randrange(-2, 2)) % 256,
                (b + rng.randrange(-2, 2)) % 256, a))
        else:
            px.append((rng.randrange(256), rng.randrange(256),
                       rng.randrange(256),
                       rng.randrange(256) if rng.random() < 0.3
                       else 255))
    return px


def test_round_trip_property_all_op_kinds():
    rng = random.Random(0x901F)
    for _ in range(300):
        w, h = rng.randrange(1, 14), rng.randrange(1, 11)
        px = _rand_pixels(rng, w * h)
        r = parse_qoi(build_qoi(w, h, px))
        assert r["error"] is None
        assert (r["width"], r["height"]) == (w, h)
        assert r["px_sum"] == sum(sum(p) for p in px)


def test_long_run_split_at_62():
    # 130 identical pixels needs runs 62+62+6; prev starts (0,0,0,255)
    px = [(0, 0, 0, 255)] * 130
    r = parse_qoi(build_qoi(13, 10, px))
    assert r["error"] is None
    assert r["px_sum"] == 130 * 255
    assert r["n_ops"] == 3


def test_gates():
    px = [(9, 8, 7, 255), (1, 2, 3, 255), (200, 3, 9, 255),
          (5, 5, 5, 254)]
    assert parse_qoi(build_qoi(2, 2, px, bad_magic=True))["error"] \
        == "bad magic"
    assert parse_qoi(build_qoi(2, 2, px, chop_marker=True))["error"] \
        == "missing end marker"
    assert parse_qoi(build_qoi(2, 2, px, lying_run=True))["error"] \
        == "run overruns image"
    assert parse_qoi(build_qoi(2, 2, px, trailing=b"x"))["error"] \
        == "trailing bytes after end marker"
    assert parse_qoi(build_qoi(2, 2, px, channels=5))["error"] \
        == "bad channel count"
    assert parse_qoi(build_qoi(2, 2, px, colorspace=9))["error"] \
        == "bad colorspace"
    assert parse_qoi(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0x901E)
    base = build_qoi(6, 5, _rand_pixels(rng, 30))
    for _ in range(500):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_qoi(blob)
