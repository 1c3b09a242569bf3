"""FITS walker (operators/fits_real.py): card grammar, BZERO offset,
block padding, END gate, fuzz."""

import random

from cies_ocr_java_spark.operators.fits_real import (
    BLOCK,
    build_fits,
    parse_fits,
)


def _mk(i, **kw):
    w, h = 4 + i % 5, 3 + i % 4
    bitpix = [8, 16, 32][i % 3]
    bzero = 32768 if (bitpix == 16 and i % 2 == 0) else 0
    m = 200 if bitpix == 8 else 60000 if bzero else 30000

    def fn(x, y):
        return (i * 37 + 11 * x + 5 * y) % m

    return build_fits(w, h, bitpix, fn, f"GRAFT-{i % 9}",
                      bzero=bzero, **kw), w, h, bitpix, bzero, fn


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 7, 12]:
        b, w, h, bitpix, bzero, fn = _mk(i)
        assert len(b) % BLOCK == 0  # everything is 2880-blocks
        r = parse_fits(b)
        assert r["error"] is None
        assert (r["bitpix"], r["width"], r["height"]) == (bitpix, w, h)
        assert r["bzero"] == bzero
        assert r["pixel_sum"] == sum(fn(x, y) for y in range(h)
                                     for x in range(w))


def test_bzero_offset_is_applied():
    """16-bit unsigned-sensor data: raw stores value-32768 signed;
    skipping BZERO yields a wildly different (negative-ish) sum."""
    b = build_fits(2, 2, 16, lambda x, y: 50000, "T", bzero=32768)
    r = parse_fits(b)
    assert r["pixel_sum"] == 4 * 50000


def test_gates():
    assert parse_fits(_mk(3, drop_end=True)[0])["error"] \
        == "header missing END card"
    assert parse_fits(_mk(3, bad_simple=True)[0])["error"] \
        == "not a conforming FITS file"
    assert parse_fits(None)["error"] == "short or missing file"
    b, *_ = _mk(2)
    assert parse_fits(b[:BLOCK])["error"] == "data array truncated"


def test_fuzz_never_raises():
    rng = random.Random(107)
    base, *_ = _mk(5)
    for _ in range(300):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_fits(blob)
