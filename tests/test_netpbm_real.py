"""netpbm codec (operators/netpbm_real.py): tokenized headers with
comments, 8/16-bit samples, exact-raster gates, fuzz."""

import random

from cies_ocr_java_spark.operators.netpbm_real import (
    build_ppm,
    decode_ppm,
)


def _mk(i, **kw):
    w, h = 4 + i % 5, 3 + i % 4
    gray = i % 2 == 1
    maxval = 65535 if i % 5 == 0 else 255
    if gray:
        def fn(x, y):
            return (i + 3 * x + 7 * y) % (maxval + 1)
    else:
        def fn(x, y):
            return ((i + x) % (maxval + 1), (i + y) % (maxval + 1),
                    (i + x + y) % (maxval + 1))
    return build_ppm(w, h, fn, gray=gray, maxval=maxval,
                     comments=1 + i % 2, **kw), w, h, gray, maxval, fn


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 5, 7, 12]:
        b, w, h, gray, maxval, fn = _mk(i)
        r = decode_ppm(b)
        assert r["error"] is None
        assert r["kind"] == ("P5" if gray else "P6")
        assert (r["width"], r["height"], r["maxval"]) \
            == (w, h, maxval)
        exp = sum((fn(x, y) if gray else sum(fn(x, y)))
                  for y in range(h) for x in range(w))
        assert r["sample_sum"] == exp


def test_comments_between_tokens_force_tokenizing():
    b = build_ppm(2, 2, lambda x, y: 7, gray=True, comments=2)
    r = decode_ppm(b)
    assert r["error"] is None
    assert r["n_comments"] == 2 and r["sample_sum"] == 28


def test_sixteen_bit_big_endian():
    b = build_ppm(1, 1, lambda x, y: 0x1234, gray=True, maxval=65535)
    r = decode_ppm(b)
    assert r["error"] is None and r["sample_sum"] == 0x1234


def test_exact_raster_gates():
    b, *_ = _mk(2)
    assert decode_ppm(b[:-3])["error"] == "raster truncated"
    assert decode_ppm(b + b"x")["error"] \
        == "trailing bytes after raster"
    assert decode_ppm(None)["error"] == "short or missing payload"
    assert decode_ppm(b"P7\n1 1\n255\n\x00")["error"] \
        == "bad netpbm magic"


def test_fuzz_never_raises():
    rng = random.Random(79)
    base, *_ = _mk(4)
    for _ in range(400):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in decode_ppm(blob)
