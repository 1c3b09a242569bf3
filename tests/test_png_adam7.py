"""Adam7 codec (operators/png_adam7.py): per-pass filter contexts,
empty-pass omission, placement checksums, cross-check against the
sequential PNG codec, gates, fuzz."""

import random

from cies_ocr_java_spark.operators.multimodal import (
    build_png_pixels,
    decode_png,
)
from cies_ocr_java_spark.operators.png_adam7 import (
    build_png_adam7,
    parse_png_adam7,
)

_PASSES = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
           (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def test_property_matches_sequential_codec():
    rng = random.Random(0xADA7)
    for _ in range(80):
        w, h = rng.randrange(1, 20), rng.randrange(1, 18)
        rows = [bytes(rng.randrange(256) for _ in range(w))
                for _ in range(h)]
        r = parse_png_adam7(build_png_adam7(rows))
        assert r["error"] is None
        assert r["ink_sum"] == sum(sum(x) for x in rows)
        assert r["row0_sum"] == sum(rows[0])
        assert r["col0_sum"] == sum(x[0] for x in rows)
        seq = decode_png(build_png_pixels(rows))
        assert seq["ink_sum"] == r["ink_sum"]


def test_empty_passes_for_small_geometries():
    for w, h in ((1, 1), (3, 3), (4, 4), (5, 1), (1, 5), (8, 8)):
        rows = [bytes((x + y) % 256 for x in range(w))
                for y in range(h)]
        r = parse_png_adam7(build_png_adam7(rows))
        assert r["error"] is None, (w, h)
        exp = 0
        for x0, y0, dx, dy in _PASSES:
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            exp += 1 if pw and ph else 0
        assert r["n_passes"] == exp, (w, h)


def test_gates():
    rows = [bytes((x * 7 + y * 13) % 256 for x in range(12))
            for y in range(10)]
    assert parse_png_adam7(build_png_adam7(
        rows, drop_scanline=True))["error"] \
        == "interlaced data size mismatch"
    assert parse_png_adam7(build_png_adam7(
        rows, bad_filter=True))["error"] == "unknown filter type 7"
    assert parse_png_adam7(build_png_adam7(
        rows, bad_idat_crc=True))["error"] == "crc mismatch in IDAT"
    # the sequential decoder must keep rejecting interlace=1 by name
    assert decode_png(build_png_adam7(rows))["error"] \
        == "unsupported compression/filter/interlace"
    assert parse_png_adam7(build_png_pixels(rows))["error"] \
        == "not interlaced"
    assert parse_png_adam7(None)["error"] \
        == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0xADA8)
    rows = [bytes((x * 7 + y * 13) % 256 for x in range(12))
            for y in range(10)]
    base = build_png_adam7(rows)
    for _ in range(400):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_png_adam7(blob)
