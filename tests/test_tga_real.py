"""TGA decoder (operators/tga_real.py): RLE count-minus-one packets,
origin-bit row order, footer exclusion, gates, fuzz."""

import random

from cies_ocr_java_spark.operators.tga_real import (
    build_tga,
    parse_tga,
)


def _rand_pixels(rng, n):
    px = []
    for _ in range(n):
        if px and rng.random() < 0.4:
            px.append(px[-1])
        else:
            px.append((rng.randrange(256), rng.randrange(256),
                       rng.randrange(256),
                       rng.randrange(256) if rng.random() < 0.3
                       else 255))
    return px


def test_round_trip_all_variants():
    rng = random.Random(0x76A)
    for _ in range(120):
        w, h = rng.randrange(1, 12), rng.randrange(1, 9)
        depth = rng.choice((24, 32))
        px = _rand_pixels(rng, w * h)
        if depth == 24:
            px = [(r, g, b, 255) for r, g, b, _ in px]
        r = parse_tga(build_tga(
            w, h, px, rle=rng.random() < 0.5, depth=depth,
            top_left=rng.random() < 0.5,
            image_id=b"id" * rng.randrange(3),
            footer=rng.random() < 0.5))
        assert r["error"] is None
        assert (r["width"], r["height"], r["depth"]) == (w, h, depth)
        assert r["px_sum"] == sum(sum(p) for p in px)
        assert r["row0_sum"] == sum(sum(p) for p in px[:w])


def test_origin_bit_flips_row0_not_total():
    px = [(i, 0, 0, 255) for i in range(6)]  # rows [0,1,2],[3,4,5]
    tl = parse_tga(build_tga(3, 2, px, top_left=True))
    bl = parse_tga(build_tga(3, 2, px, top_left=False))
    # both store the SAME logical image; row 0 is always the top row
    assert tl["row0_sum"] == bl["row0_sum"] \
        == (0 + 1 + 2) + 3 * 255
    assert tl["px_sum"] == bl["px_sum"]
    # but flipping the bit WITHOUT reordering rows moves row 0
    raw = bytearray(build_tga(3, 2, px, top_left=True))
    raw[17] = 0x00  # claim bottom-left on top-down data
    flipped = parse_tga(bytes(raw))
    assert flipped["row0_sum"] == (3 + 4 + 5) + 3 * 255


def test_gates():
    px = [(i, 2 * i, 3 * i, 255) for i in range(6)]
    assert parse_tga(build_tga(3, 2, px, bad_cmap=True))["error"] \
        == "colormap not supported for truecolor"
    assert parse_tga(build_tga(3, 2, px, bad_type=True))["error"] \
        == "unsupported image type"
    assert parse_tga(build_tga(3, 2, px, lying_rle=True))["error"] \
        == "rle run overruns image"
    assert parse_tga(build_tga(3, 2, px, rle=False,
                               chop=3))["error"] \
        == "truncated pixel data"
    assert parse_tga(build_tga(3, 2, px, rle=False, footer=False,
                               chop=0) + b"zz") \
        ["error"] == "trailing bytes after pixel data"
    assert parse_tga(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0x76B)
    base = build_tga(5, 4, _rand_pixels(rng, 20))
    for _ in range(500):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_tga(blob)
