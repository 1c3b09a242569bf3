"""glyf outline walker (operators/glyf_real.py): short/long loca,
empty glyphs, repeat-flag decompression, delta coordinates, bbox
cross-check, whole-font checksum, gates, fuzz."""

import random

from cies_ocr_java_spark.operators.glyf_real import (
    build_glyf_font,
    parse_glyf_font,
)


def _rect(w, h, off=0):
    return [(off, off), (w + off, off), (w + off, h + off),
            (off, h + off)]


_GLYPHS = [None, [_rect(120, 80)],
           [_rect(150, 60), _rect(10, 10, 10)], None,
           [_rect(700, 300)]]


def test_round_trip_both_loca_formats():
    for ll in (False, True):
        r = parse_glyf_font(build_glyf_font(_GLYPHS, long_loca=ll))
        assert r["error"] is None
        assert (r["n_glyphs"], r["n_empty"]) == (5, 2)
        assert r["n_contours"] == 4
        assert r["n_points"] == 16
        assert r["x_extent_sum"] == 120 + 150 + 700
        assert r["long_loca"] == (1 if ll else 0)


def test_empty_glyph_is_zero_bytes_not_zero_contours():
    r = parse_glyf_font(build_glyf_font([None, None,
                                         [_rect(10, 10)]]))
    assert r["error"] is None
    assert (r["n_empty"], r["n_contours"]) == (2, 1)


def test_repeat_flag_decompression():
    # a staircase gives identical flag bytes -> one REPEAT run
    stair = [[(0, 0), (10, 10), (20, 20), (30, 30), (40, 40),
              (50, 50)]]
    r = parse_glyf_font(build_glyf_font([stair]))
    assert r["error"] is None
    assert r["n_repeat_flags"] == 1
    assert r["abs_delta_sum"] == 100


def test_long_deltas():
    # |delta| > 255 forces the 16-bit coordinate form
    big = [[(0, 0), (600, 0), (600, 400), (0, 400)]]
    r = parse_glyf_font(build_glyf_font([big]))
    assert r["error"] is None
    assert r["x_extent_sum"] == 600


def test_gates():
    assert parse_glyf_font(build_glyf_font(
        _GLYPHS, lie_bbox=True))["error"] \
        == "bbox disagrees with points"
    assert parse_glyf_font(build_glyf_font(
        _GLYPHS, break_loca=True))["error"] == "loca not monotonic"
    assert parse_glyf_font(build_glyf_font(
        _GLYPHS, chop_glyf=4))["error"] == "loca past glyf end"
    assert parse_glyf_font(None)["error"] \
        == "short or missing payload"


def test_any_single_byte_flip_is_caught():
    # the sfnt checksum net: per-table sums + the whole-file
    # 0xB1B0AFBA rule catch every flip somewhere
    rng = random.Random(0x91F)
    base = build_glyf_font(_GLYPHS)
    for _ in range(300):
        x = bytearray(base)
        k = rng.randrange(len(x))
        x[k] = (x[k] + rng.randrange(1, 256)) % 256
        assert parse_glyf_font(bytes(x))["error"] is not None


def test_fuzz_never_raises():
    rng = random.Random(0x920)
    base = build_glyf_font(_GLYPHS, long_loca=True)
    for _ in range(300):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.4 else bytes(x))
        assert "error" in parse_glyf_font(blob)
