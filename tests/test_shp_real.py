"""Shapefile walker (operators/shp_real.py): per-field endianness,
lengths in 16-bit words, sequential 1-based record numbers, bbox
envelope cross-check, part-array discipline, gates, fuzz."""

import random
import struct

from cies_ocr_java_spark.operators.shp_real import (
    build_shp,
    parse_shp,
)


def _recs(i):
    recs = []
    for k in range(2 + i % 3):
        if (i + k) % 4 == 0:
            recs.append(None)
        else:
            npts = 4 + (i + k) % 5
            pts = [(100 * k + 3 * t + i % 50,
                    200 * k + 5 * t + i % 30)
                   for t in range(npts)]
            parts = [0] if npts < 6 else [0, npts // 2]
            recs.append((pts, parts))
    return recs


def test_round_trip_sweep():
    for i in range(40):
        recs = _recs(i)
        r = parse_shp(build_shp(5, recs))
        assert r["error"] is None, (i, r)
        pts = [p for rec in recs if rec for p in rec[0]]
        assert r["n_records"] == len(recs)
        assert r["n_null"] == sum(1 for x in recs if x is None)
        assert r["n_points"] == len(pts)
        assert r["x_sum"] == sum(x for x, _ in pts)
        assert r["y_sum"] == sum(y for _, y in pts)


def test_bbox_envelope_cross_check():
    # shift one coordinate after building: bbox no longer covers
    recs = [([(0, 0), (10, 0), (10, 10), (0, 10)], [0])]
    raw = bytearray(build_shp(5, recs))
    # last point's y (LE f64) is the final 8 bytes
    struct.pack_into("<d", raw, len(raw) - 8, 99.0)
    assert parse_shp(bytes(raw))["error"] \
        == "header bbox disagrees with envelope"


def test_gates():
    recs = _recs(3)
    assert parse_shp(build_shp(5, recs, lie_file_len=True)) \
        ["error"] == "declared length disagrees with file"
    assert parse_shp(build_shp(5, recs, break_seq=True)) \
        ["error"] == "record numbers not sequential"
    assert parse_shp(build_shp(5, recs, mixed_type=True)) \
        ["error"] == "shape type disagrees with header"
    assert parse_shp(build_shp(5, recs, chop=6))["error"] \
        == "declared length disagrees with file"
    assert parse_shp(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0x54A)
    base = build_shp(5, _recs(7))
    for _ in range(400):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_shp(blob)


def test_non_finite_coordinate_degrades():
    """int() on an inf coordinate raised OverflowError past the
    ValueError net — must degrade to an error row."""
    pts = [(10, 20), (30, 40), (50, 60), (70, 80)]
    base = build_shp(5, [(pts, [0])])
    for v in (float("inf"), float("-inf"), float("nan")):
        needle = struct.pack("<2d", 30.0, 40.0)
        patched = base.replace(needle,
                               struct.pack("<2d", v, 40.0))
        assert patched != base
        r = parse_shp(patched)
        assert r["error"] == "non-finite value", (v, r)
