"""EXIF walker (operators/exif_real.py): inner-TIFF round-trip both
byte orders, offset-relativity, SOS scan stop, poisons, fuzz."""

import random
import struct

from cies_ocr_java_spark.operators.exif_real import (
    build_exif_jpeg,
    build_exif_tiff,
    parse_exif,
)


def _mk(i, **kw):
    t = build_exif_tiff(
        make=f"Graft-{i % 5}", model=f"Cam {i % 9}",
        orientation=1 + i % 8, xres=72 * (1 + i % 3),
        datetime_orig=(f"2024:{1 + i % 12:02d}:{1 + i % 28:02d} "
                       f"{i % 24:02d}:00:00"),
        pix_x=640 + 16 * (i % 7), pix_y=480 + 8 * (i % 5),
        big_endian=i % 2 == 1, **kw)
    return build_exif_jpeg(t)


def test_round_trip_both_byte_orders():
    for i in [0, 1, 2, 3, 7, 11, 26]:
        m = parse_exif(_mk(i))
        assert m["error"] is None
        assert m["byte_order"] == ("MM" if i % 2 else "II")
        assert m["make"] == f"Graft-{i % 5}"
        assert m["orientation"] == 1 + i % 8
        assert m["xres"] == 72 * (1 + i % 3)
        assert m["pix_x"] == 640 + 16 * (i % 7)
        assert m["datetime_orig"].startswith("2024:")


def test_offsets_relative_to_inner_tiff_not_file():
    """Prepending extra JPEG segments before APP1 shifts the blob's
    file position; decoded values must be unchanged (offsets are
    TIFF-relative)."""
    t = build_exif_tiff("A", "B", 3, 144, "2024:01:01 00:00:00",
                        640, 480)
    plain = build_exif_jpeg(t)
    com = b"\xFF\xFE" + struct.pack(">H", 30) + b"x" * 28
    shifted = plain[:2] + com + plain[2:]
    a, b = parse_exif(plain), parse_exif(shifted)
    assert a == b and a["error"] is None


def test_scan_stops_at_sos():
    """An Exif-looking byte run INSIDE entropy data must not be
    parsed — the walk ends at SOS."""
    m = parse_exif(b"\xFF\xD8\xFF\xDA\x00\x04\x00\x00"
                   b"\xFF\xE1\x00\x20Exif\x00\x00garbage\xFF\xD9")
    assert m["error"] == "no exif app1 segment"


def test_poison_tiers():
    assert parse_exif(_mk(3, bad_exif_ptr=True))["error"] \
        == "exif ifd out of bounds"
    assert parse_exif(_mk(3, bad_value_off=True))["error"] \
        == "tag 282 value out of bounds"
    assert parse_exif(None)["error"] == "not a jpeg"
    assert parse_exif(b"\xFF\xD8\xFF\xE0\x00\x04\x00\x00\xFF\xD9")[
        "error"] == "no exif app1 segment"


def test_fuzz_never_raises():
    rng = random.Random(5)
    base = _mk(6)
    for _ in range(500):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        m = parse_exif(bytes(x[:rng.randrange(len(x) + 1)]))
        assert "error" in m
