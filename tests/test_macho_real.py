"""Mach-O / cafebabe dispatch (operators/macho_real.py): the magic
collision boundaries, fat directory cross-checks, load-command walk,
fuzz."""

import random
import struct

from cies_ocr_java_spark.operators.javaclass_real import build_class
from cies_ocr_java_spark.operators.macho_real import (
    build_fat,
    build_macho,
    parse_cafebabe,
)


def _fat(i, **kw):
    u = [bytes((i * 11 + k + j) % 256 for j in range(16))
         for k in range(2)]
    slices = [
        (0x01000007, build_macho(
            0x01000007, u[0], ["/usr/lib/libSystem.B.dylib",
                               f"/lib/libgraft{i % 7}.dylib"])),
        (0x0100000C, build_macho(
            0x0100000C, u[1], ["/usr/lib/libSystem.B.dylib"])),
    ]
    return build_fat(slices, **kw), u


def test_dispatch_both_ways():
    cls = build_class("A/B", "S", [("m", "()V")], [], major=61)
    r = parse_cafebabe(cls)
    assert r["format"] == "class" and r["class_name"] == "A/B"
    fat, u = _fat(3)
    r = parse_cafebabe(fat)
    assert r["format"] == "macho-fat"
    assert r["n_archs"] == 2 and r["cputypes"] == "x86_64,arm64"
    assert r["uuids"].split(",") == [u[0].hex(), u[1].hex()]
    assert r["n_cmds"] == 4
    assert "/lib/libgraft3.dylib" in r["dylibs"]


def test_collision_boundaries():
    """value < 30 -> fat; 30..44 -> ambiguous by name; >= 45 ->
    class-version territory (Java 1.0 == 45)."""
    fat, _ = _fat(1)
    for v, expect in [(29, "fat"), (30, "ambiguous"),
                      (44, "ambiguous"), (45, "class")]:
        b = bytearray(fat)
        struct.pack_into(">I", b, 4, v)
        r = parse_cafebabe(bytes(b))
        if expect == "ambiguous":
            assert r["error"] == f"ambiguous cafebabe value {v}"
        elif expect == "class":
            # routed to the class parser, which then rejects the body
            assert r["error"] is not None \
                and r["error"].startswith("class: ")
        else:
            # arch count 29 overruns the 2-slice table
            assert r["error"] == "fat arch table overruns file"


def test_directory_cross_check():
    fat, _ = _fat(5, bad_slice_cpu=True)
    assert parse_cafebabe(fat)["error"] \
        == "slice 0 cputype disagrees with fat entry"


def test_dylib_name_inside_command():
    """LC_LOAD_DYLIB's name offset points INSIDE its own command; an
    offset past cmdsize is an error."""
    m = build_macho(0x01000007, bytes(16), ["/lib/x.dylib"])
    fat = build_fat([(0x01000007, m)])
    bad = bytearray(fat)
    # locate the LC_LOAD_DYLIB command by scanning for its cmd id
    at = bytes(fat).rindex(b"\x0c\x00\x00\x00")
    struct.pack_into("<I", bad, at + 8, 10_000)
    assert parse_cafebabe(bytes(bad))["error"] \
        == "dylib name offset out of command"


def test_fuzz_never_raises():
    rng = random.Random(53)
    for seed in (3, 4):
        base, _ = _fat(seed) if seed % 2 else (build_class(
            "C", "S", [("m", "()V")], []), None)
        for _ in range(400):
            x = bytearray(base)
            for _ in range(rng.randrange(1, 6)):
                x[rng.randrange(len(x))] = rng.randrange(256)
            blob = (bytes(x[:rng.randrange(len(x) + 1)])
                    if rng.random() < 0.3 else bytes(x))
            assert "error" in parse_cafebabe(blob)
