"""OpenPGP walker (operators/pgp_real.py): armor + CRC24, both
header formats, partial lengths, compressed-packet recursion over
the from-scratch inflate, gpg interop (committed vector + live gpg
when present), gates, fuzz."""

import pathlib
import random
import shutil
import subprocess

import pytest

from cies_ocr_java_spark.operators.pgp_real import (
    armor,
    build_packets,
    compressed_body,
    crc24,
    literal_body,
    parse_pgp,
)

_VEC = pathlib.Path(__file__).parent / "data" / "gpg_stored_vector.asc"


def test_parse_committed_gpg_store_vector():
    # gpg --batch --store --armor of b"the quick brown fox":
    # old-format compressed packet (indeterminate length) wrapping an
    # old-format literal packet
    r = parse_pgp(_VEC.read_text())
    assert r["error"] is None
    assert (r["n_packets"], r["n_literal"], r["n_compressed"],
            r["n_old_format"]) == (2, 1, 1, 2)
    assert r["literal_bytes"] == len(b"the quick brown fox")


@pytest.mark.skipif(shutil.which("gpg") is None,
                    reason="no gpg in container")
def test_gpg_round_trips_our_armor(tmp_path):
    msg = armor(build_packets(
        [(11, literal_body(b"round trip"), "new")]))
    asc = tmp_path / "m.asc"
    asc.write_text(msg)
    out = subprocess.run(["gpg", "--dearmor"], input=msg.encode(),
                         capture_output=True, check=True)
    # gpg only reaches the packet bytes if OUR crc24 matched
    assert out.stdout == build_packets(
        [(11, literal_body(b"round trip"), "new")])


def test_crc24_known_property():
    # crc of empty = init value pushed through zero bytes = 0xB704CE
    assert crc24(b"") == 0xB704CE
    # single-bit sensitivity
    assert crc24(b"a") != crc24(b"b")


def test_partial_lengths_and_compression_nesting():
    lit = literal_body(b"x" * 1500, fname=b"b.bin")
    inner = build_packets([(11, literal_body(b"deep"), "new")])
    msg = armor(build_packets([
        (11, lit, "partial"),
        (8, compressed_body(1, inner), "new"),
        (8, compressed_body(2, inner), "old"),
        (8, compressed_body(0, inner), "indet"),
    ]), headers=[("Version", "cies 1.0")])
    r = parse_pgp(msg)
    assert r["error"] is None
    assert r["n_partial_segs"] == 2  # 512 + 512 + definite tail
    assert r["n_compressed"] == 3
    assert r["n_literal"] == 4
    assert r["literal_bytes"] == 1500 + 3 * 4
    assert r["n_armor_headers"] == 1


def test_nesting_depth_cap():
    blob = build_packets([(11, literal_body(b"z"), "new")])
    for _ in range(6):
        blob = build_packets([(8, compressed_body(0, blob), "new")])
    assert parse_pgp(armor(blob))["error"] \
        == "compression nesting too deep"


def test_gates():
    p = [(11, literal_body(b"x" * 600), "partial")]
    assert parse_pgp(armor(build_packets(
        p, short_first_partial=True)))["error"] \
        == "first partial too short"
    assert parse_pgp(armor(build_packets(p), bad_crc=True)) \
        ["error"] == "crc24 mismatch"
    assert parse_pgp(armor(build_packets(p),
                           mismatched_end=True))["error"] \
        == "armor type mismatch"
    assert parse_pgp(armor(build_packets(p, chop=9)))["error"] \
        == "truncated packet"
    assert parse_pgp(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0x4880)
    base = armor(build_packets([
        (11, literal_body(b"y" * 100), "new"),
        (8, compressed_body(2, build_packets(
            [(11, literal_body(b"z"), "new")])), "old"),
    ]))
    for _ in range(300):
        x = list(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = chr(rng.randrange(32, 127))
        blob = ("".join(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else "".join(x))
        assert "error" in parse_pgp(blob)
