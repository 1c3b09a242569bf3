"""HEIF/AVIF item walk (operators/heif_real.py): the meta FullBox
offset rule, iloc random access, gates, fuzz."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.heif_real import build_heif, parse_heif

ITEMS = [("av01", b"\x05" * 7), ("Exif", b"\x09" * 5),
         ("mime", b"\x02" * 11)]


def test_item_walk_and_primary_payload_readback():
    r = parse_heif(build_heif(ITEMS, 1))
    assert r["error"] is None
    assert r["brand"] == "mif1" and r["n_items"] == 3
    assert (r["primary_id"], r["primary_type"]) == (2, "Exif")
    assert r["primary_sum"] == 9 * 5
    assert r["items"] == "1:av01:7,2:Exif:5,3:mime:11"


def test_meta_is_a_fullbox_not_a_container():
    # the 4 bytes after the meta header are version+flags; a walker that
    # recursed into meta as a plain container would read them as the
    # first child's size. Prove the layout: byte at meta body start is
    # the version (0), and hdlr starts exactly 4 bytes later.
    data = build_heif(ITEMS, 0)
    at = data.index(b"meta") + 4
    assert data[at] == 0 and data[at + 1:at + 4] == b"\x00\x00\x00"
    assert data[at + 8:at + 12] == b"hdlr"


@pytest.mark.parametrize(
    "poison,err",
    [
        ("meta_version", "unsupported meta version"),
        ("dangling_pitm", "primary item not found"),
        ("extent_oob", "item extent beyond file"),
        ("iloc_sizes", "unsupported iloc sizes"),
    ],
)
def test_poison_tiers(poison: str, err: str):
    assert parse_heif(build_heif(ITEMS, 0, poison=poison))["error"] == err


def test_wrong_handler_rejected():
    data = bytearray(build_heif(ITEMS, 0))
    at = data.index(b"pict")
    data[at:at + 4] = b"vide"
    assert parse_heif(bytes(data))["error"] == "meta handler is not pict"


def test_non_heif_brand_rejected():
    from cies_ocr_java_spark.operators.mp4_real import build_mp4

    r = parse_heif(build_mp4(2, 100, 5))
    assert r["error"] == "not a heif brand: 'isom'"


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300), st.integers(0, 2 ** 32 - 1))
def test_fuzz_never_raises(blob: bytes, seed: int):
    base = build_heif(ITEMS, 2)
    rng = random.Random(seed)
    mode = rng.randrange(3)
    if mode == 0:
        data = blob
    elif mode == 1:
        at = rng.randrange(len(base))
        data = base[:at] + blob + base[at + len(blob):]
    else:
        data = base[: rng.randrange(len(base))]
    r = parse_heif(data)
    assert (r["error"] is None) != (r["items"] is None)
