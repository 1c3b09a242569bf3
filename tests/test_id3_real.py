"""ID3v2.3 frame decode (operators/id3_real.py): mixed-encoding text
frames, non-syncsafe v2.3 frame sizes, padding discipline, gates, fuzz."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.id3_real import (
    build_id3v2,
    parse_id3v2,
    text_frame,
)

FRAMES = [
    text_frame("TIT2", "Título X", 1, bom="le"),
    text_frame("TPE1", "Artist", 0),
    text_frame("TALB", "Album café", 3),
    text_frame("TRCK", "12", 0),
    ("APIC", b"\x00image/png\x00\x03\x00pixelbytes"),
]


def test_mixed_encodings_one_tag():
    r = parse_id3v2(build_id3v2(FRAMES, padding=32))
    assert r["error"] is None
    assert r["fields"] == {"TIT2": "Título X", "TPE1": "Artist",
                           "TALB": "Album café", "TRCK": "12"}
    assert r["n_frames"] == 5 and r["n_text_frames"] == 4
    assert r["padding_bytes"] == 32


def test_utf16_both_endiannesses():
    for bom in ("le", "be"):
        r = parse_id3v2(build_id3v2([text_frame("TIT2", "naïve 中", 1,
                                                bom=bom)]))
        assert r["fields"]["TIT2"] == "naïve 中", bom


def test_frame_size_is_not_syncsafe():
    # a 200-byte body: syncsafe would encode 200 as 0x01 0x48, plain
    # u32 as 0x000000C8 — the builder writes plain and the parser reads
    # plain; a syncsafe reader would desync and hit the id gate
    body = b"\x00" + b"A" * 199
    tag = build_id3v2([("TPE1", body)])
    at = tag.index(b"TPE1") + 4
    assert struct.unpack_from(">I", tag, at)[0] == 200
    assert parse_id3v2(tag)["fields"]["TPE1"] == "A" * 199


def test_bytes_after_tag_are_ignored():
    tag = build_id3v2(FRAMES, padding=8)
    r = parse_id3v2(tag + b"\xffgarbage-audio-bytes" * 10)
    assert r["error"] is None and r["tag_size"] == len(tag)


@pytest.mark.parametrize(
    "poison,err",
    [
        ("bad_id", "bad frame id"),
        ("oversize", "frame beyond tag"),
        ("dirty_padding", "dirty padding"),
    ],
)
def test_builder_poisons(poison: str, err: str):
    assert parse_id3v2(
        build_id3v2(FRAMES, padding=16, poison=poison))["error"] == err


def test_text_gates():
    assert parse_id3v2(
        build_id3v2([("TIT2", b"\x01nobom")]))["error"] == "missing bom"
    assert parse_id3v2(
        build_id3v2([("TIT2", b"\x09x")]))["error"] == (
            "bad text encoding 9")
    assert parse_id3v2(
        build_id3v2([("TIT2", b"\x03\xff\xfe")]))["error"] == (
            "invalid utf-8 text")
    assert parse_id3v2(
        build_id3v2([("TIT2", b"")]))["error"] == "empty text frame"


def test_null_termination_stripped():
    r = parse_id3v2(build_id3v2([("TIT2", b"\x00Hello\x00")]))
    assert r["fields"]["TIT2"] == "Hello"


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300), st.integers(0, 2 ** 32 - 1))
def test_fuzz_never_raises(blob: bytes, seed: int):
    base = build_id3v2(FRAMES, padding=16)
    rng = random.Random(seed)
    mode = rng.randrange(3)
    if mode == 0:
        data = blob
    elif mode == 1:
        at = rng.randrange(len(base))
        data = base[:at] + blob + base[at + len(blob):]
    else:
        data = base[: rng.randrange(len(base))]
    r = parse_id3v2(data)
    assert (r["error"] is None) != (r["fields"] is None)
