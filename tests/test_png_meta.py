"""PNG metadata chunks (operators/png_meta.py): three text-chunk
generations, charset rules, pixel/metadata mutual independence, fuzz."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.multimodal import decode_png
from cies_ocr_java_spark.operators.png_meta import (
    build_png_meta,
    parse_png_meta,
)


def _f(**kw):
    args = dict(texts=[("text", "Title", "Doc X"),
                       ("ztxt", "Desc", "zz " * 10)],
                itxt=("Comment", "en-GB", "Café ☕"),
                phys=(2835, 2835, 1))
    args.update(kw)
    return build_png_meta(8, 6, 7, **args)


def test_three_generations_decode():
    r = parse_png_meta(_f())
    assert r["error"] is None
    assert r["kv"] == "Title=Doc X|Desc=" + "zz " * 10 + "|Comment=Café ☕"
    assert r["lang"] == "en-GB"
    assert (r["phys_x"], r["phys_y"], r["phys_unit"]) == (2835, 2835, 1)
    assert r["n_chunks"] == 7 and r["n_text"] == 3


def test_text_is_latin1_not_utf8():
    # a tEXt value byte 0xE9 must come back as 'é' (Latin-1), never be
    # rejected as truncated UTF-8
    f = build_png_meta(4, 4, 1, texts=[("text", "K", "caf\xe9")])
    r = parse_png_meta(f)
    assert r["error"] is None and r["kv"] == "K=café"


def test_pixel_and_metadata_paths_are_independent():
    f = _f()
    assert decode_png(f)["error"] is None  # pixels decode through meta
    # a metadata poison must not break pixels...
    bad_meta = _f(poison="bad_utf8")
    assert decode_png(bad_meta)["error"] is None
    assert parse_png_meta(bad_meta)["error"] == "invalid utf-8 in iTXt"
    # ...and a pixel-only PNG parses as zero metadata
    from cies_ocr_java_spark.operators.multimodal import build_png

    r = parse_png_meta(build_png(4, 4, 5))
    assert r["error"] is None and r["n_text"] == 0 and r["kv"] == ""


@pytest.mark.parametrize(
    "poison,err",
    [
        ("crc", "chunk crc mismatch"),
        ("zmethod", "unsupported zTXt method"),
        ("bad_utf8", "invalid utf-8 in iTXt"),
        ("bad_key", "bad text key"),
    ],
)
def test_poison_tiers(poison: str, err: str):
    assert parse_png_meta(_f(poison=poison))["error"] == err


def test_compressed_itxt_path():
    import struct
    import zlib

    # hand-build an iTXt with compression flag 1
    from cies_ocr_java_spark.operators.multimodal import build_png

    base = build_png(4, 4, 2)
    body = (b"K\x00\x01\x00en\x00\x00"
            + zlib.compress("Längër väl".encode("utf-8")))
    chunk = (struct.pack(">I", len(body)) + b"iTXt" + body
             + struct.pack(">I", zlib.crc32(b"iTXt" + body) & 0xFFFFFFFF))
    at = 8 + 8 + 13 + 4
    r = parse_png_meta(base[:at] + chunk + base[at:])
    assert r["error"] is None and r["kv"] == "K=Längër väl"


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300), st.integers(0, 2 ** 32 - 1))
def test_fuzz_never_raises(blob: bytes, seed: int):
    base = _f()
    rng = random.Random(seed)
    mode = rng.randrange(3)
    if mode == 0:
        data = blob
    elif mode == 1:
        at = rng.randrange(len(base))
        data = base[:at] + blob + base[at + len(blob):]
    else:
        data = base[: rng.randrange(len(base))]
    r = parse_png_meta(data)
    assert (r["error"] is None) != (r["kv"] is None)
