"""Real TIFF codec (operators/multimodal.py): dual-endian IFD walk,
multi-page chains, out-of-line strip arrays, failure contract, and the
Spark feature extractor."""

from __future__ import annotations

import random
import struct

import pandas as pd
import pytest

from cies_ocr_java_spark.operators.multimodal import (
    build_tiff,
    decode_tiff,
    extract_tiff_features,
    get_codec,
    sniff_media_format,
)


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("pages", [1, 2, 3])
def test_round_trip_both_endians_multipage(big_endian, pages):
    r = decode_tiff(build_tiff(5, 7, 100, pages=pages, big_endian=big_endian))
    assert r == {
        "width": 5, "height": 7, "n_pages": pages,
        "ink_sum": sum(5 * 7 * ((100 + p) % 256) for p in range(pages)),
        "error": None,
    }


def test_single_row_single_strip():
    assert decode_tiff(build_tiff(4, 1, 9)) == {
        "width": 4, "height": 1, "n_pages": 1, "ink_sum": 36, "error": None,
    }


def test_strips_are_out_of_line_arrays():
    # a 2-strip page stores StripOffsets/ByteCounts as deferred LONG
    # arrays — truncating the tail must hit exactly that read
    t = build_tiff(5, 4, 10)
    r = decode_tiff(t[:-8])
    assert r["error"] == "tag 279 array out of bounds"


def test_bad_magic_version_and_cycle():
    t = build_tiff(3, 3, 3)
    assert decode_tiff(b"XX" + t[2:])["error"] == "bad magic"
    bad_ver = t[:2] + struct.pack("<H", 43) + t[4:]
    assert decode_tiff(bad_ver)["error"] == "bad version"
    # self-pointing IFD: patch the header offset onto itself via a
    # crafted loop — next-IFD pointer back to IFD0
    t2 = bytearray(build_tiff(2, 2, 5))
    (ifd0,) = struct.unpack_from("<I", t2, 4)
    (n_ent,) = struct.unpack_from("<H", t2, ifd0)
    struct.pack_into("<I", t2, ifd0 + 2 + 12 * n_ent, ifd0)
    assert decode_tiff(bytes(t2))["error"] == "cyclic or runaway ifd chain"


def test_byte_count_mismatch_detected():
    t = bytearray(build_tiff(4, 1, 9))  # single inline strip of 4 bytes
    (ifd0,) = struct.unpack_from("<I", t, 4)
    (n_ent,) = struct.unpack_from("<H", t, ifd0)
    for k in range(n_ent):
        at = ifd0 + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from("<HHI", t, at)
        if tag == 279:
            struct.pack_into("<I", t, at + 8, 3)  # lie about the count
    assert decode_tiff(bytes(t))["error"] == "strip byte counts mismatch"


def test_fuzz_never_raises():
    rng = random.Random(5)
    base = build_tiff(6, 5, 77, pages=2)
    for _ in range(300):
        m = bytearray(base)
        for _ in range(rng.randint(1, 10)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        r = decode_tiff(bytes(m))
        assert (r["ink_sum"] is None) == (r["error"] is not None)


def test_sniff_and_codec_registry():
    assert sniff_media_format(build_tiff(2, 2, 1)) == "tiff"
    assert sniff_media_format(build_tiff(2, 2, 1, big_endian=True)) == "tiff"
    codec = get_codec("tiff")
    out = codec.decode_batch(pd.Series([build_tiff(3, 2, 4, pages=2), b"x"]))
    assert out["n_frames"].tolist() == [2, pd.NA] or out["n_frames"][0] == 2
    assert out["mime"][0] == "image/tiff" and out["error"][1] is not None


def test_spark_extractor(spark):
    df = spark.createDataFrame(
        [(1, build_tiff(5, 3, 10, pages=2, big_endian=True)),
         (2, b"not a tiff")],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in extract_tiff_features(df).collect()}
    assert rows[1]["n_pages"] == 2 and rows[1]["ink_sum"] == 5 * 3 * (10 + 11)
    assert rows[2]["error"] is not None and rows[2]["width"] is None
