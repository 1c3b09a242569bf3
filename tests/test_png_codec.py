"""Real PNG codec (operators/multimodal.py): all-five-filter round trip,
CRC verification, failure contract, and the Spark feature extractor."""

from __future__ import annotations

import random
import struct
import zlib

import pandas as pd
import pytest

from cies_ocr_java_spark.operators.multimodal import (
    build_png,
    decode_png,
    extract_png_features,
    get_codec,
)


@pytest.mark.parametrize(
    "w,h,v",
    [(1, 1, 0), (4, 3, 200), (13, 7, 1), (16, 9, 77), (5, 11, 255),
     (3, 6, 128)],
)
def test_round_trip_exercises_all_five_filters(w, h, v):
    """Heights >= 5 cycle through None/Sub/Up/Average/Paeth — the decode
    must reconstruct through every filter type."""
    r = decode_png(build_png(w, h, v))
    assert r == {"width": w, "height": h, "ink_sum": w * h * v,
                 "error": None}


def test_emitted_file_is_structurally_real_png():
    b = build_png(5, 3, 10)
    assert b.startswith(b"\x89PNG\r\n\x1a\n")
    assert b.endswith(struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF))
    w, h, depth, ctype = struct.unpack_from(">IIBB", b, 16)
    assert (w, h, depth, ctype) == (5, 3, 8, 0)
    # the IDAT payload genuinely inflates to h filtered scanlines
    i = b.index(b"IDAT")
    (clen,) = struct.unpack_from(">I", b, i - 4)
    raw = zlib.decompress(b[i + 4:i + 4 + clen])
    assert len(raw) == 3 * (5 + 1)


def test_crc_gate_catches_corruption():
    b = build_png(10, 10, 50)
    i = b.index(b"IDAT") + 6
    bad = b[:i] + bytes([b[i] ^ 0xFF]) + b[i + 1:]
    assert decode_png(bad)["error"] == "crc mismatch in IDAT"
    j = b.index(b"IHDR") + 8
    bad2 = b[:j] + bytes([b[j] ^ 0x01]) + b[j + 1:]
    assert "crc mismatch" in decode_png(bad2)["error"]


def test_failure_contract():
    b = build_png(6, 4, 9)
    assert decode_png(b[:-9])["error"] is not None  # clipped IEND
    assert decode_png(b"XXXX" + b[4:])["error"] == "bad png signature"
    assert decode_png(None)["error"] == "short or missing payload"
    # 16-bit depth rejected, not misread (rebuild IHDR with depth 16 + CRC)
    ihdr = struct.pack(">IIBBBBB", 6, 4, 16, 0, 0, 0, 0)
    fixed = (
        b[:8]
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        + b[8 + 25:]
    )
    assert "unsupported depth" in decode_png(fixed)["error"]


def test_fuzz_never_raises():
    rng = random.Random(13)
    for _ in range(300):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 150)))
        for data in (blob, b"\x89PNG\r\n\x1a\n" + blob):
            r = decode_png(data)
            assert (r["width"] is None) == (r["error"] is not None)


def test_registry_codec_batch():
    c = get_codec("png")
    b = build_png(4, 3, 100)
    out = c.decode_batch(pd.Series([b, b[:-9], None]))
    assert out["mime"][0] == "image/png" and out["n_frames"][0] == 1
    assert out["error"][1] is not None and out["error"][2] is not None


def test_media_dispatch_sniffs_and_routes(spark):
    """Mixed-format column: magic-byte sniff routes each payload to the
    right real codec; garbage and truncated payloads fail as rows."""
    from cies_ocr_java_spark.operators.multimodal import (
        build_bmp,
        build_wav,
        extract_media_dispatch,
        sniff_media_format,
    )

    assert sniff_media_format(build_png(3, 3, 1)) == "png"
    assert sniff_media_format(build_bmp(3, 3, 1)) == "bmp"
    assert sniff_media_format(build_wav(5, 8000, 1)) == "wav"
    assert sniff_media_format(b"\x00garbage-payload") is None
    rows = [
        (1, build_bmp(4, 2, 10)),
        (2, build_png(5, 3, 20)),
        (3, build_wav(7, 8000, -100, channels=2)),
        (4, b"\x00not-a-format"),
        (5, build_bmp(4, 2, 10)[:-3]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in extract_media_dispatch(df).collect()}
    assert out[1]["format"] == "bmp" and out[1]["ink_sum"] == 4 * 2 * 3 * 10
    assert out[2]["format"] == "png" and out[2]["ink_sum"] == 5 * 3 * 20
    assert out[3]["format"] == "wav" and out[3]["n_samples"] == 7
    assert out[3]["ink_sum"] == 100 * 7 * 2
    assert out[4]["format"] is None and out[4]["error"] == "unknown format"
    assert out[5]["format"] == "bmp" and out[5]["error"] is not None


def test_spark_png_feature_extraction(spark):
    rows = [(1, build_png(6, 5, 50)), (2, build_png(3, 3, 0)[:-9]), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in extract_png_features(df).collect()}
    assert out[1]["width"] == 6 and out[1]["ink_sum"] == 6 * 5 * 50
    assert out[1]["mime"] == "image/png"
    assert out[2]["error"] is not None
    assert out[3]["error"] == "short or missing payload"
