"""Real BMP codec (operators/multimodal.py): round trip, failure
contract, registry integration, and the Spark feature extractor."""

from __future__ import annotations

import random
import struct

import pandas as pd
import pytest

from cies_ocr_java_spark.operators.multimodal import (
    build_bmp,
    decode_bmp,
    extract_bmp_features,
    extract_media_features,
    get_codec,
)


@pytest.mark.parametrize(
    "w,h,v", [(1, 1, 0), (4, 3, 200), (13, 7, 1), (16, 9, 77), (5, 1, 255)]
)
def test_round_trip(w, h, v):
    r = decode_bmp(build_bmp(w, h, v))
    assert r == {"width": w, "height": h, "ink_sum": w * h * 3 * v,
                 "error": None}


def test_emitted_file_is_structurally_real_bmp():
    b = build_bmp(5, 2, 10)
    assert b[:2] == b"BM"
    fsize, off = struct.unpack_from("<I", b, 2)[0], struct.unpack_from("<I", b, 10)[0]
    assert fsize == len(b) and off == 54
    hsize, w, h, planes, bpp = struct.unpack_from("<IiiHH", b, 14)
    assert (hsize, w, h, planes, bpp) == (40, 5, 2, 1, 24)
    # stride is 4-byte padded: 5*3=15 -> 16
    assert len(b) - off == 16 * 2


def test_failure_contract():
    b = build_bmp(10, 10, 50)
    assert decode_bmp(b[:-5])["error"] == "truncated pixel data"
    assert decode_bmp(b"XX" + b[2:])["error"] == "bad magic"
    assert decode_bmp(None)["error"] == "short or missing payload"
    assert decode_bmp(b"BM" + b"\x00" * 60)["error"] is not None
    # 8-bpp header rejected, not misread
    hacked = bytearray(b)
    struct.pack_into("<H", hacked, 28, 8)
    assert "bpp" in decode_bmp(bytes(hacked))["error"]


def test_top_down_negative_height_decodes():
    b = bytearray(build_bmp(3, 2, 9))
    struct.pack_into("<i", b, 22, -2)  # top-down flag: abs height
    r = decode_bmp(bytes(b))
    assert r["error"] is None and r["height"] == 2


def test_fuzz_never_raises():
    rng = random.Random(7)
    for _ in range(300):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 120)))
        for data in (blob, b"BM" + blob):
            r = decode_bmp(data)
            assert (r["width"] is None) == (r["error"] is not None)


def test_registry_codec_batch():
    c = get_codec("bmp")
    b = build_bmp(4, 3, 100)
    out = c.decode_batch(pd.Series([b, b[:-3], None]))
    assert out["mime"][0] == "image/bmp" and out["n_frames"][0] == 1
    assert out["error"][1] is not None and out["error"][2] is not None
    assert out["width"].isna().tolist() == [False, True, True]


def test_spark_bmp_feature_extraction(spark):
    rows = [(1, build_bmp(6, 4, 50)), (2, build_bmp(3, 3, 0)[:-2]), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in extract_bmp_features(df).collect()}
    assert out[1]["width"] == 6 and out[1]["ink_sum"] == 6 * 4 * 3 * 50
    assert out[1]["mime"] == "image/bmp"
    assert out[2]["error"] == "truncated pixel data"
    assert out[3]["error"] == "short or missing payload"
    # generic codec path shares the same bytes
    media = df.selectExpr("CAST(doc_id AS STRING) AS media_ref", "content")
    gen = {
        r["media_ref"]: r
        for r in extract_media_features(media, codec="bmp").collect()
    }
    assert gen["1"]["width"] == 6 and gen["1"]["n_frames"] == 1
    assert gen["2"]["error"] is not None
