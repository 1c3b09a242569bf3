"""Real baseline JPEG codec (operators/jpeg_real.py): DC-chain round
trips, structural spec assertions, AC-path decode of a hand-built
coefficient stream, failure contract, fuzz, dispatch routing, and the
Spark feature extractor."""

from __future__ import annotations

import random
import struct

import numpy as np
import pandas as pd
import pytest

from cies_ocr_java_spark.operators.jpeg_real import (
    _AC_BITS,
    _AC_VALS,
    _BitWriter,
    _DC_BITS,
    _DC_ENC,
    _DC_VALS,
    _IDCT_M,
    _ZIGZAG,
    _canonical_codes,
    _seg,
    build_jpeg,
    build_jpeg_blocks,
    decode_jpeg,
    extract_jpeg_features,
)
from cies_ocr_java_spark.operators.multimodal import (
    get_codec,
    sniff_media_format,
)


@pytest.mark.parametrize(
    "w,h,v",
    [(1, 1, 0), (8, 8, 255), (7, 5, 128), (16, 16, 1), (20, 13, 200),
     (100, 60, 77)],
)
def test_solid_round_trip_exact(w, h, v):
    """A DC-only block is the lossless corner of lossy JPEG: decode must
    return exactly w*h*v ink (incl. edge-block cropping)."""
    r = decode_jpeg(build_jpeg(w, h, v))
    assert r == {"width": w, "height": h, "ink_sum": w * h * v,
                 "error": None}


def test_dc_prediction_chain_random_grids():
    """Block-solid gradients drive nonzero DC diffs of every sign and
    category through the canonical Huffman chain."""
    rng = random.Random(5)
    for _ in range(40):
        bh, bw = rng.randint(1, 4), rng.randint(1, 4)
        grid = np.array(
            [[rng.randrange(256) for _ in range(bw)] for _ in range(bh)]
        )
        r = decode_jpeg(build_jpeg_blocks(grid, bw * 8, bh * 8))
        assert r["error"] is None and r["ink_sum"] == 64 * int(grid.sum())


def test_emitted_file_is_structurally_real_jfif():
    b = build_jpeg(10, 6, 42)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    assert b[2:4] == b"\xff\xe0" and b[6:11] == b"JFIF\x00"
    i = b.index(b"\xff\xc0")
    prec, h, w, nc = struct.unpack_from(">BHHB", b, i + 4)
    assert (prec, h, w, nc) == (8, 6, 10, 1)
    assert sniff_media_format(b) == "jpeg"


def test_ac_path_decodes_hand_built_coefficient_stream():
    """The writer never emits AC coefficients, so drive the AC decode
    path (run/size, ZRL, sign extension, dezigzag, dequant, IDCT)
    directly: hand-assemble a one-block scan with known coefficients and
    compare ink against an independent numpy IDCT of the same block."""
    # AC table with symbols: EOB(0x00), ZRL(0xF0), (run=0,size=2)=0x02,
    # (run=3,size=1)=0x31 — canonical lengths 2,3,3,3
    ac_bits = [0, 1, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = [0x00, 0x02, 0x31, 0xF0]
    ac_enc = _canonical_codes(ac_bits, ac_vals)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([2] * 64))  # quant = 2s
    out += _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    wtr = _BitWriter()
    # DC: diff = +5 (category 3)
    code, ln = _DC_ENC[3]
    wtr.write(code, ln)
    wtr.write(5, 3)
    # AC k=1: (run 0, size 2) value -2 -> bits = -2 + 3 = 1
    code, ln = ac_enc[0x02]
    wtr.write(code, ln)
    wtr.write((-2) + (1 << 2) - 1, 2)
    # ZRL: 16 zeros, then (run 3, size 1) value +1 at k = 1+1+16+3 = 21
    code, ln = ac_enc[0xF0]
    wtr.write(code, ln)
    code, ln = ac_enc[0x31]
    wtr.write(code, ln)
    wtr.write(1, 1)
    code, ln = ac_enc[0x00]  # EOB
    wtr.write(code, ln)
    wtr.flush()
    out += wtr.out + b"\xff\xd9"

    r = decode_jpeg(bytes(out))
    assert r["error"] is None and (r["width"], r["height"]) == (8, 8)
    # independent expectation: zigzag coefficients * quant 2, numpy IDCT
    zz = np.zeros(64)
    zz[0], zz[1], zz[21] = 5, -2, 1
    coef = np.zeros((8, 8))
    for k in range(64):
        coef[_ZIGZAG[k]] = zz[k] * 2
    px = np.clip(np.round(_IDCT_M @ coef @ _IDCT_M.T) + 128, 0, 255)
    assert r["ink_sum"] == int(px.sum())


def test_failure_contract():
    b = build_jpeg(12, 9, 30)
    i = b.index(b"\xff\xc0")
    assert decode_jpeg(b[:i] + b"\xff\xc2" + b[i + 2:])["error"] == (
        "unsupported jpeg variant"
    )
    assert decode_jpeg(b[:-6])["error"] == "truncated entropy data"
    assert decode_jpeg(b"\x00\x11" + b[2:])["error"] == "bad jpeg signature"
    assert decode_jpeg(None)["error"] == "short or missing payload"
    # multi-component (color) SOF rejected, not misread
    j = i + 4
    color_sof = (
        b[:i]
        + _seg(0xC0, struct.pack(">BHHB", 8, 9, 12, 3)
               + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
        + b[j + 8:]
    )
    assert "multi-component" in str(decode_jpeg(color_sof)["error"])


def test_fuzz_never_raises():
    rng = random.Random(13)
    for _ in range(300):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 150)))
        for data in (blob, b"\xff\xd8" + blob, b"\xff\xd8\xff" + blob):
            r = decode_jpeg(data)
            assert (r["width"] is None) == (r["error"] is not None)


def test_byte_stuffing_round_trip():
    """Levels near 255 produce 0xFF entropy bytes — the stuffed 0xFF00
    must round-trip, not desync the reader."""
    for v in range(200, 256):
        r = decode_jpeg(build_jpeg(8, 8, v))
        assert r["error"] is None and r["ink_sum"] == 64 * v, v


def test_registry_codec_batch():
    c = get_codec("jpeg")
    b = build_jpeg(4, 3, 100)
    out = c.decode_batch(pd.Series([b, b[:-6], None]))
    assert out["mime"][0] == "image/jpeg" and out["n_frames"][0] == 1
    assert out["error"][1] is not None and out["error"][2] is not None


def test_spark_jpeg_feature_extraction_and_dispatch(spark):
    from cies_ocr_java_spark.operators.multimodal import (
        extract_media_dispatch,
    )

    rows = [(1, build_jpeg(9, 7, 50)), (2, build_jpeg(3, 3, 0)[:-5]),
            (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in extract_jpeg_features(df).collect()}
    assert out[1]["width"] == 9 and out[1]["ink_sum"] == 9 * 7 * 50
    assert out[1]["mime"] == "image/jpeg"
    assert out[2]["error"] is not None
    assert out[3]["error"] == "short or missing payload"

    d2 = spark.createDataFrame(
        [(1, build_jpeg(5, 4, 20))], "doc_id long, content binary"
    )
    row = extract_media_dispatch(d2).collect()[0]
    assert row["format"] == "jpeg" and row["ink_sum"] == 5 * 4 * 20


# ----------------------------------------------------------------- EXIF

def test_exif_round_trip_both_endians():
    from cies_ocr_java_spark.operators.jpeg_real import (
        build_jpeg_exif, decode_exif,
    )

    for be in (False, True):
        b = build_jpeg_exif(10, 7, 50, 6, "2023:01:05 14:30:00",
                            big_endian=be)
        assert decode_exif(b) == {
            "orientation": 6,
            "exif_datetime": "2023:01:05 14:30:00",
            "pixel_x": 10, "pixel_y": 7, "error": None,
        }
        # the APP1 splice must leave the pixel stream exactly decodable
        assert decode_jpeg(b) == {
            "width": 10, "height": 7, "ink_sum": 10 * 7 * 50,
            "error": None,
        }


def test_exif_absent_and_failure_contract():
    from cies_ocr_java_spark.operators.jpeg_real import (
        build_jpeg_exif, decode_exif,
    )

    assert decode_exif(build_jpeg(4, 4, 9))["error"] == "no exif segment"
    assert decode_exif(None)["error"] == "short or missing payload"
    assert decode_exif(b"\x00\x01\x02\x03")["error"] == "bad jpeg signature"
    b = build_jpeg_exif(10, 7, 50, 1, "2023:01:05 14:30:00")
    assert decode_exif(b[:40])["error"] == "truncated segment"
    # corrupt the embedded TIFF magic only -> header error, not a crash
    m = bytearray(b)
    at = b.index(b"Exif\x00\x00") + 6
    m[at:at + 2] = b"XX"
    assert decode_exif(bytes(m))["error"] == "bad exif tiff header"


def test_exif_out_of_bounds_pointers_are_errors():
    """Hostile offsets: the DateTime out-of-line pointer and the Exif
    sub-IFD pointer both get bounds-verified, never chased blindly."""
    from cies_ocr_java_spark.operators.jpeg_real import (
        build_exif_app1, decode_exif,
    )

    app1 = build_exif_app1(3, "2020:06:01 00:00:00", 5, 5)
    full = b"\xff\xd8" + app1 + b"\xff\xd9"
    tiff_at = full.index(b"Exif\x00\x00") + 6
    # IFD0 entry 1 (DateTime) value field = tiff_at + 8 (hdr) + 2 (count)
    # + 12 (entry 0) + 8 -> point it past the end
    m = bytearray(full)
    struct.pack_into("<I", m, tiff_at + 8 + 2 + 12 + 8, 10_000)
    assert decode_exif(bytes(m))["error"] == "exif tag array out of bounds"
    m = bytearray(full)
    struct.pack_into("<I", m, tiff_at + 8 + 2 + 24 + 8, 10_000)
    assert decode_exif(bytes(m))["error"] == "exif ifd out of bounds"


def test_exif_fuzz_never_raises():
    from cies_ocr_java_spark.operators.jpeg_real import (
        build_jpeg_exif, decode_exif,
    )

    rng = random.Random(11)
    base = bytearray(build_jpeg_exif(9, 9, 3, 3, "2021:12:31 23:59:59",
                                     big_endian=True))
    for _ in range(400):
        m = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        decode_exif(bytes(m))
        decode_exif(bytes(m[:rng.randrange(len(m))]))
