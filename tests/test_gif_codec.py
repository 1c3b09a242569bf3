"""Real GIF codec (operators/multimodal.py): LZW round trip with code
growth and CLEAR resets, multi-frame decode, failure contract, dispatch
routing, and the Spark feature extractor."""

from __future__ import annotations

import random
import struct

import pandas as pd
import pytest

from cies_ocr_java_spark.operators.multimodal import (
    _gif_lzw_decode,
    _gif_lzw_encode,
    build_gif,
    decode_gif,
    extract_gif_features,
    get_codec,
    sniff_media_format,
)


def test_lzw_round_trip_random_bytes():
    rng = random.Random(7)
    for _ in range(120):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 700)))
        enc = _gif_lzw_encode(data, 8)
        dec, err = _gif_lzw_decode(enc, 8, len(data))
        assert err is None and dec == data


def test_lzw_small_alphabet_forces_code_growth_and_clear():
    """min_code_size=2 on long low-entropy input drives the code width
    through 3..12 bits and (on long enough input) a table-full CLEAR."""
    rng = random.Random(11)
    for n in (0, 1, 50, 5000, 20000):
        data = bytes(rng.randrange(4) for _ in range(n))
        enc = _gif_lzw_encode(data, 2)
        dec, err = _gif_lzw_decode(enc, 2, n)
        assert err is None and dec == data, n


def test_lzw_self_referencing_code():
    """'aaaa...' produces the code==next_code (prev+prev[0]) case."""
    data = b"\x01" * 64
    dec, err = _gif_lzw_decode(_gif_lzw_encode(data, 8), 8, 64)
    assert err is None and dec == data


@pytest.mark.parametrize(
    "w,h,v,nf",
    [(1, 1, 0, 1), (7, 3, 100, 1), (16, 9, 200, 3), (40, 25, 50, 2)],
)
def test_gif_round_trip_multiframe(w, h, v, nf):
    r = decode_gif(build_gif(w, h, v, nf))
    assert r == {
        "width": w, "height": h, "n_frames": nf,
        "ink_sum": sum(w * h * (v + f) for f in range(nf)),
        "error": None,
    }


def test_emitted_file_is_structurally_real_gif():
    b = build_gif(5, 3, 10, 2)
    assert b[:6] == b"GIF89a" and b[-1] == 0x3B
    w, h, packed = struct.unpack_from("<HHB", b, 6)
    assert (w, h) == (5, 3) and packed & 0x80  # global color table present
    assert b[13 + 3 * 256] == 0x21  # first GCE right after the 256-entry GCT
    assert sniff_media_format(b) == "gif"


def test_failure_contract():
    b = build_gif(6, 4, 9, 1)
    assert decode_gif(b[:-6])["error"] == "truncated image data"
    assert decode_gif(b"XXXXXX" + b[6:])["error"] == "bad gif signature"
    assert decode_gif(None)["error"] == "short or missing payload"
    # poisoned LZW minimum code size (fixed offset past sig+LSD+GCT+GCE+ID)
    bad = b[:799] + b"\x0c" + b[800:]
    assert decode_gif(bad)["error"] == "bad lzw code size"
    # flipped bit inside the LZW stream must fail, never mis-decode
    j = 803
    flipped = b[:j] + bytes([b[j] ^ 0x55]) + b[j + 1:]
    r = decode_gif(flipped)
    assert r["error"] is not None or r["ink_sum"] != 6 * 4 * 9


def test_fuzz_never_raises():
    rng = random.Random(13)
    for _ in range(300):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 150)))
        for data in (blob, b"GIF89a" + blob):
            r = decode_gif(data)
            assert (r["width"] is None) == (r["error"] is not None)


def test_registry_codec_batch():
    c = get_codec("gif")
    b = build_gif(4, 3, 100, 3)
    out = c.decode_batch(pd.Series([b, b[:-6], None]))
    assert out["mime"][0] == "image/gif" and out["n_frames"][0] == 3
    assert out["error"][1] is not None and out["error"][2] is not None


def test_spark_gif_feature_extraction(spark):
    rows = [
        (1, build_gif(6, 5, 50, 2)),
        (2, build_gif(3, 3, 0, 1)[:-6]),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in extract_gif_features(df).collect()}
    assert out[1]["width"] == 6 and out[1]["n_frames"] == 2
    assert out[1]["ink_sum"] == 6 * 5 * 50 + 6 * 5 * 51
    assert out[2]["error"] is not None
    assert out[3]["error"] == "short or missing payload"


def test_dispatch_routes_gif(spark):
    from cies_ocr_java_spark.operators.multimodal import (
        extract_media_dispatch,
    )

    df = spark.createDataFrame(
        [(1, build_gif(4, 2, 10, 2))], "doc_id long, content binary"
    )
    row = extract_media_dispatch(df).collect()[0]
    assert row["format"] == "gif"
    assert row["ink_sum"] == 4 * 2 * 10 + 4 * 2 * 11
    assert row["error"] is None
