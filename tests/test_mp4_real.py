"""ISO-BMFF container walker (operators/mp4_real.py): round-trip
identity, bounds-check degradation, fuzz-never-raises, codec registry +
magic dispatch integration."""

import random
import struct

import pandas as pd
import pytest

from cies_ocr_java_spark.operators.mp4_real import (
    MP4_TIMESCALE,
    build_mp4,
    iter_mp4_samples,
    parse_mp4,
)


def test_round_trip_identity():
    for i in [0, 1, 7, 46, 123]:
        nf, delta, v = 2 + i % 5, 100 + i % 7, i % 200
        b = build_mp4(nf, delta, v, width=16 * (1 + i % 3),
                      height=8 * (1 + i % 4))
        m = parse_mp4(b)
        assert m["error"] is None
        assert m["brand"] == "isom"
        assert m["n_tracks"] == 1
        assert m["n_samples"] == nf
        assert m["duration_ms"] == nf * delta * 1000 // MP4_TIMESCALE
        assert m["width"] == 16 * (1 + i % 3)
        assert m["height"] == 8 * (1 + i % 4)
        assert m["payload_sum"] == sum(
            (3 + k % 3) * (v + k) for k in range(nf)
        )


def test_samples_random_access():
    b = build_mp4(5, 100, 40)
    rows = iter_mp4_samples(b)
    assert [r["sample_idx"] for r in rows] == list(range(5))
    off = 32  # ftyp (24) + mdat header (8)
    for k, r in enumerate(rows):
        assert r["offset"] == off
        assert r["size"] == 3 + k % 3
        assert r["byte_sum"] == (3 + k % 3) * (40 + k)
        off += r["size"]


def test_poisoned_mdat_size_fails_bounds():
    b = build_mp4(3, 100, 10)
    pb = b[:24] + struct.pack(">I", 0xFFFFFFF0) + b[28:]
    m = parse_mp4(pb)
    assert m["error"] == (
        "box b'mdat' overruns parent (4294967280 bytes at 24)"
    )
    assert m["payload_sum"] is None
    # the per-sample view degrades to a single error row
    rows = iter_mp4_samples(pb)
    assert len(rows) == 1 and rows[0]["sample_idx"] is None


def test_sample_outside_file_detected():
    b = bytearray(build_mp4(2, 100, 10))
    # find the stco box and point its first chunk offset past EOF
    i = bytes(b).index(b"stco")
    # stco layout: 4cc + ver/flags(4) + count(4) + offsets
    struct.pack_into(">I", b, i + 12, len(b) + 100)
    m = parse_mp4(bytes(b))
    assert m["error"] == "sample outside file"


def test_missing_moov_and_ftyp():
    b = build_mp4(2, 100, 10)
    assert parse_mp4(b[:100] + b"")["error"] is not None
    assert parse_mp4(b"\x00" * 32)["error"] == "missing ftyp"
    assert parse_mp4(None)["error"] == "short or missing payload"
    # chop moov off: walk succeeds but mvhd is gone
    mdat_end = bytes(b).index(b"moov") - 4
    assert parse_mp4(b[:mdat_end])["error"] == "missing moov/mvhd"


def test_fuzz_never_raises():
    b = build_mp4(4, 101, 77)
    for cut in range(0, len(b), 3):
        parse_mp4(b[:cut])
        iter_mp4_samples(b[:cut])
    rnd = random.Random(42)
    for _ in range(400):
        bb = bytearray(b)
        for _ in range(rnd.randrange(1, 6)):
            bb[rnd.randrange(len(bb))] = rnd.randrange(256)
        parse_mp4(bytes(bb))
        iter_mp4_samples(bytes(bb))


def test_build_rejects_bad_args():
    with pytest.raises(ValueError):
        build_mp4(0, 100, 10)
    with pytest.raises(ValueError):
        build_mp4(2, 100, 250)


def test_codec_registry_and_sniff():
    from cies_ocr_java_spark.operators import mp4_real  # noqa: F401
    from cies_ocr_java_spark.operators.multimodal import (
        get_codec,
        sniff_media_format,
    )

    b = build_mp4(3, 100, 10)
    assert sniff_media_format(b) == "mp4"
    out = get_codec("mp4").decode_batch(pd.Series([b, b"garbage" * 3]))
    assert out["mime"].tolist() == ["video/mp4", None]
    assert out["n_frames"].tolist()[0] == 3
    assert out["error"].iloc[1] is not None


def test_dispatch_routes_mp4_and_mp3(spark):
    from cies_ocr_java_spark.operators.mp3_real import build_mp3
    from cies_ocr_java_spark.operators.multimodal import (
        extract_media_dispatch,
    )

    df = spark.createDataFrame(
        [(0, bytearray(build_mp4(3, 100, 10))),
         (1, bytearray(build_mp3([5, 9, 2], 0, tag_len=7)))],
        "doc_id long, content binary",
    )
    out = {r["doc_id"]: r for r in extract_media_dispatch(df).collect()}
    assert out[0]["format"] == "mp4" and out[0]["n_samples"] == 3
    assert out[0]["width"] == 16 and out[0]["error"] is None
    assert out[1]["format"] == "mp3" and out[1]["n_samples"] == 3
    assert out[1]["ink_sum"] > 0 and out[1]["error"] is None
