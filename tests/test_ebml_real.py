"""EBML/Matroska walker (operators/ebml_real.py): vint grammar edges,
container recursion, block-prelude stripping, poison tiers, fuzz."""

import random
import struct

import pytest

from cies_ocr_java_spark.operators.ebml_real import (
    AUDIO, CLUSTER, CLUSTER_TS, CODEC_ID, DOCTYPE, DURATION,
    EBML_HEADER, INFO, MUXING_APP, PIXEL_HEIGHT, PIXEL_WIDTH,
    SAMPLING_FREQ, SEGMENT, TIMESTAMP_SCALE, TRACKS, TRACK_ENTRY,
    TRACK_NUMBER, TRACK_TYPE, VIDEO, element, encode_vint_size,
    float_el, parse_mkv, read_vint, simple_block, str_el, uint_el,
)


def _build(i, oversize_cluster=False, unknown_cluster=False):
    hdr = element(EBML_HEADER, uint_el(0x4286, 1)
                  + str_el(DOCTYPE, "webm" if i % 2 else "matroska")
                  + uint_el(0x4287, 4))
    info = element(INFO, uint_el(TIMESTAMP_SCALE, 1000000)
                   + str_el(MUXING_APP, "graft")
                   + float_el(DURATION, float(4000 + i % 500)))
    vid = element(TRACK_ENTRY,
                  uint_el(TRACK_NUMBER, 1) + uint_el(TRACK_TYPE, 1)
                  + str_el(CODEC_ID, f"V_VP{8 + i % 2}")
                  + element(VIDEO,
                            uint_el(PIXEL_WIDTH, 320 + 16 * (i % 5))
                            + uint_el(PIXEL_HEIGHT, 240 + 8 * (i % 3))))
    aud = element(TRACK_ENTRY,
                  uint_el(TRACK_NUMBER, 2) + uint_el(TRACK_TYPE, 2)
                  + str_el(CODEC_ID,
                           "A_OPUS" if i % 3 == 0 else "A_VORBIS")
                  + element(AUDIO, float_el(SAMPLING_FREQ, 48000.0)))
    ncl, nbl = 1 + i % 3, 2 + i % 4
    cls = b""
    for c in range(ncl):
        blocks = b"".join(
            simple_block(1 + k % 2, 10 * k,
                         bytes([(i + k) % 251])
                         * (30 + (i + c * 5 + k) % 17))
            for k in range(nbl))
        cls += element(CLUSTER, uint_el(CLUSTER_TS, 1000 * c) + blocks,
                       oversize=1000 if (oversize_cluster and c == 0)
                       else 0,
                       unknown_size=(unknown_cluster and c == 0))
    return hdr + element(SEGMENT, info + element(TRACKS, vid + aud)
                         + cls)


def test_round_trip_identity():
    for i in [0, 1, 2, 5, 7, 12, 30]:
        m = parse_mkv(_build(i))
        assert m["error"] is None
        ncl, nbl = 1 + i % 3, 2 + i % 4
        assert m["doctype"] == ("webm" if i % 2 else "matroska")
        assert m["timestamp_scale"] == 1000000
        assert m["duration_ticks"] == 4000 + i % 500
        assert m["n_tracks"] == 2
        assert m["video_codec"] == f"V_VP{8 + i % 2}"
        assert m["width"] == 320 + 16 * (i % 5)
        assert m["n_clusters"] == ncl and m["n_blocks"] == ncl * nbl
        assert m["media_bytes"] == sum(
            30 + (i + c * 5 + k) % 17
            for c in range(ncl) for k in range(nbl))


def test_vint_grammar():
    assert encode_vint_size(0) == b"\x80"
    assert encode_vint_size(126) == b"\xfe"
    # 127 is all-ones in 1 byte (reserved) -> must widen to 2 bytes
    assert encode_vint_size(127) == b"\x40\x7f"
    assert read_vint(b"\x40\x7f", 0, keep_marker=False) == (127, 2)
    with pytest.raises(ValueError, match="invalid vint"):
        read_vint(b"\x00", 0, keep_marker=False)
    with pytest.raises(ValueError, match="unknown size"):
        read_vint(b"\xff", 0, keep_marker=False)
    with pytest.raises(ValueError, match="overruns"):
        read_vint(b"\x40", 0, keep_marker=False)


def test_poison_tiers():
    assert parse_mkv(_build(3, oversize_cluster=True))["error"] \
        == "element 0x1f43b675 overruns parent"
    assert parse_mkv(_build(3, unknown_cluster=True))["error"] \
        == "unknown size for element 0x1f43b675"
    assert parse_mkv(None)["error"] == "short or missing payload"
    assert parse_mkv(struct.pack(">Q", 0x1254C367_00000000))["error"] \
        == "not an ebml stream"


def test_unknown_leaves_are_skipped():
    """Forward compat: an unrecognized element id inside Info must be
    skipped by its declared size, not break the walk."""
    extra = element(0x4461, b"\x01\x02\x03")  # DateUTC, unhandled
    hdr = element(EBML_HEADER, str_el(DOCTYPE, "webm"))
    info = element(INFO, uint_el(TIMESTAMP_SCALE, 1000000) + extra
                   + float_el(DURATION, 5.0))
    m = parse_mkv(hdr + element(SEGMENT, info))
    assert m["error"] is None and m["duration_ticks"] == 5


def test_fuzz_never_raises():
    rng = random.Random(21)
    base = _build(9)
    for _ in range(400):
        bad = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            bad[rng.randrange(len(bad))] = rng.randrange(256)
        m = parse_mkv(bytes(bad[:rng.randrange(len(bad) + 1)]))
        assert ("error" in m)
