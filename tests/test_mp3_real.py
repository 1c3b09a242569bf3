"""MPEG-audio frame walker (operators/mp3_real.py): VBR round-trip
identity, syncsafe/trailer edges, fuzz-never-raises, sniff integration."""

import random

import pytest

from cies_ocr_java_spark.operators.mp3_real import (
    MP3_KBPS,
    MP3_RATES,
    build_mp3,
    frame_length,
    parse_mp3,
)


def test_vbr_round_trip_identity():
    for i in [0, 1, 36, 74, 123]:
        nf, ri, base = 20 + i % 11, i % 3, i % 9
        bis = [1 + (base + k) % 9 for k in range(nf)]
        b = build_mp3(bis, ri, tag_len=10 + i % 17, id3v1=i % 2 == 0)
        m = parse_mp3(b)
        sr = MP3_RATES[ri]
        assert m["error"] is None
        assert m["n_frames"] == nf
        assert m["sample_rate"] == sr
        assert m["duration_ms"] == nf * 1152 * 1000 // sr
        assert m["audio_bytes"] == sum(
            frame_length(MP3_KBPS[bi], sr) for bi in bis
        )
        assert m["id3v2_size"] == 10 + (10 + i % 17)
        assert m["has_id3v1"] == (i % 2 == 0)


def test_first_header_trust_would_lie():
    """The whole point of the frame walk: a VBR file's first-frame
    bitrate extrapolation mis-states the byte size; the walker's sum is
    exact."""
    sr = MP3_RATES[0]
    bis = [1] * 5 + [9] * 5  # 32 kbps then 128 kbps
    b = build_mp3(bis, 0)
    m = parse_mp3(b)
    naive = 10 * frame_length(MP3_KBPS[1], sr)
    assert m["audio_bytes"] == sum(
        frame_length(MP3_KBPS[bi], sr) for bi in bis
    )
    assert m["audio_bytes"] != naive


def test_no_tag_plain_stream():
    b = build_mp3([5, 5, 5], 1)
    m = parse_mp3(b)
    assert m["error"] is None
    assert m["id3v2_size"] == 0 and m["has_id3v1"] is False


def test_poisoned_syncsafe_fails():
    b = build_mp3([5] * 3, 0, tag_len=20)
    pb = b[:6] + b"\x7f\x7f\x7f\x7f" + b[10:]
    assert parse_mp3(pb)["error"] == "id3v2 tag overruns file"
    # a non-syncsafe byte (high bit set) is rejected outright
    nb = b[:6] + b"\x80\x00\x00\x14" + b[10:]
    assert parse_mp3(nb)["error"] == "bad syncsafe length"


def test_degradation_edges():
    b = build_mp3([5, 5], 0)
    assert parse_mp3(None)["error"] == "short or missing payload"
    assert parse_mp3(b[:-1])["error"].startswith("frame overruns")
    assert parse_mp3(b + b"TAGx")["error"] == "malformed id3v1 trailer"
    assert parse_mp3(b"\x00" * 40)["error"] == "bad frame sync at 0"
    # mixed samplerates must be rejected, not averaged
    mixed = build_mp3([5], 0) + build_mp3([5], 1)
    assert parse_mp3(mixed)["error"].startswith("mixed samplerates")
    # reserved bitrate index 15 in a crafted header
    bad = bytearray(b)
    bad[2] = 0xF0 | (bad[2] & 0x0F)
    assert parse_mp3(bytes(bad))["error"].startswith("bad bitrate index")


def test_fuzz_never_raises():
    b = build_mp3([1 + k % 9 for k in range(8)], 2, tag_len=33, id3v1=True)
    for cut in range(0, len(b), 7):
        parse_mp3(b[:cut])
    rnd = random.Random(11)
    for _ in range(400):
        bb = bytearray(b)
        for _ in range(rnd.randrange(1, 6)):
            bb[rnd.randrange(len(bb))] = rnd.randrange(256)
        parse_mp3(bytes(bb))


def test_build_rejects_bad_args():
    with pytest.raises(ValueError):
        build_mp3([0], 0)
    with pytest.raises(ValueError):
        build_mp3([5], 3)


def test_sniff_and_dispatch():
    from cies_ocr_java_spark.operators.multimodal import sniff_media_format

    assert sniff_media_format(build_mp3([5] * 3, 0, tag_len=5)) == "mp3"
    assert sniff_media_format(build_mp3([5] * 3, 0)) == "mp3"
