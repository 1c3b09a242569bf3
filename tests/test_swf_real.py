"""SWF walker (operators/swf_real.py): MSB-first signed bit-packed
RECT, zlib body over the from-scratch inflate, short/long tag
lengths, end-tag discipline, gates, fuzz."""

import random

from cies_ocr_java_spark.operators.swf_real import (
    build_swf,
    parse_swf,
)

_TAGS = [(69, b"\x08\x00\x00\x00"), (9, b"\x10\x20\x30"),
         (43, b"intro\x00"), (1, b""),
         (26, b"\x06\x00" + b"\x01" * 70), (1, b"")]


def test_round_trip_both_compressions():
    for comp in (True, False):
        r = parse_swf(build_swf(550, 400, 0x0C00, _TAGS,
                                compressed=comp))
        assert r["error"] is None
        assert (r["n_tags"], r["n_frames"], r["frame_count"]) \
            == (6, 2, 2)
        assert (r["stage_w"], r["stage_h"]) == (550, 400)
        assert r["frame_rate_x256"] == 0x0C00
        assert r["compressed"] == (1 if comp else 0)
        # the 72-byte tag uses the 0x3F long-form escape
        assert r["tag_bytes"] == 4 + 3 + 6 + 72


def test_rect_nbits_variation():
    for nb, w in ((12, 80), (15, 550), (17, 550), (21, 3000)):
        r = parse_swf(build_swf(w, 60, 256, _TAGS, nbits=nb))
        assert r["error"] is None
        assert (r["stage_w"], r["stage_h"]) == (w, 60), nb


def test_builder_rejects_unfittable_rect():
    import pytest
    with pytest.raises(ValueError):
        build_swf(550, 400, 256, _TAGS, nbits=12)


def test_frame_count_cross_check():
    # header frame count is DERIVED from ShowFrame tags by the
    # builder; hand-corrupt it and the parser must object
    raw = bytearray(build_swf(100, 80, 256, _TAGS,
                              compressed=False))
    # frameCount lives after RECT (nbits=15 -> 9 bytes) + rate (2)
    ofs = 8 + 9 + 2
    raw[ofs] = raw[ofs] + 1
    assert parse_swf(bytes(raw))["error"] \
        == "frame count disagrees with header"


def test_gates():
    assert parse_swf(build_swf(5, 5, 256, _TAGS, bad_sig=True)) \
        ["error"] == "bad signature"
    assert parse_swf(build_swf(5, 5, 256, _TAGS, lie_length=True)) \
        ["error"] == "declared length mismatch"
    assert parse_swf(build_swf(5, 5, 256, _TAGS, drop_end=True)) \
        ["error"] == "missing end tag"
    assert parse_swf(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0x5F5)
    for comp in (True, False):
        base = build_swf(100, 80, 256, _TAGS, compressed=comp)
        for _ in range(250):
            x = bytearray(base)
            for _ in range(rng.randrange(1, 5)):
                x[rng.randrange(len(x))] = rng.randrange(256)
            blob = (bytes(x[:rng.randrange(len(x) + 1)])
                    if rng.random() < 0.3 else bytes(x))
            assert "error" in parse_swf(blob)
