"""H.264 Annex B walk (operators/h264_real.py): exp-Golomb round-trip,
emulation prevention, crop-unit arithmetic, NAL gates, fuzz."""

import random

from cies_ocr_java_spark.operators.h264_real import (
    _BitReader,
    _UeWriter,
    _escape_rbsp,
    _unescape_rbsp,
    build_annexb,
    parse_annexb,
)


def test_exp_golomb_round_trip():
    w = _UeWriter()
    vals = [0, 1, 2, 3, 7, 8, 30, 31, 32, 255, 1000]
    for v in vals:
        w.ue(v)
    r = _BitReader(w.rbsp())
    assert [r.ue() for _ in vals] == vals


def test_emulation_prevention_round_trip_and_necessity():
    raw = b"\x11\x00\x00\x01\x22\x00\x00\x00\x33\x00\x00\x02"
    esc = _escape_rbsp(raw)
    assert b"\x00\x00\x01" not in esc
    assert b"\x00\x00\x00" not in esc
    assert _unescape_rbsp(esc) == raw
    # necessity: the builder's IDR payload embeds a raw start code;
    # a parser that skipped unescaping would split that NAL in two
    # and miscount slices
    b = build_annexb(66, 20, 0, 4, 3, 0, 0, n_nonidr=2)
    r = parse_annexb(b)
    assert r["error"] is None
    assert (r["n_sps"], r["n_pps"], r["n_idr"], r["n_slices"]) \
        == (1, 1, 1, 3)


def test_crop_units_are_two_luma_samples():
    # 4:2:0 + frame_mbs_only: each crop step removes TWO samples
    r = parse_annexb(build_annexb(66, 30, 1, 10, 6, 3, 1, 0))
    assert (r["width"], r["height"]) == (160 - 6, 96 - 2)
    assert r["frame_num_bits"] == 5


def test_gates():
    base = dict(profile=66, level=10, log2mfn4=0, wm=2, hm=2,
                crop_r=0, crop_b=0, n_nonidr=0)

    def b(**kw):
        a = {**base, **kw}
        return build_annexb(a["profile"], a["level"], a["log2mfn4"],
                            a["wm"], a["hm"], a["crop_r"], a["crop_b"],
                            a["n_nonidr"],
                            bad_forbidden=a.get("bad_forbidden", False),
                            trunc_sps=a.get("trunc_sps", False),
                            interlaced=a.get("interlaced", False))

    assert parse_annexb(b(bad_forbidden=True))["error"] \
        == "forbidden zero bit set"
    assert parse_annexb(b(trunc_sps=True))["error"] == "sps overruns rbsp"
    assert parse_annexb(b(interlaced=True))["error"] \
        == "interlaced unsupported"
    assert parse_annexb(None)["error"] == "short or missing payload"
    assert parse_annexb(b"\x07\x00\x00\x01x")["error"] \
        == "garbage before first start code"


def test_fuzz_never_raises():
    rng = random.Random(264)
    t = build_annexb(66, 30, 2, 5, 3, 1, 2, n_nonidr=3)
    for _ in range(400):
        x = bytearray(t)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_annexb(blob)
