"""FLV walker (operators/flv_real.py): PrevTagSize seam checks,
24+8-bit timestamps, AMF0 metadata, gates, fuzz."""

import random

from cies_ocr_java_spark.operators.flv_real import (
    build_flv,
    parse_flv,
)

_META = {"duration": 120.5, "width": 640.0, "height": 360.0,
         "stereo": True}
_TAGS = [(9, 0, b"\x17" * 40), (8, 23, b"\xaf" * 12),
         (9, 40, b"\x27" * 33), (8, 46, b"\xaf" * 11)]


def test_round_trip():
    r = parse_flv(build_flv(_META, _TAGS))
    assert r["error"] is None
    assert (r["n_audio"], r["n_video"], r["n_script"]) == (2, 2, 1)
    assert r["payload_bytes"] == 40 + 12 + 33 + 11
    assert r["duration_ms"] == 120500
    assert (r["width"], r["height"]) == (640, 360)
    assert r["last_ts"] == 46


def test_timestamp_extension_byte():
    # ts > 2^24 only representable via the extension byte
    big = (5 << 24) + 1234
    r = parse_flv(build_flv(_META, [(9, big, b"\x17" * 8)]))
    assert r["error"] is None
    assert r["last_ts"] == big


def test_gates():
    assert parse_flv(build_flv(_META, _TAGS, bad_sig=True)) \
        ["error"] == "bad signature"
    assert parse_flv(build_flv(_META, _TAGS, lie_prevsize=True)) \
        ["error"] == "prev tag size mismatch"
    assert parse_flv(build_flv(_META, _TAGS,
                               nonzero_stream=True))["error"] \
        == "nonzero stream id"
    assert parse_flv(build_flv(_META, _TAGS, drop_end=True)) \
        ["error"] == "missing object end marker"
    assert parse_flv(build_flv(_META, _TAGS, chop=6))["error"] \
        == "truncated tag body"
    assert parse_flv(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0xF1B)
    base = build_flv(_META, _TAGS)
    for _ in range(500):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_flv(blob)


def test_non_finite_amf_duration_degrades():
    """An adversarial AMF duration/width/height of +/-inf must yield an
    error row, not an OverflowError task crash (NaN already raised
    ValueError; inf did not until gated)."""
    for v in (float("inf"), float("-inf"), float("nan")):
        for key in ("duration", "width", "height"):
            r = parse_flv(build_flv({key: v}, _TAGS))
            assert r["error"] == "non-finite value", (key, v, r)
