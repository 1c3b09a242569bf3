"""ADTS frame walk (operators/adts_real.py): stepping, per-frame sync
re-verification, crc-width headers, gates, fuzz."""

import random

from cies_ocr_java_spark.operators.adts_real import (
    build_adts,
    parse_adts,
)


def test_round_trip_and_crc_header_width():
    r = parse_adts(build_adts(1, 4, 2, [20, 31, 17], crc_every=2))
    assert r["error"] is None
    assert (r["n_frames"], r["n_crc_frames"]) == (3, 2)
    assert (r["profile"], r["sample_rate"], r["channels"]) \
        == (1, 44100, 2)
    assert r["payload_bytes"] == 68


def test_gates():
    assert parse_adts(build_adts(1, 4, 2, [20, 30],
                                 bad_layer=True))["error"] \
        == "nonzero layer is not aac"
    assert parse_adts(build_adts(1, 4, 2, [20, 30],
                                 bad_midsync=True))["error"] \
        == "lost sync between frames"
    assert parse_adts(build_adts(1, 4, 2, [20, 30],
                                 lying_length=True))["error"] \
        == "frame length overruns stream"
    assert parse_adts(build_adts(1, 13, 2, [20]))["error"] \
        == "reserved sampling frequency index"
    assert parse_adts(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0xAAC)
    t = build_adts(2, 6, 3, [25, 18, 22, 30], crc_every=3)
    for _ in range(400):
        x = bytearray(t)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_adts(blob)
