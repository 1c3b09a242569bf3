"""MIDI walker (operators/midi_real.py): running status both
directions, velocity-0 semantics, VLQ edges, arity, fuzz."""

import random

import pytest

from cies_ocr_java_spark.operators.midi_real import (
    build_midi,
    parse_midi,
    read_vlq,
    vlq,
)


def _mk(i, **kw):
    nn = 2 + i % 4
    notes = [(100 + 10 * (i % 7), 60 + (i + k) % 24,
              64 + (i + k) % 32) for k in range(nn)]
    return build_midi(notes, 500000 + 100 * (i % 50), division=480,
                      **kw), nn


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 7, 12]:
        b, nn = _mk(i)
        r = parse_midi(b)
        assert r["error"] is None
        assert r["n_note_on"] == nn and r["n_note_off"] == nn
        assert r["total_ticks"] == nn * (100 + 10 * (i % 7) + 60)
        assert r["n_running"] == 2 * nn - 1
        assert r["tempo_us"] == 500000 + 100 * (i % 50)


def test_running_status_is_load_bearing():
    """Disable running status: same notes, zero inherited events —
    and an orphan data byte with no status is an error."""
    b, _ = _mk(4, use_running=False)
    assert parse_midi(b)["n_running"] == 0
    orphan = (b"MThd" + (6).to_bytes(4, "big")
              + b"\x00\x00\x00\x01\x01\xe0"
              + b"MTrk" + (3).to_bytes(4, "big") + b"\x00\x40\x40")
    assert "no running status" in parse_midi(orphan)["error"]


def test_velocity_zero_is_note_off():
    b, nn = _mk(5)
    r = parse_midi(b)
    # every event is an 0x90 opcode; offs exist only via vel=0
    assert r["n_note_off"] == nn > 0


def test_vlq_edges():
    for v in [0, 1, 127, 128, 129, 16383, 16384, 0x0FFFFFFF]:
        got, pos = read_vlq(vlq(v), 0)
        assert got == v and pos == len(vlq(v))
    assert vlq(127) == b"\x7f" and vlq(128) == b"\x81\x00"
    with pytest.raises(ValueError, match="longer than 4"):
        read_vlq(b"\xff\xff\xff\xff\x7f", 0)


def test_poison_tiers():
    assert parse_midi(_mk(3, drop_eot=True)[0])["error"] \
        == "track 0 missing end-of-track"
    assert parse_midi(_mk(3, bad_header=True)[0])["error"] \
        == "bad header chunk"
    assert parse_midi(None)["error"] == "not a midi file"


def test_fuzz_never_raises():
    rng = random.Random(103)
    for seed in (5, 8):
        base, _ = _mk(seed)
        for _ in range(500):
            x = bytearray(base)
            for _ in range(rng.randrange(1, 5)):
                x[rng.randrange(len(x))] = rng.randrange(256)
            blob = (bytes(x[:rng.randrange(len(x) + 1)])
                    if rng.random() < 0.3 else bytes(x))
            assert "error" in parse_midi(blob)
