"""SQLite WAL recovery (operators/sqlite_wal.py): real-engine
fixtures, the cumulative checksum vs the engine's own words, torn-tail
discard, salt-incarnation gate, fuzz."""

import random
import struct

from cies_ocr_java_spark.operators.sqlite_wal import (
    build_wal_fixture,
    parse_wal,
    wal_checksum,
)


def test_real_engine_round_trip():
    for i in [0, 1, 2, 5]:
        nc = 2 + i % 4
        r = parse_wal(build_wal_fixture(nc, i))
        assert r["error"] is None
        assert r["n_frames_file"] == nc + 2 == r["n_valid"]
        assert r["n_commits"] == nc + 1
        assert r["db_pages"] == 2
        assert r["page_size"] == 4096


def test_checksum_matches_engine_words():
    """Our s1/s2 implementation reproduces the header checksum the
    real engine wrote — the interop identity."""
    w = build_wal_fixture(2, 7)
    c1, c2 = struct.unpack_from(">II", w, 24)
    little = struct.unpack_from(">I", w, 0)[0] & 1 == 0
    assert wal_checksum(w[:24], 0, 0, little) == (c1, c2)


def test_torn_tail_discarded_not_fatal():
    r = parse_wal(build_wal_fixture(3, 9, torn_tail=True))
    assert r["error"] is None
    assert r["n_frames_file"] == r["n_valid"] + 1
    assert r["n_commits"] == 4  # commits unaffected by the dead tail


def test_mid_log_corruption_rolls_back():
    """A bad checksum on frame 1 keeps only frame 0: zero commits,
    NULL database size — rollback semantics, not an error."""
    r = parse_wal(build_wal_fixture(3, 9, bad_frame1=True))
    assert r["error"] is None
    assert r["n_valid"] == 1 and r["n_commits"] == 0
    assert r["db_pages"] is None


def test_salt_incarnation_gate():
    """A frame echoing the WRONG salts belongs to a previous log
    incarnation and ends the scan even with a plausible layout."""
    w = bytearray(build_wal_fixture(2, 3))
    struct.pack_into(">I", w, 32 + 8, 0x12345678)  # frame 0 salt-1
    r = parse_wal(bytes(w))
    assert r["error"] is None and r["n_valid"] == 0


def test_structural_errors():
    w = build_wal_fixture(2, 3)
    assert parse_wal(w[:20])["error"] == "short wal header"
    assert parse_wal(b"\x00" * 40)["error"] == "bad wal magic"
    bad = bytearray(w)
    struct.pack_into(">I", bad, 4, 3007001)
    assert "unsupported wal version" in parse_wal(bytes(bad))["error"]
    bad = bytearray(w)
    bad[27] ^= 0xFF  # header checksum word
    assert parse_wal(bytes(bad))["error"] \
        == "wal header checksum mismatch"


def test_fuzz_never_raises():
    rng = random.Random(67)
    base = build_wal_fixture(2, 4)
    for _ in range(200):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_wal(blob)
