"""PCAPNG walker (operators/pcapng_real.py): double-ended block
lengths, per-section endianness, interface-by-index references,
option lists, unknown-block skip, gates, fuzz."""

import random

from cies_ocr_java_spark.operators.pcapng_real import (
    build_pcapng,
    parse_pcapng,
)

_IFS = [(1, b"eth0"), (113, b"lo")]
_PKTS = [(0, 1_700_000_000_000_000, 120, b"\xaa" * 30),
         (1, 1_700_000_000_000_050, 64, b"\xbb" * 21),
         (0, 1_700_000_000_000_090, 90, b"\xcc" * 44)]


def test_round_trip_both_endians():
    for be in (False, True):
        r = parse_pcapng(build_pcapng(_IFS, _PKTS, big_endian=be))
        assert r["error"] is None
        assert (r["n_interfaces"], r["n_packets"]) == (2, 3)
        assert r["pkt_bytes"] == 30 + 21 + 44
        assert r["orig_bytes"] == 120 + 64 + 90
        # 1 SHB option + 2 IDB name options
        assert r["n_options"] == 3
        assert r["big_endian"] == (1 if be else 0)


def test_unknown_block_skipped_but_length_verified():
    r = parse_pcapng(build_pcapng(_IFS, _PKTS, unknown_block=True))
    assert r["error"] is None
    assert r["n_packets"] == 3


def test_gates():
    assert parse_pcapng(build_pcapng(_IFS, _PKTS, bad_bom=True)) \
        ["error"] == "bad byte-order magic"
    assert parse_pcapng(build_pcapng(_IFS, _PKTS, lie_trailer=True)) \
        ["error"] == "block length mismatch"
    bad_if = [(5, 0, 10, b"\x01\x02")]  # only 2 interfaces exist
    assert parse_pcapng(build_pcapng(_IFS, bad_if))["error"] \
        == "unknown interface id"
    assert parse_pcapng(build_pcapng(_IFS, _PKTS, chop=6))["error"] \
        == "truncated block"
    assert parse_pcapng(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0x1A2B)
    base = build_pcapng(_IFS, _PKTS)
    for _ in range(400):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_pcapng(blob)
