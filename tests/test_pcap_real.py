"""pcap walker (operators/pcap_real.py): checksum round-trip identity,
endianness discovery from the magic, per-packet vs doc-level
degradation, fuzz-never-raises."""

import random
import struct

from cies_ocr_java_spark.operators.pcap_real import (
    build_packet,
    build_pcap,
    ipv4_checksum,
    parse_pcap,
    tcp_checksum,
)


def _handshake(cp=40001, isnc=1000, isns=5000):
    ci, si = "10.0.0.1", "10.0.14.7"
    return [
        build_packet(ci, si, cp, 80, isnc, 0, 0x02),
        build_packet(si, ci, 80, cp, isns, isnc + 1, 0x12),
        build_packet(ci, si, cp, 80, isnc + 1, isns + 1, 0x10),
    ]


def test_round_trip_both_endiannesses():
    frames = _handshake()
    frames.append(build_packet(
        "10.0.0.1", "10.0.14.7", 40001, 80, 1001, 5001, 0x18,
        b"GET / HTTP/1.1\r\n\r\n"))
    for be in (False, True):
        rows, err = parse_pcap(build_pcap(
            [(10 * p, f) for p, f in enumerate(frames)], big_endian=be))
        assert err is None
        assert len(rows) == 4
        assert all(r["ip_ok"] == 1 and r["tcp_ok"] == 1 for r in rows)
        assert rows[3]["payload"] == b"GET / HTTP/1.1\r\n\r\n"
        assert rows[3]["seq"] == 1001
        assert [r["ts_us"] for r in rows] == [0, 10, 20, 30]
        assert rows[0]["flags"] == 0x02 and rows[1]["flags"] == 0x12


def test_checksums_catch_any_single_flip():
    """Both checksums are REAL RFC 1071 sums: any single byte flip in
    the IP header or the TCP segment flips the matching ok flag."""
    frame = build_packet("10.0.0.1", "10.0.14.7", 40001, 80, 7, 9,
                         0x18, b"payload bytes here")
    rng = random.Random(42)
    for _ in range(40):
        pos = rng.randrange(14, len(frame))
        bad = bytearray(frame)
        bad[pos] ^= 1 << rng.randrange(8)
        rows, err = parse_pcap(build_pcap([(0, bytes(bad))]))
        if err is not None:
            continue  # flip landed in a structural field
        (r,) = rows
        assert r["ip_ok"] == 0 or r["tcp_ok"] == 0, pos


def test_pseudo_header_in_tcp_checksum():
    """Flipping a source-IP byte (outside the TCP segment) must still
    break the TCP checksum — the 96-bit pseudo-header covers it (and
    the IP header checksum breaks too)."""
    frame = bytearray(build_packet(
        "10.0.0.1", "10.0.14.7", 40001, 80, 7, 9, 0x18, b"x"))
    frame[14 + 12] ^= 0xFF  # first src-IP byte
    rows, err = parse_pcap(build_pcap([(0, bytes(frame))]))
    assert err is None
    (r,) = rows
    assert r["ip_ok"] == 0 and r["tcp_ok"] == 0


def test_doc_level_errors():
    frames = _handshake()
    cap = build_pcap([(0, f) for f in frames])
    assert parse_pcap(None)[1] == "short or missing capture"
    assert parse_pcap(cap[:20])[1] == "short or missing capture"
    assert parse_pcap(b"\x00" * 24)[1] == "bad pcap magic"
    assert parse_pcap(cap[:-5])[1] == "record 2 overruns capture"
    # linktype gate
    bad = bytearray(cap)
    bad[20] = 101  # raw-IP linktype, little-endian field
    assert "unsupported linktype" in parse_pcap(bytes(bad))[1]
    # non-IPv4 ethertype
    f = bytearray(frames[0])
    f[12:14] = b"\x86\xdd"  # IPv6
    assert "non-ipv4 ethertype" in parse_pcap(build_pcap(
        [(0, bytes(f))]))[1]


def test_checksum_functions_self_consistent():
    sb, db = bytes([10, 0, 0, 1]), bytes([10, 0, 14, 7])
    seg = struct.pack(">HHIIBBHHH", 1, 2, 3, 4, 5 << 4, 0x18, 100, 0, 0)
    ck = tcp_checksum(sb, db, seg)
    seg_ok = seg[:16] + struct.pack(">H", ck) + seg[18:]
    assert tcp_checksum(sb, db, seg_ok) == ck
    hdr = struct.pack(">BBHHHBBH4s4s", 0x45, 0, 40, 0, 0, 64, 6, 0,
                      sb, db)
    c2 = ipv4_checksum(hdr)
    hdr_ok = hdr[:10] + struct.pack(">H", c2) + hdr[12:]
    assert ipv4_checksum(hdr_ok) == c2


def test_fuzz_never_raises():
    rng = random.Random(1337)
    frames = _handshake()
    frames.append(build_packet(
        "10.0.0.1", "10.0.14.7", 40001, 80, 1001, 5001, 0x18,
        b"A" * 30))
    cap = build_pcap([(10 * p, f) for p, f in enumerate(frames)])
    for _ in range(300):
        bad = bytearray(cap)
        for _ in range(rng.randrange(1, 6)):
            bad[rng.randrange(len(bad))] = rng.randrange(256)
        rows, err = parse_pcap(bytes(bad[:rng.randrange(len(bad) + 1)]))
        assert (rows is None) == (err is not None)
    for _ in range(100):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 120)))
        rows, err = parse_pcap(blob)
        assert (rows is None) == (err is not None)


def test_udp_datagrams_and_pseudo_header_checksum():
    """UDP support (session-8 extension): RFC 768 checksum over the
    same pseudo-header, zero-transmits-as-0xFFFF, seq/ack/flags null
    on UDP rows, and a flipped payload byte drops the ok flag."""
    from cies_ocr_java_spark.operators.pcap_real import (
        build_udp_packet,
    )

    f = build_udp_packet("10.0.0.1", "10.0.53.1", 3333, 53, b"dns?")
    rows, err = parse_pcap(build_pcap([(5, f)]))
    assert err is None
    (r,) = rows
    assert r["payload"] == b"dns?" and r["dst_port"] == 53
    assert r["tcp_ok"] == 1 and r["ip_ok"] == 1
    assert r["seq"] is None and r["flags"] is None
    bad = bytearray(f)
    bad[-1] ^= 0xFF
    rows, err = parse_pcap(build_pcap([(5, bytes(bad))]))
    assert rows[0]["tcp_ok"] == 0
