"""DNS wire walker (operators/dns_real.py): compression round-trip,
the strictly-backwards pointer rule, TXT/CNAME rdata, fuzz-never-raises."""

import random
import struct

from cies_ocr_java_spark.operators.dns_real import (
    build_dns_response,
    encode_name,
    parse_dns,
    read_name,
)


def _chain_msg(i=4):
    h = i % 13
    qname = f"www.h{h}.example.com"
    ql = 18 + len(f"h{h}")
    suffix_off = 12 + 4 + 1 + len(f"h{h}")
    rd0 = encode_name(f"cdn{i % 5}.edge", tail_ptr=suffix_off)
    rd0_off = 12 + ql + 4 + 2 + 10
    return qname, build_dns_response(7, qname, [
        (encode_name("", tail_ptr=12), "CNAME", 300, rd0),
        (encode_name("", tail_ptr=rd0_off), "A", 60,
         bytes([10, 1, 2, 3])),
    ])


def test_compression_chain_round_trip():
    qname, msg = _chain_msg()
    rows, err = parse_dns(msg)
    assert err is None
    assert rows[0]["name"] == qname
    assert rows[0]["rtype"] == "CNAME"
    assert rows[0]["rdata"] == "cdn4.edge.example.com"
    assert rows[0]["n_ptr_jumps"] == 2  # name ptr + suffix ptr
    assert rows[1]["name"] == "cdn4.edge.example.com"
    assert rows[1]["n_ptr_jumps"] == 2  # ptr into rdata, ptr to suffix
    assert rows[1]["rdata"] == "10.1.2.3"


def test_txt_multiple_strings_concatenate():
    rd = b"\x05hello\x06 world"
    msg = build_dns_response(1, "a.b", [(encode_name("", tail_ptr=12),
                                         "TXT", 30, rd)])
    rows, err = parse_dns(msg)
    assert err is None
    assert rows[0]["rdata"] == "hello world"


def test_forward_and_self_pointers_rejected():
    qname = "www.h0.example.com"
    ql = 18 + 2
    off = 16 + ql
    msg = build_dns_response(1, qname, [
        (encode_name("", tail_ptr=off), "A", 30, bytes(4))])
    rows, err = parse_dns(msg)
    assert rows is None
    assert err == f"forward compression pointer at {off}"
    # pointing forward past itself is equally rejected
    msg2 = build_dns_response(1, qname, [
        (encode_name("", tail_ptr=off + 5), "A", 30, bytes(4))])
    assert parse_dns(msg2)[1] == f"forward compression pointer at {off}"


def test_backwards_rule_terminates_mutual_reference():
    """Two pointers that would loop under a naive decoder: A at 12
    points at itself via a later offset — any constructed cycle must
    contain a forward hop, which the rule rejects."""
    # name = ptr -> 12 where qname itself starts; fine (1 jump).
    name, _, jumps = read_name(
        build_dns_response(1, "x.y", [(encode_name("", tail_ptr=12),
                                       "A", 1, bytes(4))]), 21)
    assert name == "x.y" and jumps == 1


def test_doc_level_errors():
    assert parse_dns(None)[1] == "short or missing message"
    assert parse_dns(b"\x00" * 11)[1] == "short or missing message"
    msg = build_dns_response(1, "a.b", [(encode_name("", tail_ptr=12),
                                         "A", 30, bytes(4))])
    assert "overruns" in parse_dns(msg[:-3])[1]
    # unsupported type: rewrite the qtype of the answer (MX=15)
    bad = bytearray(msg)
    pos = len(msg) - 4 - 10  # rr fixed header: type class ttl rdlen
    struct.pack_into(">H", bad, pos, 15)
    assert parse_dns(bytes(bad))[1] == "unsupported rr type 15"
    # bad A rdata length
    struct.pack_into(">H", bad, pos, 1)
    struct.pack_into(">H", bad, pos + 8, 3)
    assert parse_dns(bytes(bad)[:-1])[1] == "bad A rdata length 3"


def test_fuzz_never_raises():
    rng = random.Random(99)
    _, msg = _chain_msg(11)
    for _ in range(400):
        bad = bytearray(msg)
        for _ in range(rng.randrange(1, 5)):
            bad[rng.randrange(len(bad))] = rng.randrange(256)
        rows, err = parse_dns(bytes(bad[:rng.randrange(len(bad) + 1)]))
        assert (rows is None) == (err is not None)
